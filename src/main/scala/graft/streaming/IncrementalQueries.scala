package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, TimestampType}
import graft.{GraftQuery, Tables}
import graft.GraftQuery.sql
import graft.sources.CdcParser
import graft.streaming.DeltaEngine._

/** The incremental (changelog) query surface, registered against the
  * driver's correctness gate:
  *
  *  - `cdc_roundtrip_lineitem`: parquet rows → reference CDC text
  *    lines → [[CdcParser]] → typed rows; the oracle reads the same
  *    columns straight from parquet, so any parse/cast drift fails the
  *    value hash.
  *
  *  - `incremental_q10`: TPC-H Q10 maintained by the [[DeltaEngine]]
  *    join tree over a synthetic changelog (insert everything, then
  *    delete every lineitem with linenumber 3 and every order with
  *    orderkey % 50 == 0 — exercising child retraction AND parent
  *    death fan-out). The oracle is plain SQL over the net surviving
  *    tuples: incremental-equals-batch is exactly the AJU correctness
  *    property (SURVEY.md §5.2).
  *
  * Revenue folds in integer 1e-4 units (`revenue_e4`) so incremental
  * double-summation order can never drift from the decimal oracle.
  */
object IncrementalQueries {

  /** Shuffle/state partition count for the CHILD sessions the
    * stream-replay gate entries run in: chained stateful operators pin
    * one state-store instance per shuffle partition per operator per
    * micro-batch, so a two-batch fixture replay wants few partitions
    * (measured 16.4 s -> 8.3 s at sf0.1). One constant so the
    * fixture-replay entries can't drift apart; production guidance
    * unchanged — size state partitions to the data. */
  val ReplayShufflePartitions = 8

  /** Cap on the FIXTURE-ONLY MemoryStream replay collects (see
    * [[boundedReplayCollect]]). */
  val ReplayMaxRows = 2000000

  /** Typed lookup on the canonical row — the codegen'd byte-scan
    * (graft.functions.CanonGet) that replaced the per-row
    * `str_to_map(row)[name]` map build in every leaf-delta aggregate
    * (round 17; same swap as SqlCompiler.aggregate). */
  private def canonCol(name: String): org.apache.spark.sql.Column =
    graft.functions.CanonGet.canon_get(col("row"), name)

  /** Child session for a stream-replay gate entry, sized by
    * [[ReplayShufflePartitions]] — never mutates the caller's session. */
  def replaySession(s: SparkSession): SparkSession = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", ReplayShufflePartitions)
    // FIXTURE-REPLAY state-store posture (round 17): these child
    // sessions run short-lived MemoryStream replays whose checkpoints
    // are throwaway temp dirs — the HDFS-backed store's background
    // maintenance (snapshot consolidation + old-version cleanup every
    // 60 s) and its 100-version retention exist for RECOVERY of
    // long-running production queries and are pure overhead here:
    // every store instance (one per shuffle partition per stateful
    // operator per query) schedules maintenance and fsyncs delta files
    // it will never reread. 2 m (not longer): the maintenance thread
    // is ALSO what unloads finished queries' providers — a first try
    // at 1 h let hundreds of finished replays' providers pile up in
    // the shared suite JVM and the suite wall grew 18 -> 25 min; 2 m
    // still outlives a fixture replay (so zero mid-query churn) while
    // unloading promptly. Production guidance unchanged — a real
    // deployment keeps the defaults (or RocksDB) on its own sessions.
    ss.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
    ss.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "2m")
    ss
  }

  /** FIXTURE-ONLY REPLAY GUARD shared by every MemoryStream-replay
    * entry: replay necessarily materializes its input on the driver,
    * so the collect is BOUNDED — limit+1 caps driver memory and the
    * require fails LOUDLY past fixture scale instead of silently
    * OOMing a production driver. Production use is the same operator
    * over a `readStream` source. */
  def boundedReplayCollect[T](entry: String, ds: org.apache.spark.sql.Dataset[T],
                              max: Int = ReplayMaxRows): Array[T] = {
    val collected = ds.limit(max + 1).collect()
    require(collected.length <= max,
      s"$entry is a fixture-scale replay harness (<= $max rows); for production " +
        "data run the operator over a readStream source instead of a MemoryStream replay")
    collected
  }

  private val dateLo = "1996-01-01"
  private val dateHi = "1996-04-01"

  /** Build one relation's changelog as Dataset[Evt]. The canonical row
    * string is assembled by codegen'd `concat_ws` at ingest — events
    * shuffle as one UTF8String, never as map<string,string>.
    *
    * `where` is the node's local predicate as a `Column`: applying it
    * HERE (before canon-building) pushes it into the parquet scan
    * (`PushedFilters`), so rows failing it are never materialized,
    * canon-encoded, or shuffled — the Spark-native form of the
    * engine's predicate pushdown. The caller must keep it equivalent
    * to the matching NodeSpec.predicate and run the tree with
    * `sourceFiltered = true`. */
  private[streaming] def changelog(df0: DataFrame, keyCol: String, cols: Seq[String],
                        deleteWhen: Option[org.apache.spark.sql.Column],
                        where: Option[org.apache.spark.sql.Column] = None): Dataset[Evt] = {
    val df = where.map(df0.filter).getOrElse(df0)
    val spark = df.sparkSession
    import spark.implicits._
    // coalesce to the literal "null": concat_ws would otherwise DROP a
    // null column's whole pair, losing the name for mergeCanon's
    // child-wins dedup and for canonGet routing
    val rowCanon = concat_ws(FS.toString,
      cols.sorted.map(c =>
        concat(lit(c + KV.toString), coalesce(col(c).cast("string"), lit("null")))): _*)
    // Two scans ON PURPOSE: a one-scan spelling (conditional
    // explode(array(insert, delete)) per row) was tried this round and
    // measured SLOWER at sf0.1 (+0.3 s on the compiled entries): the
    // Generate + per-row struct/array build taxes EVERY row of the
    // relation, while the second scan is an embarrassingly parallel
    // re-read the OS page cache mostly absorbs — and it keeps the
    // whole changelog a flat codegen'd projection over the vectorized
    // reader.
    val inserts = df.select(lit(0L).as("seq"), lit(false).as("fromParent"),
      lit(1).as("tag"), lit(1).as("mult"),
      col(keyCol).cast("string").as("key"), rowCanon.as("row")).as[Evt]
    deleteWhen match {
      case None => inserts
      case Some(cond) =>
        val deletes = df.filter(cond).select(lit(1L).as("seq"), lit(false).as("fromParent"),
          lit(-1).as("tag"), lit(1).as("mult"),
          col(keyCol).cast("string").as("key"), rowCanon.as("row")).as[Evt]
        inserts.union(deletes)
    }
  }

  /** The Q10 FK tree (reference DataFlow.java:45-56), quirks fixed. */
  val q10Tree: Seq[NodeSpec] = Seq(
    NodeSpec("nation", "n_nationkey", "n_nationkey", isRoot = true, setSemantics = true),
    NodeSpec("customer", "c_nationkey", "c_custkey"),
    NodeSpec("orders", "o_custkey", "o_orderkey",
      predicate = r => {
        val d = r.getOrElse("o_orderdate", "")
        d >= dateLo && d < dateHi  // ISO strings compare lexicographically
      }),
    NodeSpec("lineitem", "l_orderkey", "l_orderkey",
      predicate = _.getOrElse("l_returnflag", "") == "R"))

  /** The synthetic Q10 changelog set: insert every row, then delete
    * every lineitem with linenumber 3 and every order with
    * orderkey % 50 == 0 (child retraction AND parent-death fan-out).
    * Node predicates ride along as scan-pushed `where` filters
    * (mirroring q10Tree's functional predicates), so the engine runs
    * with `sourceFiltered = true`. */
  def q10Changelogs(s: SparkSession, dir: String): Map[String, Dataset[Evt]] = Map(
    "nation" -> changelog(Tables.nation(s, dir), "n_nationkey",
      Seq("n_nationkey", "n_name"), None),
    "customer" -> changelog(Tables.customer(s, dir), "c_nationkey",
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"), None),
    "orders" -> changelog(Tables.orders(s, dir), "o_custkey",
      Seq("o_orderkey", "o_custkey", "o_orderdate"),
      Some(col("o_orderkey") % 50 === 0),
      where = Some(col("o_orderdate") >= dateLo && col("o_orderdate") < dateHi)),
    "lineitem" -> changelog(Tables.lineitem(s, dir), "l_orderkey",
      Seq("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_returnflag"),
      Some(col("l_linenumber") === 3),
      where = Some(col("l_returnflag") === "R")))

  /** Run the engine over the synthetic changelog and fold the leaf
    * deltas into the Q10 aggregate. */
  def incrementalQ10(s: SparkSession, dir: String): DataFrame =
    q10Aggregate(runBatch(q10Tree, q10Changelogs(s, dir), sourceFiltered = true))

  /** OPT-IN bloom semi-join reduction for the incremental engine: with
    * [[BloomPrefilterConf]] set, drop child-changelog events whose
    * routing key cannot exist in the parent changelog BEFORE the
    * engine canon-encodes and shuffles them — a bloom over the
    * parent's child-facing key (extracted from its row canon)
    * pre-filters the probe side at the scan. This is the J3 fan-out
    * reducer at 100 TB: most R-flag lineitems belong to orders outside
    * the date window, and without the bloom every one of them crosses
    * the exchange into order-node state just to die unjoined.
    *
    * EXACT under replay semantics: the bloom covers the parent's FULL
    * key multiset — inserts AND deletes — so a child event is dropped
    * only if its parent key never appears at ANY point of the replay,
    * i.e. it could never be joined alive in any micro-batch; bloom
    * false positives merely survive to the engine and produce nothing,
    * exactly as they did before. Both sides hash the STRING key form
    * ([[BloomJoin.bloomBytesRaw]]) — child `Evt.key` and parent canon
    * values are both built by `cast(string)` of the same column type,
    * so equal keys hash equal. */
  val BloomPrefilterConf = "spark.graft.incremental.bloomPrefilter"
  val BloomPrefilterItemsConf = "spark.graft.incremental.bloomPrefilter.expectedItems"
  val BloomPrefilterFppConf = "spark.graft.incremental.bloomPrefilter.fpp"

  /** OPT-IN skew salting for the COMPILER, following the bloom conf
    * pattern: name the skewed relation and the salt width, and
    * [[SqlCompiler]] sets `salts = S` on that relation's liveness
    * stage — its own events bucket into S sub-keys by row hash while
    * the parent's liveness deltas replicate to every bucket
    * ([[DeltaEngine.Stage]] skew note). Answer-invariant (the gated
    * entry proves it); spend the ×S parent replication only where one
    * hot key would otherwise pin a stage to a single task. */
  val SaltRelationConf = "spark.graft.incremental.saltRelation"
  val SaltWidthConf = "spark.graft.incremental.saltWidth"

  def bloomPrefilterChild(logs: Map[String, Dataset[Evt]],
      parentRel: String, parentChildKey: String, childRel: String,
      expectedItems: Long, fpp: Double = 0.03): Map[String, Dataset[Evt]] = {
    val child = logs(childRel)
    if (!child.sparkSession.conf.getOption(BloomPrefilterConf).contains("true")) logs
    else {
      val parentKeys = logs(parentRel).toDF().select(
        canonCol(parentChildKey).as("k"))
      graft.operators.BloomJoin.bloomBytesRaw(parentKeys, col("k"),
          expectedItems, fpp) match {
        case None => logs.updated(childRel, child.filter(lit(false)))
        case Some(bits) => logs.updated(childRel,
          child.filter(graft.operators.BloomJoin.mightContainRaw(bits, col("key"))))
      }
    }
  }

  /** [[incrementalQ10]] with the bloom reduction switched on in a
    * child session (the conf is opt-in; the caller's session is never
    * mutated): lineitem deltas are pre-filtered by the bloom of the
    * date-windowed orders changelog's o_orderkey set. */
  def incrementalQ10Bloom(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set(BloomPrefilterConf, "true")
    val logs = bloomPrefilterChild(q10Changelogs(ss, dir),
      parentRel = "orders", parentChildKey = "o_orderkey", childRel = "lineitem",
      expectedItems = 200000L, fpp = 0.01)
    q10Aggregate(runBatch(q10Tree, logs, sourceFiltered = true))
  }

  /** The Q10 signed-delta fold (shared by the parquet-changelog and
    * CDC-text paths): rev_e4 = round(extprice * (1-disc) * 1e4),
    * exact because the true product has 4 decimals (2dp × 2dp). */
  private def q10Aggregate(leaf: Dataset[Evt]): DataFrame = {
    val df = leaf.toDF()
    df.select(
        (col("tag") * col("mult")).as("sign"),
        canonCol("c_custkey").cast(LongType).as("c_custkey"),
        canonCol("c_name").as("c_name"),
        canonCol("c_acctbal").cast(DoubleType).as("c_acctbal"),
        canonCol("n_name").as("n_name"),
        round(canonCol("l_extendedprice").cast(DoubleType) *
          (lit(1.0) - canonCol("l_discount").cast(DoubleType)) * 10000, 0)
          .cast(LongType).as("rev_e4"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(col("sign") * col("rev_e4")).as("revenue_e4"),
        sum(col("sign")).cast(LongType).as("n_rows"))
      .filter(col("n_rows") > 0)
  }

  /** A SECOND join tree — region→nation→supplier→lineitem — through
    * the same engine: the AJU capability is generic over NodeSpec
    * trees, not Q10-specific. Root predicate (region filter), a
    * numeric leaf predicate, supplier deletes (parent-death fan-out
    * over that supplier's lineitems) and lineitem deletes. */
  val supplierTree: Seq[NodeSpec] = Seq(
    NodeSpec("region", "r_regionkey", "r_regionkey", isRoot = true, setSemantics = true,
      predicate = r => { val n = r.getOrElse("r_name", ""); n == "ASIA" || n == "EUROPE" }),
    NodeSpec("nation", "n_regionkey", "n_nationkey"),
    NodeSpec("supplier", "s_nationkey", "s_suppkey"),
    NodeSpec("lineitem", "l_suppkey", "l_suppkey",
      predicate = r => r.getOrElse("l_quantity", "0").toDouble >= 25.0))

  def supplierChangelogs(s: SparkSession, dir: String): Map[String, Dataset[Evt]] = Map(
    "region" -> changelog(Tables.region(s, dir), "r_regionkey",
      Seq("r_regionkey", "r_name"), None,
      where = Some(col("r_name").isin("ASIA", "EUROPE"))),
    "nation" -> changelog(Tables.nation(s, dir), "n_regionkey",
      Seq("n_nationkey", "n_name", "n_regionkey"), None),
    "supplier" -> changelog(Tables.supplier(s, dir), "s_nationkey",
      Seq("s_suppkey", "s_nationkey"),
      Some(col("s_suppkey") % 20 === 0)),
    "lineitem" -> changelog(Tables.lineitem(s, dir), "l_suppkey",
      Seq("l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"),
      Some(col("l_linenumber") === 2),
      where = Some(col("l_quantity") >= 25.0)))

  def incrementalSupplierRevenue(s: SparkSession, dir: String): DataFrame = {
    val leaf = runBatch(supplierTree, supplierChangelogs(s, dir), sourceFiltered = true)
    val df = leaf.toDF()
    df.select(
        (col("tag") * col("mult")).as("sign"),
        canonCol("n_name").as("n_name"),
        round(canonCol("l_extendedprice").cast(DoubleType) *
          (lit(1.0) - canonCol("l_discount").cast(DoubleType)) * 10000, 0)
          .cast(LongType).as("rev_e4"))
      .groupBy(col("n_name"))
      .agg(sum(col("sign") * col("rev_e4")).as("revenue_e4"),
        sum(col("sign")).cast(LongType).as("n_rows"))
      .filter(col("n_rows") > 0)
  }

  /** A THIRD tree — and this one is COMPILED from parquet FK metadata
    * ([[TreeCompiler]]) rather than hand-built: the key/routing
    * columns of region→nation→customer→orders are all derived from the
    * schemas. Deletes hit customer (a MID-CHAIN node: death fans out
    * through its orders) and orders — coverage the other two trees
    * don't have. */
  def orderRevenueTree(s: SparkSession, dir: String): Seq[NodeSpec] = {
    val rels = TreeCompiler.fromParquet(s, dir, Seq("region", "nation", "customer", "orders"))
    TreeCompiler.compile(rels, Seq("region", "nation", "customer", "orders"),
      predicates = Map(
        "region" -> (r => r.getOrElse("r_name", "") != "AFRICA"),
        "orders" -> (r => r.getOrElse("o_orderstatus", "") == "F")))
  }

  def orderRevenueChangelogs(s: SparkSession, dir: String): Map[String, Dataset[Evt]] = Map(
    "region" -> changelog(Tables.region(s, dir), "r_regionkey",
      Seq("r_regionkey", "r_name"), None,
      where = Some(col("r_name") =!= "AFRICA")),
    "nation" -> changelog(Tables.nation(s, dir), "n_regionkey",
      Seq("n_nationkey", "n_name", "n_regionkey"), None),
    "customer" -> changelog(Tables.customer(s, dir), "c_nationkey",
      Seq("c_custkey", "c_nationkey"),
      Some(col("c_custkey") % 11 === 0)),
    "orders" -> changelog(Tables.orders(s, dir), "o_custkey",
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
      Some(col("o_orderkey") % 7 === 0),
      where = Some(col("o_orderstatus") === "F")))

  def incrementalOrderRevenue(s: SparkSession, dir: String): DataFrame = {
    val leaf = runBatch(orderRevenueTree(s, dir), orderRevenueChangelogs(s, dir),
      sourceFiltered = true)
    val df = leaf.toDF()
    df.select(
        (col("tag") * col("mult")).as("sign"),
        canonCol("n_name").as("n_name"),
        round(canonCol("o_totalprice").cast(DoubleType) * 100, 0)
          .cast(LongType).as("price_e2"))
      .groupBy(col("n_name"))
      .agg(sum(col("sign") * col("price_e2")).as("totalprice_e2"),
        sum(col("sign")).cast(LongType).as("n_rows"))
      .filter(col("n_rows") > 0)
  }

  /** TIME-BUCKETED incremental aggregation — the metrics-pipeline
    * shape: the SAME maintained Q10 join tree, but the fold groups by
    * (nation, order month), i.e. a DERIVED time bucket of a joined
    * column. The bucket is computed from the leaf delta's canon at
    * fold time (`substr(o_orderdate, 1, 7)` — ISO date strings make
    * month truncation a string slice), so the engine needs NO new
    * state or operator: any bucketing expression over carried columns
    * is a fold-side choice, exactly like the reference's projection.
    * Retraction-correct per bucket because deltas carry their own
    * date — a deleted order retracts from ITS month, never a
    * neighboring one. */
  private def monthlyAggregate(leaf: Dataset[Evt]): DataFrame = {
    val df = leaf.toDF()
    df.select(
        (col("tag") * col("mult")).as("sign"),
        canonCol("n_name").as("n_name"),
        substring(canonCol("o_orderdate"), 1, 7).as("order_month"),
        round(canonCol("l_extendedprice").cast(DoubleType) *
          (lit(1.0) - canonCol("l_discount").cast(DoubleType)) * 10000, 0)
          .cast(LongType).as("rev_e4"))
      .groupBy(col("n_name"), col("order_month"))
      .agg(sum(col("sign") * col("rev_e4")).as("revenue_e4"),
        sum(col("sign")).cast(LongType).as("n_rows"))
      .filter(col("n_rows") > 0)
  }

  def incrementalMonthlyRevenue(s: SparkSession, dir: String): DataFrame =
    monthlyAggregate(runBatch(q10Tree, q10Changelogs(s, dir), sourceFiltered = true))

  /** The monthly fold over the CONTINUOUS engine's streamed leaf —
    * same oracle as the batch entry, so a per-bucket stream/batch
    * divergence (a retraction landing in the wrong month across
    * micro-batch boundaries) fails the hash. */
  def incrementalMonthlyRevenueStream(s: SparkSession, dir: String): DataFrame =
    monthlyAggregate(replayStream(s, chainStages(q10Tree), q10Changelogs(s, dir),
      "incremental_monthly_stream_leaf"))

  /** Incremental EXISTS / NOT EXISTS — semi- and anti-join as engine
    * nodes. A set-semantics KEY node over the subquery side (orders
    * filtered to status 'O', projected to JUST `o_custkey`) maintains
    * the distinct matching-key set; feeding its 0→1/1→0 deltas as the
    * PARENT of the outer relation's liveness node IS semi-join
    * semantics (each outer row emits exactly once while >= 1 match
    * exists, with full retraction on last-match death). The anti twin
    * is the same wiring under [[NodeSpec.antiParent]]: liveness
    * inverted, emissions carry no subquery columns. Both shapes
    * shuffle once per hop on the correlation key — the co-partitioned
    * plan a 1000-executor cluster needs; no per-row subquery
    * re-execution exists anywhere.
    *
    * Deletes hit BOTH sides: orders %40 (matching-set shrink — a
    * customer whose LAST open order dies flips semi→out / anti→in and
    * the flip replays its buffered row) and customer %30 (plain outer
    * retraction while gated in or out). */
  private def existsChangelogs(s: SparkSession, dir: String): Map[String, Dataset[Evt]] = Map(
    "orders" -> changelog(Tables.orders(s, dir), "o_custkey",
      Seq("o_custkey"),
      Some(col("o_orderkey") % 40 === 0),
      where = Some(col("o_orderstatus") === "O")),
    "customer" -> changelog(Tables.customer(s, dir), "c_custkey",
      Seq("c_custkey", "c_nationkey", "c_acctbal"),
      Some(col("c_custkey") % 30 === 0)))

  private def existsStages(anti: Boolean): Seq[Stage] = Seq(
    Stage("orders_keys", NodeSpec("orders", "o_custkey", "o_custkey",
      isRoot = true, setSemantics = true)),
    Stage("customer", NodeSpec("customer", "c_custkey", "c_custkey",
      antiParent = anti), parentStage = Some("orders_keys")))

  private def existsAggregate(leaf: Dataset[Evt]): DataFrame = {
    val df = leaf.toDF()
    df.select(
        (col("tag") * col("mult")).as("sign"),
        canonCol("c_nationkey").cast(LongType).as("c_nationkey"),
        round(canonCol("c_acctbal").cast(DoubleType) * 100, 0)
          .cast(LongType).as("bal_e2"))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("sign")).cast(LongType).as("n_cust"),
        sum(col("sign") * col("bal_e2")).as("acctbal_e2"))
      .filter(col("n_cust") > 0)
  }

  def incrementalExistsSemi(s: SparkSession, dir: String): DataFrame =
    existsAggregate(runTree(existsStages(anti = false), existsChangelogs(s, dir),
      sourceFiltered = true))

  def incrementalNotExistsAnti(s: SparkSession, dir: String): DataFrame =
    existsAggregate(runTree(existsStages(anti = true), existsChangelogs(s, dir),
      sourceFiltered = true))

  /** A BRANCHING FK tree — the Q10 chain joined with a SECOND
    * dimension branch: nation→customer→orders→lineitem←part. The
    * multi-parent lineitem node (alive iff its orders-chain parent AND
    * its part parent are both alive) decomposes into two liveness
    * stages ([[DeltaEngine.Stage]]): ⋈orders keyed `l_orderkey`
    * emitting re-keyed by `l_partkey`, then ⋈part keyed `l_partkey`.
    * Deletes hit BOTH branches — orders (%50: parent-death fan-out
    * into stage 1) and part (%10: parent-death fan-out into stage 2) —
    * plus the fact itself (linenumber 3), so retractions cross the
    * stage boundary in both directions. */
  val partRevenueStages: Seq[Stage] = Seq(
    Stage("nation", NodeSpec("nation", "n_nationkey", "n_nationkey",
      isRoot = true, setSemantics = true)),
    Stage("customer", NodeSpec("customer", "c_nationkey", "c_custkey"),
      parentStage = Some("nation")),
    Stage("orders", NodeSpec("orders", "o_custkey", "o_orderkey",
      predicate = r => {
        val d = r.getOrElse("o_orderdate", "")
        d >= dateLo && d < dateHi
      }), parentStage = Some("customer")),
    Stage("lineitem", NodeSpec("lineitem", "l_orderkey", "l_partkey",
      predicate = _.getOrElse("l_returnflag", "") == "R"),
      parentStage = Some("orders")),
    Stage("part", NodeSpec("part", "p_partkey", "p_partkey",
      isRoot = true, setSemantics = true,
      predicate = r => r.getOrElse("p_size", "99").toDouble <= 25)),
    Stage("lineitem_part", NodeSpec("lineitem", "l_partkey", "l_partkey"),
      ownStage = Some("lineitem"), parentStage = Some("part")))

  def partRevenueChangelogs(s: SparkSession, dir: String): Map[String, Dataset[Evt]] = Map(
    "nation" -> changelog(Tables.nation(s, dir), "n_nationkey",
      Seq("n_nationkey", "n_name"), None),
    "customer" -> changelog(Tables.customer(s, dir), "c_nationkey",
      Seq("c_custkey", "c_nationkey"), None),
    "orders" -> changelog(Tables.orders(s, dir), "o_custkey",
      Seq("o_orderkey", "o_custkey", "o_orderdate"),
      Some(col("o_orderkey") % 50 === 0),
      where = Some(col("o_orderdate") >= dateLo && col("o_orderdate") < dateHi)),
    "lineitem" -> changelog(Tables.lineitem(s, dir), "l_orderkey",
      Seq("l_orderkey", "l_partkey", "l_linenumber", "l_extendedprice",
        "l_discount", "l_returnflag"),
      Some(col("l_linenumber") === 3),
      where = Some(col("l_returnflag") === "R")),
    "part" -> changelog(Tables.part(s, dir), "p_partkey",
      Seq("p_partkey", "p_brand", "p_size"),
      Some(col("p_partkey") % 10 === 0),
      where = Some(col("p_size") <= 25)))

  def incrementalPartRevenue(s: SparkSession, dir: String): DataFrame = {
    val leaf = runTree(partRevenueStages, partRevenueChangelogs(s, dir),
      sourceFiltered = true).toDF()
    leaf.select(
        (col("tag") * col("mult")).as("sign"),
        canonCol("n_name").as("n_name"),
        canonCol("p_brand").as("p_brand"),
        round(canonCol("l_extendedprice").cast(DoubleType) *
          (lit(1.0) - canonCol("l_discount").cast(DoubleType)) * 10000, 0)
          .cast(LongType).as("rev_e4"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(sum(col("sign") * col("rev_e4")).as("revenue_e4"),
        sum(col("sign")).cast(LongType).as("n_rows"))
      .filter(col("n_rows") > 0)
  }

  /** A SHARED-DIMENSION join graph — nation referenced by BOTH the
    * customer→orders trunk and the supplier branch
    * (`c_nationkey = n_nationkey AND s_nationkey = n_nationkey`). The
    * join is genuinely many-to-many per nation key (every surviving
    * order pairs with every surviving supplier of that nation) — the
    * class an in-tree liveness fold cannot express and round 3's
    * planner rejected loudly. [[TreeCompiler.stagesFor]] now plans it:
    * trunk liveness stages nation→customer→orders re-keyed onto
    * `c_nationkey`, plus one PAIR stage incrementally cross-merging
    * the trunk's join deltas with supplier's changelog per nation key
    * ([[DeltaEngine.PairFold]]). Deletes hit both sides of the
    * product, so pair retractions propagate in both directions. */
  val sharedDimEdges: Seq[TreeCompiler.FkEdge] = Seq(
    TreeCompiler.FkEdge("customer", "c_nationkey", "nation", "n_nationkey"),
    TreeCompiler.FkEdge("orders", "o_custkey", "customer", "c_custkey"),
    TreeCompiler.FkEdge("supplier", "s_nationkey", "nation", "n_nationkey"))

  private val sharedDimPredicates: Map[String, Map[String, String] => Boolean] = Map(
    "orders" -> (r => {
      val d = r.getOrElse("o_orderdate", "")
      d >= dateLo && d < dateHi
    }),
    "supplier" -> (r => r.getOrElse("s_acctbal", "-1").toDouble >= 0))

  /** The DEFAULT compiled plan — nation is a root dimension, so
    * [[TreeCompiler.PairOrientation.Auto]] emits the TRUNK-BUCKETED
    * glue (supplier passes through and replicates ×8; the big trunk
    * side buckets by row hash): the orientation whose parallelism is
    * not capped at 25 nation keys. */
  val sharedDimStages: Seq[Stage] = TreeCompiler.stagesFor(
    sharedDimEdges, Seq("nation", "customer", "orders", "supplier"),
    predicates = sharedDimPredicates)

  /** The dimension-keyed plan (explicit opt-out — zero extra shuffle,
    * |dim|-capped): kept compiled as the base of the explicit-swap
    * twin below, so both orientations stay oracle-covered. */
  val sharedDimStagesDimKeyed: Seq[Stage] = TreeCompiler.stagesFor(
    sharedDimEdges, Seq("nation", "customer", "orders", "supplier"),
    predicates = sharedDimPredicates,
    orientation = TreeCompiler.PairOrientation.DimensionKeyed)

  def sharedDimChangelogs(s: SparkSession, dir: String): Map[String, Dataset[Evt]] = Map(
    "nation" -> changelog(Tables.nation(s, dir), "n_nationkey",
      Seq("n_nationkey", "n_name"), None),
    "customer" -> changelog(Tables.customer(s, dir), "c_nationkey",
      Seq("c_custkey", "c_nationkey"), None),
    "orders" -> changelog(Tables.orders(s, dir), "o_custkey",
      Seq("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
      Some(col("o_orderkey") % 7 === 0),
      where = Some(col("o_orderdate") >= dateLo && col("o_orderdate") < dateHi)),
    "supplier" -> changelog(Tables.supplier(s, dir), "s_nationkey",
      Seq("s_suppkey", "s_nationkey", "s_acctbal"),
      Some(col("s_suppkey") % 5 === 0),
      where = Some(col("s_acctbal") >= 0)))

  def incrementalSharedRevenue(s: SparkSession, dir: String): DataFrame =
    sharedAggregate(runTree(sharedDimStages, sharedDimChangelogs(s, dir),
      sourceFiltered = true))

  private def sharedAggregate(leaf: Dataset[Evt]): DataFrame = {
    leaf.toDF().select(
        (col("tag") * col("mult")).as("sign"),
        canonCol("n_name").as("n_name"),
        round(canonCol("o_totalprice").cast(DoubleType) * 100, 0)
          .cast(LongType).as("price_e2"))
      .groupBy(col("n_name"))
      .agg(sum(col("sign") * col("price_e2")).as("revenue_e2"),
        sum(col("sign")).cast(LongType).as("n_pairs"))
      .filter(col("n_pairs") > 0)
  }

  /** The DIMENSION-KEYED plan swapped by hand via
    * [[TreeCompiler.swapPairOrientation]] (S = 8) — the explicit-API
    * route to the same trunk-bucketed shape `stagesFor` now emits by
    * default, behind the SAME survivors oracle as
    * incremental_shared_dim: the bucketed product must be
    * answer-invariant through BOTH construction paths, not just
    * spec-asserted. */
  def incrementalSharedRevenueSalted(s: SparkSession, dir: String): DataFrame =
    sharedAggregate(runTree(
      TreeCompiler.swapPairOrientation(sharedDimStagesDimKeyed, salts = 8),
      sharedDimChangelogs(s, dir), sourceFiltered = true))

  /** The Q10 tree with its heaviest hop SALTED (S = 8): lineitem
    * events bucket by row hash while orders' liveness deltas replicate
    * to every bucket ([[DeltaEngine.Stage]] skew note). Behind the
    * same survivors oracle as incremental_q10 — the de-skew must be
    * answer-invariant, not just spec-asserted. */
  def incrementalQ10Salted(s: SparkSession, dir: String): DataFrame = {
    val stages = chainStages(q10Tree) match {
      case init :+ last => init :+ last.copy(salts = 8)
    }
    q10Aggregate(runTree(stages, q10Changelogs(s, dir), sourceFiltered = true))
  }

  /** A mergeable HISTOGRAM SKETCH over the MAINTAINED Q10 view — the
    * engine's two layers compose: the delta tree maintains
    * per-customer revenue under inserts AND retractions, and a
    * fixed-width histogram (integer bin of the exact integer
    * revenue_e4) reduces the maintained view to <= #bins counts per
    * nation for a per-nation median-revenue readout. Presentation
    * over the view — recomputed from the maintained groups like the
    * SQL compiler's HAVING/ORDER BY, never from raw rows. Bin
    * arithmetic: Spark `div` truncates toward zero, DuckDB `//`
    * floors — identical here because revenue_e4 is nonnegative. */
  private val RevBinE4 = 200000000L // $20,000 in 1e-4 units
  def incrementalQ10RevQuantile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val view = incrementalQ10(s, dir)
    val hist = view.groupBy(col("n_name"),
        expr(s"revenue_e4 div $RevBinE4").as("bin"))
      .agg(count(lit(1)).as("n"))
    val byNation = Window.partitionBy(col("n_name"))
    hist
      .withColumn("cum", sum(col("n")).over(byNation.orderBy(col("bin"))))
      .withColumn("total", sum(col("n")).over(byNation))
      .groupBy(col("n_name"))
      .agg(
        min(when(col("cum") * 2 >= col("total"),
          (col("bin").cast(DoubleType) + lit(0.5)) * lit(RevBinE4.toDouble)))
          .as("p50_rev_est"),
        max(col("total")).as("n_cust"))
  }

  /** The CONTINUOUS engine itself behind the correctness gate — not
    * its batch simulation: the q10 changelog replays through
    * [[DeltaEngine.runStream]] as real Structured Streaming
    * micro-batches (inserts in batch 1, deletes in batch 2, node state
    * carried across batches in the state store), the leaf deltas land
    * in a memory sink, and the same signed fold produces the
    * maintained aggregate. The oracle is incremental_q10's plain-SQL
    * survivors query, so a streaming-vs-batch divergence fails the
    * hash. MemoryStream is the replay harness (the production shape is
    * readStream + foreachBatch upsert, StreamingSpec covers recovery);
    * the collect() here materializes the fixture changelog for
    * addData, not an engine step. */
  /** Shared micro-batch replay harness for the gated stream entries:
    * runs `stages` through [[DeltaEngine.runStreamTree]] in a CHILD
    * session, replaying each changelog seq value as its own
    * micro-batch (state carries across batches in the state store),
    * and returns the collected leaf deltas.
    *
    * The child session is sized to the micro-batch volume: chained
    * stateful operators pin ONE state-store instance per shuffle
    * partition per operator per micro-batch — at replay scale (two
    * small batches) those state commits dominate the wall clock
    * (8 partitions: measured 16.4 s → 8.3 s at sf0.1) without
    * touching the outer session's batch-sized setting. Production
    * guidance is unchanged: size state partitions to the data. */
  private def replayStream(s: SparkSession, stages: Seq[Stage],
      logs0: Map[String, Dataset[Evt]], sinkName: String,
      eventTtl: Option[DeltaEngine.EventTimeTtl] = None,
      tws: Boolean = false): Dataset[Evt] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ss = replaySession(s)
    if (tws) // transformWithState's documented store requirement
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    if (eventTtl.isDefined) {
      // the EventTimeTtl session requirements (see its scaladoc):
      // per-stage re-derived event times trip the blanket chained-
      // stateful heuristic, and only some changelogs carry the ts
      // column, so the combined watermark must take the max
      ss.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
      ss.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "max")
    }
    implicit val sq: org.apache.spark.sql.SQLContext = ss.sqlContext
    import s.implicits._
    val logs = logs0.view
      .map { case (rel, ds) =>
        rel -> boundedReplayCollect(s"$sinkName($rel)", ds).toSeq }
      .toMap
    val streams = logs.map { case (rel, _) => rel -> MemoryStream[Evt] }
    val streamIn = streams.map { case (r, ms) => r -> ms.toDS() }
    val leaf =
      if (tws) DeltaEngine.runStreamTreeTws(stages, streamIn, sourceFiltered = true)
      else runStreamTree(stages, streamIn, sourceFiltered = true, eventTtl = eventTtl)
    val query = leaf.writeStream
      .format("memory").queryName(sinkName)
      .outputMode("append").start()
    try {
      // replay the changelogs' actual seq values in order, one
      // micro-batch per seq, instead of assuming {0, 1}
      logs.values.flatten.map(_.seq).toSeq.distinct.sorted.foreach { seq =>
        streams.foreach { case (rel, ms) =>
          val evs = logs(rel).filter(_.seq == seq)
          if (evs.nonEmpty) ms.addData(evs)
        }
        query.processAllAvailable()
      }
    } finally query.stop()
    ss.table(sinkName).as[Evt](implicitly)
  }

  def incrementalQ10Stream(s: SparkSession, dir: String): DataFrame =
    q10Aggregate(replayStream(s, chainStages(q10Tree), q10Changelogs(s, dir),
      "incremental_q10_stream_leaf"))

  /** The flagship maintained tree on Spark 4's `transformWithState` —
    * the engine's core capability moved onto the SUPPORTED
    * arbitrary-state API ([[DeltaEngine.TreeNodeProcessor]]: per-node
    * MapState child multisets with point updates, ValueState liveness,
    * per-key timers for TTL), gated against the SAME oracle as
    * [[incrementalQ10Stream]] — two streaming state APIs, one truth. */
  def incrementalQ10Tws(s: SparkSession, dir: String): DataFrame =
    q10Aggregate(replayStream(s, chainStages(q10Tree), q10Changelogs(s, dir),
      "incremental_q10_tws_leaf", tws = true))

  /** The incremental engine's SINK upgraded to a LAKEHOUSE TABLE —
    * the reference's K1 (a text file of per-delta updates) replaced
    * by the maintained Q10 view LIVING IN the versioned snapshot log:
    * each micro-batch of signed leaf deltas folds to per-group
    * (Δrevenue, Δrows), combines with the group's current stored
    * totals, and lands as a MERGE commit — an unseen group inserts, a
    * changed group updates, and a group whose row count RETRACTS TO
    * ZERO deletes its table row (the delete the reference's running
    * file never expresses). The gated value is the FINAL SNAPSHOT
    * against the plain survivors oracle: batch boundaries, the
    * upsert/delete path, and the copy-on-write commits must all be
    * invisible. Every version along the way remains time-travelable.
    * At scale the per-batch read of current totals would prune to the
    * changed groups' buckets (the same partition pruning the
    * snapshot's readers use); the fixture reads the small table
    * whole. */
  def incrementalQ10SnapshotSink(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.SnapshotLog
    val ss = replaySession(s)
    implicit val sq: org.apache.spark.sql.SQLContext = ss.sqlContext
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_q10_snapsink").toString
    val logs = q10Changelogs(ss, dir).view.map { case (rel, ds) =>
      rel -> boundedReplayCollect(s"incremental_q10_snapshot_sink($rel)", ds).toSeq }
      .toMap
    val streams = logs.map { case (rel, _) => rel -> MemoryStream[Evt] }
    val leaf = runStreamTree(chainStages(q10Tree),
      streams.map { case (r, ms) => r -> ms.toDS() }, sourceFiltered = true)
    val goldPayload = Seq("c_name", "c_acctbal", "n_name", "revenue_e4", "n_rows")
    val version = new java.util.concurrent.atomic.AtomicInteger(-1)
    def deltaAgg(batch: Dataset[Evt]): DataFrame = {
      batch.toDF().select(
          (col("tag") * col("mult")).as("sign"),
          canonCol("c_custkey").cast("long").as("c_custkey"),
          canonCol("c_name").as("c_name"),
          canonCol("c_acctbal").cast("double").as("c_acctbal"),
          canonCol("n_name").as("n_name"),
          round(canonCol("l_extendedprice").cast("double") *
            (lit(1.0) - canonCol("l_discount").cast("double")) * 10000, 0)
            .cast("long").as("rev_e4"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(col("sign") * col("rev_e4")).as("d_rev"),
          sum(col("sign")).cast("long").as("d_n"))
    }
    val query = leaf.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Evt], _: Long) =>
        val deltas = deltaAgg(batch).localCheckpoint(true)
        if (!deltas.isEmpty) {
          if (version.get < 0) {
            require(deltas.filter(col("d_n") <= 0).isEmpty,
              "first batch must be pure assertion")
            SnapshotLog.commitInitial(
              deltas.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
                col("n_name"), col("d_rev").as("revenue_e4"), col("d_n").as("n_rows")),
              root, "c_custkey")
            version.set(0); ()
          } else {
            val cur = SnapshotLog.readVersion(ss, root, version.get)
              .select(col("c_custkey"), col("revenue_e4").as("cur_rev"),
                col("n_rows").as("cur_n"))
            val combined = deltas.join(cur, Seq("c_custkey"), "left")
              .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"),
                (coalesce(col("cur_rev"), lit(0L)) + col("d_rev")).as("revenue_e4"),
                (coalesce(col("cur_n"), lit(0L)) + col("d_n")).as("n_rows"))
            require(combined.filter(col("n_rows") < 0).isEmpty,
              "a group retracted below zero — delta fold diverged")
            val changes = combined.select(
              col("c_custkey"),
              when(col("n_rows") === 0, "D").otherwise("U").as("op"),
              col("c_name"), col("c_acctbal"), col("n_name"),
              col("revenue_e4"), col("n_rows"))
            SnapshotLog.commitMerge(ss, root, version.get + 1, "c_custkey",
              goldPayload, changes)
            version.incrementAndGet(); ()
          }
        }
      }
      .start()
    try {
      logs.values.flatten.map(_.seq).toSeq.distinct.sorted.foreach { seq =>
        streams.foreach { case (rel, ms) =>
          val evs = logs(rel).filter(_.seq == seq)
          if (evs.nonEmpty) ms.addData(evs)
        }
        query.processAllAvailable()
      }
    } finally query.stop()
    require(version.get >= 1, s"expected at least two commits, got v${version.get}")
    SnapshotLog.readVersion(ss, root, version.get)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"),
        col("revenue_e4"), col("n_rows"))
  }

  /** [[incrementalQ10Stream]] with EVENT-TIME TTL enabled — the
    * watermark/timeout machinery (EventTimeTimeout plan, per-stage
    * watermark nodes, horizon arithmetic) runs on every stage, with
    * `delay` sized past the fixture's whole date span so no key's
    * horizon passes during the two-batch replay: state is bounded by
    * data time WITHOUT changing the maintained answer, which is the
    * production contract (the eviction path itself is spec-asserted
    * with a controlled timeline in StreamingSpec). Same survivors
    * oracle as incremental_q10. */
  def incrementalQ10StreamTtl(s: SparkSession, dir: String): DataFrame =
    q10Aggregate(replayStream(s, chainStages(q10Tree), q10Changelogs(s, dir),
      "incremental_q10_stream_ttl_leaf",
      eventTtl = Some(DeltaEngine.EventTimeTtl(
        "o_orderdate", java.time.Duration.ofDays(3650)))))

  /** The CONTINUOUS pair stage behind the correctness gate — the
    * shared-dim changelog replays through [[DeltaEngine.runStreamTree]]
    * as real micro-batches (inserts then deletes, pair state carried
    * across batches in the state store), against the same survivors
    * oracle as incremental_shared_dim. */
  def incrementalSharedStream(s: SparkSession, dir: String): DataFrame =
    sharedAggregate(replayStream(s, sharedDimStages, sharedDimChangelogs(s, dir),
      "incremental_shared_stream_leaf"))

  /** The shared-dimension PAIR stage on `transformWithState`
    * ([[DeltaEngine.PairNodeProcessor]]: both product sides as typed
    * MapStates, changed entries point-written back) — the TWS driver
    * covers the whole stage vocabulary, liveness AND pair, each gated
    * on the same oracle as its flatMap twin. */
  def incrementalSharedTws(s: SparkSession, dir: String): DataFrame =
    sharedAggregate(replayStream(s, sharedDimStages, sharedDimChangelogs(s, dir),
      "incremental_shared_tws_leaf", tws = true))

  /** SQL TEXT driving the CONTINUOUS engine behind the correctness
    * gate — the full round trip in one entry: Catalyst-parsed query →
    * compiled stage graph → [[SqlCompiler]]'s `runStream` over RAW
    * event streams (its per-stream `eventFilter` re-applies the local
    * predicates — the streaming twin of scan pushdown) → micro-batch
    * replay with state across batches → the compiled signed-fold
    * aggregate. Same survivors oracle as incremental_q10, so any
    * compile-or-stream divergence fails the hash. Child session sized
    * like [[replayStream]] (state-store commits dominate a two-batch
    * replay). */
  def incrementalSqlQ10Stream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val c = SqlCompiler.compile(s, dir,
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM nation, customer, orders, lineitem
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)
    runSqlStreamed(s, c, dir, Map(
        "lineitem" -> (col("l_linenumber") === 3),
        "orders" -> (col("o_orderkey") % 50 === 0)),
      "incremental_sql_q10_stream_leaf")
  }

  /** LEFT OUTER JOIN from SQL TEXT: the compiler plans the inner tree
    * PLUS an anti plan per LEFT boundary (NOT EXISTS wiring — see
    * [[SqlCompiler.OuterPlan]]); their unioned leaf deltas feed the
    * one fold, where the optional side's absent canon columns read as
    * SQL NULLs. Orders with no R-lineitem surface as NULL-extended
    * rows (SUM skips them, COUNT(*) counts them); when lineitem
    * deletes make an order childless, the key node's 1→0 flip asserts
    * the NULL-extension the inner plan just retracted — and vice
    * versa. Oracle: the same LEFT JOIN over the survivor tables. */
  private val q10OuterSql =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
       | COUNT(*) AS n_rows
       |FROM nation
       |JOIN customer ON c_nationkey = n_nationkey
       |JOIN orders ON o_custkey = c_custkey
       |LEFT JOIN lineitem ON l_orderkey = o_orderkey AND l_returnflag = 'R'
       |WHERE o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin

  private val q10OuterDeletes = Map(
    "orders" -> (col("o_orderkey") % 50 === 0),
    "lineitem" -> (col("l_linenumber") === 3))

  def incrementalSqlQ10Outer(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compile(s, dir, q10OuterSql).run(s, dir, q10OuterDeletes)

  /** FULL OUTER from SQL text: the LEFT OUTER machinery preserves
    * orders with no surviving lineitem, and the compiler's ORPHAN plan
    * preserves lineitems with no surviving order — those fold under
    * NULL for every customer/nation grouping key, SQL's right-preserved
    * row. Deletes hit BOTH boundary relations so both preservation
    * directions carry real traffic (deleting 1-in-50 orders orphans
    * their lines; deleting a third of lineitems NULL-extends ~1000
    * orders). No WHERE anywhere — the compiler's full-outer scope
    * rules reject it (SQL would NULL-reject the orphan rows). */
  private val q10FullOuterSql =
    """SELECT c_custkey, n_name,
        | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY c_custkey, n_name""".stripMargin

  private val q10FullOuterDeletes = Map(
    "orders" -> (col("o_orderkey") % 50 === 0),
    "lineitem" -> (col("l_partkey") % 3 === 0))

  def incrementalSqlQ10FullOuter(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compile(s, dir, q10FullOuterSql)
      .run(s, dir, q10FullOuterDeletes)

  /** The SAME maintained view written as a RIGHT JOIN (preserved side
    * on the right): the compiler canonicalizes RightOuter by swapping
    * children onto the LEFT OUTER machinery, so a user's RIGHT JOIN
    * text compiles instead of bouncing with a rewrite hint. */
  def incrementalSqlQ10Right(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compile(s, dir,
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM lineitem
         |RIGHT JOIN (nation
         | JOIN customer ON c_nationkey = n_nationkey
         | JOIN orders ON o_custkey = c_custkey)
         | ON l_orderkey = o_orderkey AND l_returnflag = 'R'
         |WHERE o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)
      .run(s, dir, q10OuterDeletes)

  /** [[incrementalSqlQ10Outer]] through the CONTINUOUS engine: both
    * the inner and the anti plan replay over the same raw event
    * streams as real micro-batches (inserts then deletes), so the
    * NULL-extension asserts/retracts ACROSS batches through held
    * state. */
  def incrementalSqlQ10OuterStream(s: SparkSession, dir: String): DataFrame =
    runSqlStreamed(s, SqlCompiler.compile(s, dir, q10OuterSql), dir,
      q10OuterDeletes, "incremental_sql_q10_outer_stream_leaf")

  /** The compiled FULL OUTER through the CONTINUOUS engine: inner
    * tree, anti plan AND orphan plan replay the same raw streams as
    * real micro-batches — batch 1's inserts assert orphans only for
    * orders never seen; batch 2's order deletes must then CREATE
    * orphans (their lines' preservation flips on) while lineitem
    * deletes retract NULL-extensions, all through held state. */
  def incrementalSqlQ10FullOuterStream(s: SparkSession, dir: String): DataFrame =
    runSqlStreamed(s, SqlCompiler.compile(s, dir, q10FullOuterSql), dir,
      q10FullOuterDeletes, "incremental_sql_q10_fullouter_stream_leaf")

  /** FULL OUTER **with a WHERE on the preserved (orders) side** — the
    * r8 fence lifted: SQL's WHERE runs after the join, so the date
    * predicate NULL-rejects every orphan (right-preserved) row, and
    * the compiler now PLANS that instead of rejecting it — the orphan
    * plan is dropped (exactly SQL's answer), the predicate becomes an
    * ordinary orders scan filter, and NULL-extension maintenance
    * (orders that lost every lineitem) continues. The oracle is the
    * literal FULL JOIN + WHERE, so DuckDB independently performs the
    * same NULL-rejection. */
  private val q10FullOuterFilteredSql =
    s"""SELECT c_custkey, n_name,
       | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
       | COUNT(*) AS n_rows
       |FROM nation
       |JOIN customer ON c_nationkey = n_nationkey
       |JOIN orders ON o_custkey = c_custkey
       |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
       |GROUP BY c_custkey, n_name""".stripMargin

  def incrementalSqlQ10FullOuterFiltered(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compile(s, dir, q10FullOuterFilteredSql)
      .run(s, dir, q10FullOuterDeletes)

  def incrementalSqlQ10FullOuterFilteredStream(s: SparkSession, dir: String): DataFrame =
    runSqlStreamed(s, SqlCompiler.compile(s, dir, q10FullOuterFilteredSql), dir,
      q10FullOuterDeletes, "incremental_sql_q10_fullouter_filtered_leaf")

  /** The mirror case — WHERE on the BOUNDARY CHILD: SQL NULL-rejects
    * every NULL-extension row instead, so the compile drops the anti
    * plan, keeps the orphan plan (lineitems with no surviving order,
    * pre-filtered by the predicate-as-scan-filter), and the view is
    * effectively the RIGHT-preserved reading. */
  private val q10FullOuterChildFilteredSql =
    """SELECT c_custkey, n_name,
      | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
      | COUNT(*) AS n_rows
      |FROM nation
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_linenumber <> 3
      |GROUP BY c_custkey, n_name""".stripMargin

  def incrementalSqlQ10FullOuterChildFiltered(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compile(s, dir, q10FullOuterChildFilteredSql)
      .run(s, dir, q10FullOuterDeletes)

  def incrementalSqlQ10FullOuterChildFilteredStream(s: SparkSession, dir: String): DataFrame =
    runSqlStreamed(s, SqlCompiler.compile(s, dir, q10FullOuterChildFilteredSql), dir,
      q10FullOuterDeletes, "incremental_sql_q10_fullouter_cf_leaf")

  /** FULL OUTER × [NOT] EXISTS gate on an INNER relation — the
    * join-then-filter corner: SQL evaluates the gate on the JOINED
    * row, so (a) children of a gate-failing nation matched at join
    * time and are WHERE-dropped as matched rows — they must NOT
    * resurrect as orphans (the orphan plan keys off the UNGATED
    * join-time prefix), and (b) on a right-preserved row the
    * correlation column is the structural NULL of an absent relation:
    * EXISTS is FALSE there (the orphan class is not built at all)
    * while NOT EXISTS is trivially TRUE (orphans pass ungated). */
  private def q10FullOuterGatedSql(anti: String) =
    s"""SELECT c_custkey, n_name,
       | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
       | COUNT(*) AS n_rows
       |FROM nation
       |JOIN customer ON c_nationkey = n_nationkey
       |JOIN orders ON o_custkey = c_custkey
       |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE ${anti}EXISTS (SELECT 1 FROM region
       |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
       |GROUP BY c_custkey, n_name""".stripMargin

  def incrementalSqlQ10FullOuterGated(s: SparkSession, dir: String, anti: String): DataFrame =
    SqlCompiler.compile(s, dir, q10FullOuterGatedSql(anti))
      .run(s, dir, q10FullOuterDeletes)

  def incrementalSqlQ10FullOuterGatedStream(s: SparkSession, dir: String,
                                            anti: String, leaf: String): DataFrame =
    runSqlStreamed(s, SqlCompiler.compile(s, dir, q10FullOuterGatedSql(anti)), dir,
      q10FullOuterDeletes, leaf)

  /** The FIND-THE-ORPHANS idiom — FULL OUTER with `WHERE o_orderkey
    * IS NULL` (the r9 fence lifted): the parent boundary key is NULL
    * exactly on the right-preserved rows (the engine-wide non-null
    * FK-key assumption), so the compile keeps ONLY the orphan plan —
    * lineitems whose order is dead anywhere up the tree — drops the
    * anti plan, and never builds the inner tree. Every left grouping
    * key folds as NULL: SQL's single orphan group. Ancestor deletes
    * ride along so orphan-creation flows through the tree-prefix key
    * node, not just the boundary pair. */
  private val q10FullOuterIsNullSql =
    """SELECT c_custkey, n_name,
      | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
      | COUNT(*) AS n_rows
      |FROM nation
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE o_orderkey IS NULL
      |GROUP BY c_custkey, n_name""".stripMargin

  def incrementalSqlQ10FullOuterIsNull(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compile(s, dir, q10FullOuterIsNullSql)
      .run(s, dir, q10FullOuterAncestorDeletes)

  def incrementalSqlQ10FullOuterIsNullStream(s: SparkSession, dir: String): DataFrame =
    runSqlStreamed(s, SqlCompiler.compile(s, dir, q10FullOuterIsNullSql), dir,
      q10FullOuterAncestorDeletes, "incremental_sql_q10_fullouter_isnull_leaf")

  /** FULL OUTER with **deletes on an ANCESTOR of the boundary pair**
    * (customer) — the other r8 fence lifted: the chain-shaped orphan
    * plan now keys on the TREE PREFIX's merged emissions (orders
    * alive under customer and nation), so deleting a customer flips
    * its orders dead in the key node and their lineitems assert as
    * orphans — the rows SQL preserves on the right when the left tree
    * loses the parent row for ANY upstream reason. */
  private val q10FullOuterAncestorDeletes = Map(
    "customer" -> (col("c_custkey") % 30 === 0),
    "orders" -> (col("o_orderkey") % 50 === 0),
    "lineitem" -> (col("l_partkey") % 3 === 0))

  def incrementalSqlQ10FullOuterAncestorDel(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compile(s, dir, q10FullOuterSql)
      .run(s, dir, q10FullOuterAncestorDeletes)

  def incrementalSqlQ10FullOuterAncestorDelStream(s: SparkSession, dir: String): DataFrame =
    runSqlStreamed(s, SqlCompiler.compile(s, dir, q10FullOuterSql), dir,
      q10FullOuterAncestorDeletes, "incremental_sql_q10_fullouter_adel_leaf")

  /** The compiled FULL OUTER — fused fullOuterLeaf + the anti plan —
    * through the TWS driver under ancestor deletes: the compiler's
    * hardest maintained shape on the supported state API, same oracle
    * as the flatMap twin. */
  def incrementalSqlQ10FullOuterTws(s: SparkSession, dir: String): DataFrame =
    runSqlStreamed(s, SqlCompiler.compile(s, dir, q10FullOuterSql), dir,
      q10FullOuterAncestorDeletes, "incremental_sql_q10_fullouter_tws_leaf",
      tws = true)

  /** Maintained TOP-LEVEL UNION ALL across two DIFFERENT trees —
    * nation revenue from the customer side (nation→customer→orders→
    * lineitem) unioned with nation revenue from the supplier side
    * (nation→supplier→lineitem). Each branch compiles and maintains
    * independently (lineitem even routes by a different FK per
    * branch); the union is presentation. Shared deletes apply to both
    * branches' changelogs. */
  private val unionSql =
    """SELECT n_name,
      | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
      | COUNT(*) AS n_rows
      |FROM nation
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_returnflag = 'R'
      |GROUP BY n_name
      |UNION ALL
      |SELECT n_name,
      | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
      | COUNT(*) AS n_rows
      |FROM nation
      |JOIN supplier ON s_nationkey = n_nationkey
      |JOIN lineitem ON l_suppkey = s_suppkey
      |WHERE l_returnflag = 'R'
      |GROUP BY n_name""".stripMargin
  private val unionDeletes = Map("lineitem" -> (col("l_partkey") % 3 === 0))

  // Cross-branch changelog sharing (SqlCompiler.sharedBranchChangelogs
  // — lineitem feeds both branches under the same filter) was tried in
  // round 17 and measured SLOWER at sf0.1: min 2.65 -> 2.89 s with the
  // control query FASTER in the same window (the r16 two-consumer
  // lesson again — the shared canon's serial checkpoint barrier costs
  // more than the lazy re-scan, which pipelines into each branch's
  // first shuffle map stage and is page-cache absorbed). The helper
  // stays for >= 3-branch compositions, where the math flips.
  def incrementalSqlUnion(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compileUnionAll(s, dir, unionSql)
      .map(_.run(s, dir, unionDeletes)).reduce(_ unionAll _)

  // ---- maintained INTERSECT / EXCEPT --------------------------------

  /** Branches: nations with a high-balance customer vs nations with a
    * high-balance supplier — both non-aggregate DISTINCT views whose
    * deletes flip tuples in and out of the set result. */
  private val setOpLhs =
    """SELECT DISTINCT n_name FROM nation
      |JOIN customer ON c_nationkey = n_nationkey
      |WHERE c_acctbal > 8000""".stripMargin
  private val setOpRhs =
    """SELECT DISTINCT n_name FROM nation
      |JOIN supplier ON s_nationkey = n_nationkey
      |WHERE s_acctbal > 5000""".stripMargin
  private val setOpDeletes = Map(
    "customer" -> (col("c_custkey") % 13 === 0),
    "supplier" -> (col("s_suppkey") % 7 === 0))

  def incrementalSqlIntersect(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compileSetOp(s, dir, setOpLhs + "\nINTERSECT\n" + setOpRhs)
      .run(s, dir, setOpDeletes)

  def incrementalSqlExcept(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compileSetOp(s, dir, setOpLhs + "\nEXCEPT\n" + setOpRhs)
      .run(s, dir, setOpDeletes)

  /** Bare UNION (set semantics) across BAG branches — multiplicity
    * collapses across and within branches through one set-semantics
    * netting node; a delete removes a tuple only when NO branch still
    * produces it. Branches deliberately non-DISTINCT so the collapse
    * itself is what's gated. */
  private val unionDistinctSql =
    """SELECT n_name FROM nation
      |JOIN customer ON c_nationkey = n_nationkey
      |WHERE c_acctbal > 8000
      |UNION
      |SELECT n_name FROM nation
      |JOIN supplier ON s_nationkey = n_nationkey
      |WHERE s_acctbal > 5000""".stripMargin

  def incrementalSqlUnionDistinct(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compileUnionDistinct(s, dir, unionDistinctSql)
      .run(s, dir, setOpDeletes)

  /** The continuous form of the set-semantics UNION: every branch
    * tree and the netting node in one streaming query. */
  def incrementalSqlUnionDistinctStream(s: SparkSession, dir: String,
      tws: Boolean = false): DataFrame = {
    val sinkName =
      if (tws) "incremental_sql_union_distinct_tws_leaf"
      else "incremental_sql_union_distinct_leaf"
    streamUnionDistinct(s, SqlCompiler.compileUnionDistinct(s, dir, unionDistinctSql),
      dir, setOpDeletes, sinkName, tws)
  }

  /** Replay a [[SqlCompiler.CompiledUnionDistinct]] continuously:
    * every branch tree plus the shared netting node in ONE streaming
    * query, micro-batches interleaved across branches in seq order. */
  private def streamUnionDistinct(s: SparkSession,
      c: SqlCompiler.CompiledUnionDistinct, dir: String,
      deletes: Map[String, org.apache.spark.sql.Column], sinkName: String,
      tws: Boolean = false): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ss = replaySession(s)
    if (tws) ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sq: org.apache.spark.sql.SQLContext = ss.sqlContext
    import s.implicits._
    val sides = c.branches.zipWithIndex.map { case (cc, i) =>
      val logs = cc.sourceChangelogs(s, dir, deletes, filtered = false)
        .view.map { case (rel, ds) =>
          rel -> boundedReplayCollect(s"$sinkName(b$i.$rel)", ds).toSeq }.toMap
      (logs, logs.map { case (rel, _) => rel -> MemoryStream[Evt] })
    }
    val leaf = c.runStream(sides.map(_._2.view.mapValues(_.toDS()).toMap), tws = tws)
    val query = leaf.writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start()
    try {
      val seqs = sides.flatMap(_._1.values.flatten.map(_.seq)).distinct.sorted
      seqs.foreach { seq =>
        sides.foreach { case (logs, streams) =>
          streams.foreach { case (rel, ms) =>
            val evs = logs(rel).filter(_.seq == seq)
            if (evs.nonEmpty) ms.addData(evs)
          }
        }
        query.processAllAvailable()
      }
    } finally query.stop()
    c.present(ss.table(sinkName).as[Evt])
  }

  /** Bag branches (no DISTINCT): n_name once per qualifying customer
    * vs once per qualifying supplier — INTERSECT ALL keeps min of the
    * two multiplicities, EXCEPT ALL the surplus. */
  private val bagSetOpLhs =
    """SELECT n_name FROM nation
      |JOIN customer ON c_nationkey = n_nationkey
      |WHERE c_acctbal > 8000""".stripMargin
  private val bagSetOpRhs =
    """SELECT n_name FROM nation
      |JOIN supplier ON s_nationkey = n_nationkey
      |WHERE s_acctbal > 5000""".stripMargin

  def incrementalSqlIntersectAll(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compileBagSetOp(s, dir, bagSetOpLhs + "\nINTERSECT ALL\n" + bagSetOpRhs)
      .run(s, dir, setOpDeletes)

  def incrementalSqlExceptAll(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compileBagSetOp(s, dir, bagSetOpLhs + "\nEXCEPT ALL\n" + bagSetOpRhs)
      .run(s, dir, setOpDeletes)

  /** Continuous bag set ops: both branch trees replay side-tagged into
    * one sink; the bag formula evaluates at presentation. */
  private def runBagSetOpStreamed(s: SparkSession, dir: String, opSql: String,
                                  sinkName: String): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ss = replaySession(s)
    implicit val sq: org.apache.spark.sql.SQLContext = ss.sqlContext
    import s.implicits._
    val c = SqlCompiler.compileBagSetOp(s, dir, opSql)
    def side(cc: SqlCompiler.Compiled, tag: String)
        : (Map[String, Seq[Evt]], Map[String, MemoryStream[Evt]]) = {
      val logs = cc.sourceChangelogs(s, dir, setOpDeletes, filtered = false)
        .view.map { case (rel, ds) =>
          rel -> boundedReplayCollect(s"$sinkName($tag.$rel)", ds).toSeq }.toMap
      (logs, logs.map { case (rel, _) => rel -> MemoryStream[Evt] })
    }
    val (lLogs, lStreams) = side(c.left, "l")
    val (rLogs, rStreams) = side(c.right, "r")
    val leaf = c.runStream(lStreams.view.mapValues(_.toDS()).toMap,
      rStreams.view.mapValues(_.toDS()).toMap)
    val query = leaf.writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start()
    try {
      val seqs = (lLogs.values.flatten ++ rLogs.values.flatten)
        .map(_.seq).toSeq.distinct.sorted
      seqs.foreach { seq =>
        lStreams.foreach { case (rel, ms) =>
          val evs = lLogs(rel).filter(_.seq == seq)
          if (evs.nonEmpty) ms.addData(evs)
        }
        rStreams.foreach { case (rel, ms) =>
          val evs = rLogs(rel).filter(_.seq == seq)
          if (evs.nonEmpty) ms.addData(evs)
        }
        query.processAllAvailable()
      }
    } finally query.stop()
    c.present(ss.table(sinkName).as[Evt])
  }

  def incrementalSqlIntersectAllStream(s: SparkSession, dir: String): DataFrame =
    runBagSetOpStreamed(s, dir, bagSetOpLhs + "\nINTERSECT ALL\n" + bagSetOpRhs,
      "incremental_sql_intersect_all_leaf")

  def incrementalSqlExceptAllStream(s: SparkSession, dir: String): DataFrame =
    runBagSetOpStreamed(s, dir, bagSetOpLhs + "\nEXCEPT ALL\n" + bagSetOpRhs,
      "incremental_sql_except_all_leaf")

  // ---- ASOF JOIN from SQL text ---------------------------------------

  /** The ASOF dialect text the SQL-surface entries compile — the same
    * enrichment events_asof_join runs through the API. */
  private val asofSql =
    """SELECT p.event_id, p.user_id, p.ts,
      | c.click_id AS asof_click_id, c.ts AS asof_click_ts
      |FROM p ASOF LEFT JOIN c
      |ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  /** The prepared branches (CTE bodies stay DataFrame code): clicks
    * deduped to one per (user, ts) for a deterministic match. */
  private def asofInputs(s: SparkSession, dir: String): Map[String, DataFrame] = {
    val ev = Tables.events(s, dir)
    Map(
      "c" -> ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id")),
      "p" -> ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id")))
  }

  def incrementalSqlAsOf(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compileAsOf(s, asofSql).run(asofInputs(s, dir))

  /** The ASOF dialect with the RIGHT KEY in the select list: under
    * ASOF LEFT JOIN the null extension must surface NULL for right
    * columns (DuckDB/Snowflake semantics) even though a MATCHED right
    * key equals the left's — the lowering substitutes the left key
    * gated on the match witness, never unconditionally. 143 of the
    * 1981 sf0.01 purchases have no prior click, so the NULL path is
    * genuinely exercised. */
  private val asofRightKeySql =
    """SELECT p.event_id, p.user_id, p.ts,
      | c.click_id AS asof_click_id, c.user_id AS asof_click_user,
      | c.ts AS asof_click_ts
      |FROM p ASOF LEFT JOIN c
      |ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  def incrementalSqlAsOfRightKey(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compileAsOf(s, asofRightKeySql).run(asofInputs(s, dir))

  def incrementalSqlAsOfTolerance(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compileAsOf(s,
      """SELECT p.event_id, p.user_id, p.ts,
        | c.click_id AS asof_click_id, c.ts AS asof_click_ts
        |FROM p ASOF LEFT JOIN c
        |ON p.user_id = c.user_id AND p.ts >= c.ts
        | AND p.ts - c.ts <= INTERVAL 1 HOUR""".stripMargin)
      .run(asofInputs(s, dir))

  /** The compiled ASOF spec lowered onto the CONTINUOUS operator
    * (StreamingAnalytics.streamAsOfJoin): the spec names the key, the
    * two timestamps, the left id and the right value the harness
    * feeds — so the SQL surface, not a hand-wired copy of it, is what
    * the stream gate runs. The continuous lowering supports ONE bigint
    * key and ONE bigint right value (the streaming operator's state
    * row); wider shapes run the batch lowering. */
  def incrementalSqlAsOfStream(s: SparkSession, dir: String,
      sqlText: String = asofSql,
      sinkName: String = "incremental_sql_asof_stream"): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingAnalytics.{streamAsOfJoin, AsOfIn}
    val c = SqlCompiler.compileAsOf(s, sqlText)
    require(c.keyPairs.size == 1 && c.leftOuter,
      "the continuous as-of lowering takes ASOF LEFT JOIN with one key")
    val (lKey, rKey) = c.keyPairs.head
    val lId = c.items.collectFirst {
      case (false, src, _) if src != lKey && src != c.leftTs => src
    }.getOrElse(sys.error("no left id column in the select list"))
    val rVal = c.items.collectFirst {
      case (true, src, _) if src != rKey && src != c.rightTs => src
    }.getOrElse(sys.error("no right value column in the select list"))
    val rels = asofInputs(s, dir)
    val ss = replaySession(s)
    implicit val sq: org.apache.spark.sql.SQLContext = ss.sqlContext
    import s.implicits._
    val feed = rels(c.leftRel)
        .select(col(lKey).cast("long"), col(c.leftTs),
          lit(false).as("isRight"), col(lId).cast("long"))
        .unionAll(rels(c.rightRel)
          .select(col(rKey).cast("long"), col(c.rightTs),
            lit(true).as("isRight"), col(rVal).cast("long")))
        .as[(Long, java.sql.Timestamp, Boolean, Long)]
    val collected = boundedReplayCollect(sinkName, feed)
    val ev = collected.map(r => AsOfIn(r._1, r._2, r._3, r._4))
      .sortBy(e => (e.ts.getTime, e.id))
    val src = MemoryStream[AsOfIn]
    val out = streamAsOfJoin(src.toDS(), delay = "1 second",
      toleranceMicros = c.toleranceMicros)
    val query = out.writeStream
      .format("memory").queryName(sinkName + "_sink")
      .outputMode("append").start()
    try {
      val (first, second) = ev.splitAt(ev.length / 2)
      src.addData(first)
      query.processAllAvailable()
      src.addData(second)
      query.processAllAvailable()
      // sentinel: unused key far past every event, flushes the tail
      src.addData(AsOfIn(-1L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"),
        isRight = false, id = -1L))
      query.processAllAvailable()
    } finally query.stop()
    ss.table(sinkName + "_sink")
      .filter(col("key") >= 0)
      .select(c.items.map {
        case (false, src, out0) if src == lKey => col("key").as(out0)
        case (false, src, out0) if src == c.leftTs => col("left_ts").as(out0)
        case (false, _, out0) => col("left_id").as(out0)
        // right key == left key ONLY on matched rows — the null
        // extension must surface NULL for right columns (same match
        // witness as the batch lowering's gated substitution)
        case (true, src, out0) if src == rKey =>
          when(col("asof_ts").isNotNull, col("key")).as(out0)
        case (true, src, out0) if src == c.rightTs => col("asof_ts").as(out0)
        case (true, _, out0) => col("asof_id").as(out0)
      }: _*)
  }

  /** A maintained view OVER A VERSIONED TABLE: the `orders` relation
    * resolves through a version-pinned SHALLOW BRANCH of the snapshot
    * log (SqlCompiler.compileOver) — the lakehouse read path and the
    * incremental engine composed. The branch is created fresh per run
    * (replay-idempotent branchAt; its pin keeps source vacuums from
    * reclaiming the pinned version underneath the view). */
  private def compileOverBranch(s: SparkSession, dir: String): SqlCompiler.Compiled = {
    import graft.sources.SnapshotLog
    val root = SnapshotLog.ordersTableRoot(s, dir)
    // ONE deterministic branch path per source root: branchAt is
    // replay-idempotent, so every run reuses the same pin instead of
    // minting a fresh temp-dir pin per run (unreleased pins would
    // accumulate in the root's _branches registry and permanently
    // block vacuum of the pinned version)
    val branch = root + "_sqlbranch/b"
    SnapshotLog.branchAt(root, 1, branch)
    SqlCompiler.compileOver(s, dir,
      """SELECT n_name, COUNT(*) AS n_orders,
        | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_e2
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |GROUP BY n_name""".stripMargin,
      overrides = Map("orders" ->
        ((ss, _) => SnapshotLog.readVersion(ss, branch, 0).drop("b"))))
  }

  def incrementalSqlOverBranch(s: SparkSession, dir: String): DataFrame =
    compileOverBranch(s, dir)
      .run(s, dir, deletes = Map("customer" -> (col("c_custkey") % 13 === 0)))

  /** The branch-sourced view through the CONTINUOUS engine: the
    * override's changelog (the branch head read per relation) replays
    * as micro-batches — the lakehouse read path feeding the stream. */
  def incrementalSqlOverBranchStream(s: SparkSession, dir: String): DataFrame =
    runSqlStreamed(s, compileOverBranch(s, dir), dir,
      Map("customer" -> (col("c_custkey") % 13 === 0)),
      "incremental_sql_over_branch_stream_leaf")

  /** The continuous form: both branch trees AND the set stages in one
    * streaming query — right-side deletes must flip tuples INTO an
    * EXCEPT result (and out of an INTERSECT) through held state. */
  private def runSetOpStreamed(s: SparkSession, dir: String, opSql: String,
                               sinkName: String, tws: Boolean = false): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ss = replaySession(s)
    if (tws) // transformWithState's documented store requirement
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sq: org.apache.spark.sql.SQLContext = ss.sqlContext
    import s.implicits._
    val c = SqlCompiler.compileSetOp(s, dir, opSql)
    def side(cc: SqlCompiler.Compiled, tag: String)
        : (Map[String, Seq[Evt]], Map[String, MemoryStream[Evt]]) = {
      val logs = cc.sourceChangelogs(s, dir, setOpDeletes, filtered = false)
        .view.map { case (rel, ds) =>
          rel -> boundedReplayCollect(s"$sinkName($tag.$rel)", ds).toSeq }.toMap
      (logs, logs.map { case (rel, _) => rel -> MemoryStream[Evt] })
    }
    val (lLogs, lStreams) = side(c.left, "l")
    val (rLogs, rStreams) = side(c.right, "r")
    val leaf = c.runStream(lStreams.view.mapValues(_.toDS()).toMap,
      rStreams.view.mapValues(_.toDS()).toMap, tws = tws)
    val query = leaf.writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start()
    try {
      val seqs = (lLogs.values.flatten ++ rLogs.values.flatten)
        .map(_.seq).toSeq.distinct.sorted
      seqs.foreach { seq =>
        lStreams.foreach { case (rel, ms) =>
          val evs = lLogs(rel).filter(_.seq == seq)
          if (evs.nonEmpty) ms.addData(evs)
        }
        rStreams.foreach { case (rel, ms) =>
          val evs = rLogs(rel).filter(_.seq == seq)
          if (evs.nonEmpty) ms.addData(evs)
        }
        query.processAllAvailable()
      }
    } finally query.stop()
    c.present(ss.table(sinkName).as[Evt])
  }

  def incrementalSqlIntersectStream(s: SparkSession, dir: String): DataFrame =
    runSetOpStreamed(s, dir, setOpLhs + "\nINTERSECT\n" + setOpRhs,
      "incremental_sql_intersect_leaf")

  def incrementalSqlExceptStream(s: SparkSession, dir: String): DataFrame =
    runSetOpStreamed(s, dir, setOpLhs + "\nEXCEPT\n" + setOpRhs,
      "incremental_sql_except_leaf")

  /** The set-op wiring on the TRANSFORMWITHSTATE drivers — same oracle
    * as the batch/flatMap forms: three state implementations, one
    * truth, now for cross-branch netting too. */
  def incrementalSqlIntersectTws(s: SparkSession, dir: String): DataFrame =
    runSetOpStreamed(s, dir, setOpLhs + "\nINTERSECT\n" + setOpRhs,
      "incremental_sql_intersect_tws_leaf", tws = true)

  def incrementalSqlUnionStream(s: SparkSession, dir: String): DataFrame =
    SqlCompiler.compileUnionAll(s, dir, unionSql).zipWithIndex
      .map { case (c, i) =>
        runSqlStreamed(s, c, dir, unionDeletes, s"incremental_sql_union_leaf_$i")
      }.reduce(_ unionAll _)

  /** Conf-wired SKEW SALTING through the compiler (the bloom
    * pattern, [[SaltRelationConf]]): the session conf names lineitem
    * as the skewed relation and the compiler widens its liveness
    * stage to 8 salted sub-keys. Same SQL text and survivors oracle
    * as incremental_sql_q10 — the de-skew must be answer-invariant
    * through the compiled path, not just the tree API
    * (incremental_q10_salted). Child session, caller's conf never
    * mutated. */
  def incrementalSqlQ10Salted(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set(SaltRelationConf, "lineitem")
    ss.conf.set(SaltWidthConf, "8")
    SqlCompiler.compile(ss, dir,
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM nation, customer, orders, lineitem
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)
      .run(ss, dir, Map(
        "lineitem" -> (col("l_linenumber") === 3),
        "orders" -> (col("o_orderkey") % 50 === 0)))
  }

  /** VIEW MODE through the CONTINUOUS engine: the compiled
    * non-aggregate SELECT replays over raw event streams and the bag
    * view (net-count explode) folds the streamed leaf — same oracle
    * as incremental_sql_join_view. */
  def incrementalSqlViewStream(s: SparkSession, dir: String): DataFrame =
    runSqlStreamed(s, SqlCompiler.compile(s, dir,
        """SELECT n_name, o_orderpriority
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          | AND o_orderstatus = 'F'""".stripMargin),
      dir, Map(
        "orders" -> (col("o_orderkey") % 10 === 0),
        "customer" -> (col("c_custkey") % 13 === 0)),
      "incremental_sql_view_stream_leaf")

  /** Compiled query → RAW (unfiltered) event streams — runStream's
    * eventFilter applies the compiled predicates per stream — →
    * micro-batch replay (one batch per changelog seq, state across
    * batches) → the compiled fold. Shared by the SQL-stream gated
    * entries. */
  private def runSqlStreamed(s: SparkSession, c: SqlCompiler.Compiled, dir: String,
      deletes: Map[String, org.apache.spark.sql.Column], sinkName: String,
      tws: Boolean = false,
      transformLogs: Map[String, Dataset[Evt]] => Map[String, Dataset[Evt]] = identity)
      : DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ss = replaySession(s)
    if (tws) // transformWithState's documented store requirement
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sq: org.apache.spark.sql.SQLContext = ss.sqlContext
    import s.implicits._
    val logs = transformLogs(c.sourceChangelogs(s, dir, deletes, filtered = false))
      .view
      .map { case (rel, ds) =>
        rel -> boundedReplayCollect(s"$sinkName($rel)", ds).toSeq }
      .toMap
    val streams = logs.map { case (rel, _) => rel -> MemoryStream[Evt] }
    val leaf = c.runStream(streams.map { case (r, ms) => r -> ms.toDS() }, tws = tws)
    val query = leaf.writeStream
      .format("memory").queryName(sinkName)
      .outputMode("append").start()
    try {
      logs.values.flatten.map(_.seq).toSeq.distinct.sorted.foreach { seq =>
        streams.foreach { case (rel, ms) =>
          val evs = logs(rel).filter(_.seq == seq)
          if (evs.nonEmpty) ms.addData(evs)
        }
        query.processAllAvailable()
      }
    } finally query.stop()
    c.aggregate(ss.table(sinkName).toDF())
  }

  /** WITH (CTE) query through the CONTINUOUS engine: every CTE's
    * maintained view replays as its own streaming query
    * ([[runSqlStreamed]]), the refreshed outputs re-home into one
    * session under the CTE names (group-cardinality rows, bounded by
    * the same replay guard as the inputs), and the outer query
    * evaluates over them exactly as [[SqlCompiler.CompiledCte.run]]
    * does. Production form: each view is a foreachBatch upsert into a
    * table the outer query reads — the collect here is the fixture
    * harness's stand-in for that sink. */
  private def runCteStreamed(s: SparkSession, sqlText: String, dir: String,
      deletes: Map[String, org.apache.spark.sql.Column], sinkPrefix: String,
      tws: Boolean = false): DataFrame = {
    val cc = SqlCompiler.compileCte(s, dir, sqlText)
    val ss = replaySession(s)
    cc.ctes.foreach { case (name, branches) =>
      // each branch (one for a plain body, one per UNION ALL arm)
      // replays as its own streaming query; the collected final states
      // concatenate under the CTE's name
      val views = branches.zipWithIndex.map { case (c, i) =>
        val d = deletes.filter { case (rel, _) => c.path.contains(rel) }
        val suffix = if (branches.size == 1) "" else s"_b$i"
        runSqlStreamed(s, c, dir, d, s"${sinkPrefix}_$name$suffix", tws = tws)
      }
      val rows = views.flatMap(v => boundedReplayCollect(s"$sinkPrefix($name)", v))
      cc.applyAliases(name,
          ss.createDataFrame(ss.sparkContext.parallelize(rows), views.head.schema))
        .createOrReplaceTempView(name)
    }
    // set-semantics UNION CTEs: branch trees + netting node in one
    // streaming query each, final state registered under the CTE name
    cc.setCtes.foreach { case (name, c) =>
      val d = deletes.filter { case (rel, _) =>
        c.branches.exists(_.path.contains(rel)) }
      val v = streamUnionDistinct(s, c, dir, d, s"${sinkPrefix}_$name", tws = tws)
      val rows = boundedReplayCollect(s"$sinkPrefix($name)", v)
      cc.applyAliases(name,
          ss.createDataFrame(ss.sparkContext.parallelize(rows), v.schema))
        .createOrReplaceTempView(name)
    }
    cc.outerBaseRels.foreach { rel =>
      val base = Tables.load(ss, dir, rel)
      deletes.get(rel).map(cond => base.filter(!cond)).getOrElse(base)
        .createOrReplaceTempView(rel)
    }
    // presentation CTEs evaluate over the final maintained states, in
    // definition order (view output in, view output out — stock SQL)
    cc.presentation.foreach { case (name, body) =>
      cc.applyAliases(name, ss.sql(body)).createOrReplaceTempView(name)
    }
    ss.sql(cc.outerSql)
  }

  /** [[Evt]] changelog from a [[CdcParser.parseRelation]] frame:
    * tag/seq derive from the parsed `action` (Insert → +1 @ seq 0,
    * Delete → −1 @ seq 1), `where` is the node predicate on the
    * parsed typed columns. */
  private def cdcChangelog(parsed: DataFrame, keyCol: String, cols: Seq[String],
                           where: Option[org.apache.spark.sql.Column]): Dataset[Evt] =
    signedChangelog(parsed, when(col("action") === "Insert", 1).otherwise(-1),
      keyCol, cols, where)

  /** Typed rows + a ±1 sign expression → the engine's [[Evt]]
    * changelog (inserts replay at seq 0, deletes at seq 1, the same
    * two-batch convention as every parquet-backed changelog). */
  private def signedChangelog(parsed: DataFrame, sign: org.apache.spark.sql.Column,
                              keyCol: String, cols: Seq[String],
                              where: Option[org.apache.spark.sql.Column]): Dataset[Evt] = {
    val df = where.map(parsed.filter).getOrElse(parsed)
    val spark = df.sparkSession
    import spark.implicits._
    val rowCanon = concat_ws(FS.toString,
      cols.sorted.map(c =>
        concat(lit(c + KV.toString), coalesce(col(c).cast("string"), lit("null")))): _*)
    df.select(
      when(sign > 0, 0L).otherwise(1L).as("seq"),
      lit(false).as("fromParent"),
      sign.cast("int").as("tag"),
      lit(1).as("mult"),
      col(keyCol).cast("string").as("key"),
      rowCanon.as("row")).as[Evt]
  }

  def incrementalQ10FromCdc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType => Dbl, LongType => Lng,
      StringType => Str, TimestampType => Tst}
    val nationCols = Seq("n_nationkey", "n_name")
    val custCols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val ordCols = Seq("o_orderkey", "o_custkey", "o_orderdate")
    val liCols = Seq("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_returnflag")
    def render(df: DataFrame, code: String, cols: Seq[String],
               deleteWhen: Option[org.apache.spark.sql.Column]): DataFrame = {
      val ins = CdcParser.toCdcLines(df, add = true, code, cols)
      deleteWhen.map(cond =>
        ins.unionAll(CdcParser.toCdcLines(df.filter(cond), add = false, code, cols)))
        .getOrElse(ins)
    }
    // ONE interleaved line stream, like the reference's single source —
    // MATERIALIZED TO A TEMP TEXT FILE and read back, so this query
    // exercises the reference's true input shape (spark.read.text) and
    // all four demux branches scan the file through the page cache.
    // Without sharing, each branch re-renders every table (16 parquet
    // scans + 4 full line passes — measured 5.4 s vs 2.6 s at sf0.1);
    // a .cache() would do too, but it pins executor storage memory for
    // the rest of the session with no unpersist point.
    val rendered =
      render(Tables.nation(s, dir), "NATI", nationCols, None)
        .unionAll(render(Tables.customer(s, dir), "CUST", custCols, None))
        .unionAll(render(Tables.orders(s, dir), "ORDE", ordCols,
          Some(col("o_orderkey") % 50 === 0)))
        .unionAll(render(Tables.lineitem(s, dir), "LINE", liCols,
          Some(col("l_linenumber") === 3)))
    // ONE rendered copy per (JVM, fixture): the render is deterministic,
    // so repeat callers (Bench warm-ups, Profile sweeps, Verify) reuse
    // the first write instead of leaking a fresh temp directory each —
    // and the directory is process-unique (createTempDirectory), so
    // concurrent JVMs on the same fixture never overwrite each other's
    // files mid-scan. A shutdown hook deletes it recursively
    // (deleteOnExit alone only removes empty directories).
    val path = cdcLineDirs.computeIfAbsent(dir, _ => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_lines")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(tmp).iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(p => p.toFile.delete())
      }))
      val p = tmp.resolve("lines").toString
      rendered.write.mode("overwrite").text(p)
      p
    })
    val lines = s.read.text(path)
    def parse(code: String, schema: Seq[(String, org.apache.spark.sql.types.DataType)]) =
      CdcParser.parseRelation(lines, code, schema)
    val logs: Map[String, Dataset[Evt]] = Map(
      "nation" -> cdcChangelog(
        parse("NATI", Seq("n_nationkey" -> Lng, "n_name" -> Str)),
        "n_nationkey", nationCols, None),
      "customer" -> cdcChangelog(
        parse("CUST", Seq("c_custkey" -> Lng, "c_name" -> Str,
          "c_nationkey" -> Lng, "c_acctbal" -> Dbl)),
        "c_nationkey", custCols, None),
      "orders" -> cdcChangelog(
        parse("ORDE", Seq("o_orderkey" -> Lng, "o_custkey" -> Lng, "o_orderdate" -> Tst)),
        "o_custkey", ordCols,
        Some(col("o_orderdate") >= dateLo && col("o_orderdate") < dateHi)),
      "lineitem" -> cdcChangelog(
        parse("LINE", Seq("l_orderkey" -> Lng, "l_linenumber" -> Lng,
          "l_extendedprice" -> Dbl, "l_discount" -> Dbl, "l_returnflag" -> Str)),
        "l_orderkey", liCols,
        Some(col("l_returnflag") === "R")))
    val leaf = runBatch(q10Tree, logs, sourceFiltered = true)
    q10Aggregate(leaf)
  }

  /** The JSON-CDC deployment shape end to end: each relation is its
    * own envelope TOPIC (Debezium's per-table topics — no demux
    * needed, unlike the reference's single interleaved line stream),
    * rendered via [[CdcParser.toJsonEnvelope]], parsed back into
    * signed events by [[CdcParser.parseJsonEnvelope]], node predicates
    * applied to the parsed frames, and the same Q10 tree + aggregate.
    * Deletes arrive as 'd' envelopes carrying the before-image. */
  def incrementalQ10FromJson(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val jsonOpts = Map("timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS")
    def topic(df: DataFrame, cols: Seq[String],
              deleteWhen: Option[org.apache.spark.sql.Column])
        : (DataFrame, StructType) = {
      val rowSchema = StructType(cols.map(df.schema(_)))
      val row = struct(cols.map(col): _*)
      val nullRow = lit(null).cast(rowSchema)
      val creates = df.select(lit("c").as("op"), nullRow.as("before"),
        row.as("after"), lit(0L).as("ts_ms"))
      val all = deleteWhen.map(cond => creates.unionByName(
          df.filter(cond).select(lit("d").as("op"), row.as("before"),
            nullRow.as("after"), lit(1L).as("ts_ms"))))
        .getOrElse(creates)
      (CdcParser.toJsonEnvelope(all, jsonOpts), rowSchema)
    }
    def log(t: (DataFrame, StructType), keyCol: String, cols: Seq[String],
            where: Option[org.apache.spark.sql.Column]): Dataset[Evt] =
      signedChangelog(CdcParser.parseJsonEnvelope(t._1, t._2, jsonOpts),
        col("sign"), keyCol, cols, where)
    val logs: Map[String, Dataset[Evt]] = Map(
      "nation" -> log(topic(Tables.nation(s, dir), Seq("n_nationkey", "n_name"), None),
        "n_nationkey", Seq("n_nationkey", "n_name"), None),
      "customer" -> log(topic(Tables.customer(s, dir),
          Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"), None),
        "c_nationkey", Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"), None),
      "orders" -> log(topic(Tables.orders(s, dir),
          Seq("o_orderkey", "o_custkey", "o_orderdate"),
          Some(col("o_orderkey") % 50 === 0)),
        "o_custkey", Seq("o_orderkey", "o_custkey", "o_orderdate"),
        Some(col("o_orderdate") >= dateLo && col("o_orderdate") < dateHi)),
      "lineitem" -> log(topic(Tables.lineitem(s, dir),
          Seq("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_returnflag"),
          Some(col("l_linenumber") === 3)),
        "l_orderkey",
        Seq("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_returnflag"),
        Some(col("l_returnflag") === "R")))
    q10Aggregate(runBatch(q10Tree, logs, sourceFiltered = true))
  }

  /** The reference's TRUE production input shape end to end, gated:
    * CDC text lines arrive as FILES in a watched directory (the
    * reference's S1 source IS a file stream — DataFlow.java:37
    * readTextFile), `spark.readStream.text` picks them up,
    * [[CdcParser]] demuxes/parses the four relations, the streaming
    * tree runs with node state in the state store CARRIED ACROSS FILE
    * BATCHES, and the leaf deltas are folded by a foreachBatch UPSERT
    * into a maintained result table — the production
    * upsert-into-a-KV-store sink pattern (StreamingSpec additionally
    * covers checkpoint recovery of this shape). Two physical file
    * drops: the insert lines land first (micro-batch 1 builds state),
    * then the delete lines (micro-batch 2 retracts through the held
    * state — parent-death fan-out replays buffered children from the
    * state store, not from the files). Oracle = incremental_q10's
    * survivors SQL, so any file-source / state-carry / upsert-fold
    * divergence fails the hash.
    *
    * The driver-held upsert map is the SINK (one row per surviving
    * group — bounded by group count, the same bound any KV upsert sink
    * carries), not engine state; all join/retraction state lives in
    * the state store. */
  def incrementalQ10FileStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType => Dbl, LongType => Lng,
      StringType => Str, TimestampType => Tst}
    val nationCols = Seq("n_nationkey", "n_name")
    val custCols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val ordCols = Seq("o_orderkey", "o_custkey", "o_orderdate")
    val liCols = Seq("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_returnflag")
    // one interleaved line stream, inserts and deletes rendered
    // separately so they can arrive as two distinct file drops
    val insertLines =
      CdcParser.toCdcLines(Tables.nation(s, dir), add = true, "NATI", nationCols)
        .unionAll(CdcParser.toCdcLines(Tables.customer(s, dir), add = true, "CUST", custCols))
        .unionAll(CdcParser.toCdcLines(Tables.orders(s, dir), add = true, "ORDE", ordCols))
        .unionAll(CdcParser.toCdcLines(Tables.lineitem(s, dir), add = true, "LINE", liCols))
    val deleteLines =
      CdcParser.toCdcLines(Tables.orders(s, dir).filter(col("o_orderkey") % 50 === 0),
          add = false, "ORDE", ordCols)
        .unionAll(CdcParser.toCdcLines(
          Tables.lineitem(s, dir).filter(col("l_linenumber") === 3),
          add = false, "LINE", liCols))
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_filestream")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(p => p.toFile.delete())
    }))
    val watch = tmp.resolve("lines").toString
    insertLines.write.mode("append").text(watch)
    val ss = replaySession(s)
    val lines = ss.readStream.text(watch)
    def parse(code: String, schema: Seq[(String, org.apache.spark.sql.types.DataType)]) =
      CdcParser.parseRelation(lines, code, schema)
    val logs: Map[String, Dataset[Evt]] = Map(
      "nation" -> cdcChangelog(
        parse("NATI", Seq("n_nationkey" -> Lng, "n_name" -> Str)),
        "n_nationkey", nationCols, None),
      "customer" -> cdcChangelog(
        parse("CUST", Seq("c_custkey" -> Lng, "c_name" -> Str,
          "c_nationkey" -> Lng, "c_acctbal" -> Dbl)),
        "c_nationkey", custCols, None),
      "orders" -> cdcChangelog(
        parse("ORDE", Seq("o_orderkey" -> Lng, "o_custkey" -> Lng, "o_orderdate" -> Tst)),
        "o_custkey", ordCols,
        Some(col("o_orderdate") >= dateLo && col("o_orderdate") < dateHi)),
      "lineitem" -> cdcChangelog(
        parse("LINE", Seq("l_orderkey" -> Lng, "l_linenumber" -> Lng,
          "l_extendedprice" -> Dbl, "l_discount" -> Dbl, "l_returnflag" -> Str)),
        "l_orderkey", liCols,
        Some(col("l_returnflag") === "R")))
    val leaf = runStreamTree(chainStages(q10Tree), logs, sourceFiltered = true)
    // foreachBatch upsert: fold each micro-batch's leaf deltas to
    // per-group partials (distributed agg), then merge into the
    // maintained table keyed by the unique group key c_custkey
    val table = new scala.collection.concurrent.TrieMap[
      Long, (String, Double, String, Long, Long)]
    val query = leaf.writeStream
      .foreachBatch { (batch: Dataset[Evt], batchId: Long) =>
        val partial = boundedReplayCollect(s"incremental_q10_filestream(batch $batchId)",
          q10BatchPartial(batch))
        partial.foreach { r =>
          val key = r.getLong(0)
          val (dRev, dCnt) = (r.getLong(4), r.getLong(5))
          val merged = table.get(key) match {
            case Some((nm, ab, nn, rev, cnt)) => (nm, ab, nn, rev + dRev, cnt + dCnt)
            case None => (r.getString(1), r.getDouble(2), r.getString(3), dRev, dCnt)
          }
          if (merged._5 == 0L) table.remove(key) else table.put(key, merged)
        }: Unit
      }
      .outputMode("append").start()
    try {
      query.processAllAvailable()   // micro-batch 1: inserts build state
      deleteLines.write.mode("append").text(watch)
      query.processAllAvailable()   // micro-batch 2: deletes retract it
    } finally query.stop()
    import ss.implicits._
    table.toSeq.map { case (k, (nm, ab, nn, rev, cnt)) => (k, nm, ab, nn, rev, cnt) }
      .toDF("c_custkey", "c_name", "c_acctbal", "n_name", "revenue_e4", "n_rows")
  }

  /** One micro-batch's per-group signed partial of the Q10 fold (no
    * survivor filter — a group at net zero must still reach the upsert
    * to delete its row). */
  private def q10BatchPartial(leaf: Dataset[Evt]): DataFrame = {
    leaf.toDF().select(
        (col("tag") * col("mult")).cast(LongType).as("sign"),
        canonCol("c_custkey").cast(LongType).as("c_custkey"),
        canonCol("c_name").as("c_name"),
        canonCol("c_acctbal").cast(DoubleType).as("c_acctbal"),
        canonCol("n_name").as("n_name"),
        round(canonCol("l_extendedprice").cast(DoubleType) *
          (lit(1.0) - canonCol("l_discount").cast(DoubleType)) * 10000, 0)
          .cast(LongType).as("rev_e4"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(col("sign") * col("rev_e4")).as("revenue_e4"),
        sum(col("sign")).as("n_rows"))
  }

  /** Per-event running-output parity with the reference's A1 (one
    * `Output` row per delta, Q10AggregateProcessFunction.java:75-80):
    * every leaf delta becomes a row carrying the group's running
    * revenue at that point of the replay. The replay order is the
    * deterministic (seq, l_orderkey, l_linenumber) — the engine's
    * emission multiset is order-independent (ghost-tolerant signed
    * folds), so parity over a deterministic order checks every
    * intermediate aggregate value, not just the net.
    *
    * The oracle reconstructs the same delta multiset in SQL: +1 per
    * qualifying join row at seq 0; at seq 1, −1 for every child of a
    * deleted order (parent-death fan-out replays the buffered set) and
    * −1 for deleted lineitems of SURVIVING orders only (own deletes
    * under a dead parent don't emit — the engine suppresses them, and
    * so must the oracle). */
  def incrementalQ10Running(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leaf = runBatch(q10Tree, q10Changelogs(s, dir), sourceFiltered = true).toDF()
    // mult > 1 events (a parent flip replaying n identical buffered
    // children) EXPAND to n unit rows: the reference emits one Output
    // per base row, and the oracle counts per-row — a packed sign=±n
    // row would diverge from it exactly when duplicates exist
    val ev = leaf
      .withColumn("_unit", explode(sequence(lit(1), col("mult"))))
      .select(
        col("seq"),
        col("tag").cast(LongType).as("sign"),
        canonCol("c_custkey").cast(LongType).as("c_custkey"),
        canonCol("l_orderkey").cast(LongType).as("l_orderkey"),
        canonCol("l_linenumber").cast(LongType).as("l_linenumber"),
        round(canonCol("l_extendedprice").cast(DoubleType) *
          (lit(1.0) - canonCol("l_discount").cast(DoubleType)) * 10000, 0)
          .cast(LongType).as("rev_e4"))
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture
    // (no composite-PK guarantee), so sign + rev_e4 join the sort key;
    // fully identical events commute without changing the trajectory
    val w = Window.partitionBy(col("c_custkey"))
      .orderBy(col("seq"), col("l_orderkey"), col("l_linenumber"),
        col("sign"), col("rev_e4"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("c_custkey"), col("seq"), col("l_orderkey"), col("l_linenumber"),
      col("sign"), sum(col("sign") * col("rev_e4")).over(w).as("running_revenue_e4"))
  }

  /** Rendered-CDC-lines directory per fixture dir, for this JVM. */
  private val cdcLineDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val lineitemCdcCols =
    Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")

  // Reachability from nation-1's suppliers over the customer↔supplier
  // co-purchase graph — the recursion statement shared by the batch
  // headliner, its insert-only maintained twin, and (with helpers
  // split out) the CTE-mix entry. DuckDB (VARCHAR) and Spark (STRING)
  // spell the cast differently; the statements are otherwise
  // identical.
  private def recursivePathsSql(cast: String, ordersRel: String = "orders") =
    s"""WITH RECURSIVE r AS (
       | SELECT 's' || CAST(s_suppkey AS $cast) AS node
       | FROM supplier WHERE s_nationkey = 1
       | UNION
       | SELECT e.dst AS node FROM (
       |  SELECT 'c' || CAST(o_custkey AS $cast) AS src,
       |         's' || CAST(l_suppkey AS $cast) AS dst
       |  FROM $ordersRel JOIN lineitem ON l_orderkey = o_orderkey
       |  UNION ALL
       |  SELECT 's' || CAST(l_suppkey AS $cast) AS src,
       |         'c' || CAST(o_custkey AS $cast) AS dst
       |  FROM $ordersRel JOIN lineitem ON l_orderkey = o_orderkey
       | ) e JOIN r ON r.node = e.src
       |)
       |SELECT node FROM r""".stripMargin

  private def recursivePathsBatches = Seq(
    Map("orders" -> (col("o_orderkey") % 3 === 0),
      "lineitem" -> (col("l_orderkey") % 3 === 0)),
    Map("orders" -> (col("o_orderkey") % 3 === 1),
      "lineitem" -> (col("l_orderkey") % 3 === 1)),
    Map("orders" -> (col("o_orderkey") % 3 === 2),
      "lineitem" -> (col("l_orderkey") % 3 === 2)))

  val defs: Seq[GraftQuery] = Seq(

    // WITH RECURSIVE — linear recursion compiled onto the checkpointed
    // fixpoint loop (RecursiveSql): reachability from nation-1's
    // suppliers over the customer↔supplier co-purchase graph, standard
    // working-table semantics (UNION dedups against the accumulator,
    // so the cyclic bipartite graph terminates — the BFS shape: one
    // frontier ⋈ edges equi-join + one distinct per round, lineage
    // truncated per round). Oracle: DuckDB runs the statement's
    // NATIVE recursive CTE — two engines, two recursion runtimes, one
    // fixpoint.
    // The Spark-side spelling lifts the edge set into a HELPER CTE,
    // which RecursiveSql MATERIALIZES once (the helper is
    // loop-invariant — base tables don't change within a run) instead
    // of recomputing the orders⋈lineitem join twice per BFS round.
    // Same fixpoint, same oracle statement for DuckDB (which plans the
    // inline form its own way).
    sql("incremental_sql_recursive_paths", recursivePathsSql("VARCHAR")) {
      // The two-branch UNION ALL helper is kept ON PURPOSE: a
      // one-join inline(array(struct…)) spelling was tried this round
      // and measured +0.24 s at sf0.1 — ReuseExchange already dedups
      // the two branches' exchanges, both branch joins run in the same
      // parallel job, and the Generate breaks the flat codegen'd
      // projection feeding the helper's one-time checkpoint.
      (s, d) => RecursiveSql.run(s, d,
        """WITH RECURSIVE r AS (
          | SELECT 's' || CAST(s_suppkey AS STRING) AS node
          | FROM supplier WHERE s_nationkey = 1
          | UNION
          | SELECT e.dst AS node FROM edges e JOIN r ON r.node = e.src
          |), edges AS (
          | SELECT 'c' || CAST(o_custkey AS STRING) AS src,
          |        's' || CAST(l_suppkey AS STRING) AS dst
          | FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          | UNION ALL
          | SELECT 's' || CAST(l_suppkey AS STRING) AS src,
          |        'c' || CAST(o_custkey AS STRING) AS dst
          | FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          |)
          |SELECT node FROM r""".stripMargin)
    },

    // … MAINTAINED under an insert-only base changelog: orders and
    // lineitem arrive in three batches; each batch seeds a semi-naive
    // frontier from the accumulated closure (per-changed-relation
    // delta binding — the statement is branch-linear, each relation
    // occurs once per join scope within a UNION branch) and continues
    // the SAME checkpointed loop, so per-batch cost is proportional to
    // the new derivations. The final closure must equal DuckDB's
    // from-scratch native recursive CTE over the full tables — the
    // exact twin contract. Deletes stay fenced (re-derivation/DRed).
    sql("incremental_sql_recursive_paths_stream", recursivePathsSql("VARCHAR")) {
      (s, d) => RecursiveSql.runIncremental(s, d, recursivePathsSql("STRING"),
        batches = recursivePathsBatches, deltaLinear = true)
    },

    // … RESUMED ACROSS A SESSION RESTART: batches 0-1 run in one
    // session, the closure persists to a snapshot table (keyed by a
    // node hash), and a FRESH session reopens it from the log and
    // processes batch 2 via the resume hook (initialClosure +
    // startBatch) — per-batch semi-naive work continues exactly where
    // the dead JVM stopped, never a from-scratch re-run. Same oracle
    // as the uninterrupted twin: the restart must be invisible.
    sql("incremental_sql_recursive_paths_resume",
      recursivePathsSql("VARCHAR")) {
      (s, d) =>
        import graft.sources.SnapshotLog
        val partial = RecursiveSql.runIncremental(s, d,
          recursivePathsSql("STRING"),
          batches = recursivePathsBatches.take(2), deltaLinear = true)
        val s2 = s.newSession()
        // an EMPTY partial closure (the tiny fixture has no nation-1
        // suppliers) has nothing to persist — an empty partitioned
        // parquet write carries no schema to reopen; resume with the
        // empty frame directly (the seeding handles it: no accumulator
        // leg, batch 2 re-derives from its own anchor deltas)
        val c0 =
          if (partial.isEmpty) partial
          else {
            val root = java.nio.file.Files
              .createTempDirectory("graft_rec_resume").toString
            SnapshotLog.commitInitial(
              partial.select(xxhash64(col("node")).as("k"), col("node")),
              root, "k")
            SnapshotLog.readVersion(s2, root, 0).select("node")
          }
        RecursiveSql.runIncremental(s2, d, recursivePathsSql("STRING"),
          batches = recursivePathsBatches, deltaLinear = true,
          initialClosure = Some(c0), startBatch = 2)
    },

    // … and under a MIXED changelog (DRed-lite): batch 2 DELETES every
    // %10==0 order inserted so far before adding its own slice — the
    // over-delete pass marks derivations through the deleted edges
    // (per-relation delta binding, propagation bounded by the affected
    // component), survivors replace the accumulator, and one support
    // probe + the frontier loop re-derive every node still reachable.
    // Oracle: DuckDB's native recursion over the FINAL table state.
    sql("incremental_sql_recursive_paths_dred",
      recursivePathsSql("VARCHAR",
        "(SELECT * FROM orders WHERE o_orderkey % 10 <> 0) odel")) {
      (s, d) => RecursiveSql.runIncremental(s, d, recursivePathsSql("STRING"),
        batches = recursivePathsBatches,
        deletesAt = Map(2 -> Map("orders" -> (col("o_orderkey") % 10 === 0))),
        deltaLinear = true)
    },

    // … RESUME × DRed — the two maintenance disciplines COMPOSED:
    // batches 0-1 build the closure in one session and persist it;
    // a FRESH session reopens the closure from the log and processes
    // batch 2's MIXED changelog — the over-delete mark pass, the
    // survivor reset, the support-probe re-derive, and the insert
    // frontier all run against the REOPENED accumulator plus the
    // respecified delta bindings (state filters are pure expressions,
    // so the resumed run reconstructs every pre/post-delete base state
    // without re-running prior batches). An operational maintained
    // recursion needs exactly this: a restarted ingester that can
    // still retract. Oracle: DuckDB's native recursion over the FINAL
    // table state — identical to the uninterrupted DRed twin's.
    sql("incremental_sql_recursive_paths_dred_resume",
      recursivePathsSql("VARCHAR",
        "(SELECT * FROM orders WHERE o_orderkey % 10 <> 0) odel")) {
      (s, d) =>
        import graft.sources.SnapshotLog
        val partial = RecursiveSql.runIncremental(s, d,
          recursivePathsSql("STRING"),
          batches = recursivePathsBatches.take(2), deltaLinear = true)
        val s2 = s.newSession()
        // empty-partial guard as in the insert-only resume twin: an
        // empty partitioned parquet write has no schema to reopen
        val c0 =
          if (partial.isEmpty) partial
          else {
            val root = java.nio.file.Files
              .createTempDirectory("graft_rec_dred_resume").toString
            SnapshotLog.commitInitial(
              partial.select(xxhash64(col("node")).as("k"), col("node")),
              root, "k")
            SnapshotLog.readVersion(s2, root, 0).select("node")
          }
        RecursiveSql.runIncremental(s2, d, recursivePathsSql("STRING"),
          batches = recursivePathsBatches,
          deletesAt = Map(2 -> Map("orders" -> (col("o_orderkey") % 10 === 0))),
          deltaLinear = true, initialClosure = Some(c0), startBatch = 2)
    },

    // WITH RECURSIVE alongside HELPER CTEs: `edges` (no r reference)
    // binds before the loop and the recursive term reads it; `reached`
    // reads r, so it binds after the fixpoint for the outer query.
    // DuckDB runs the same mixed WITH natively.
    sql("incremental_sql_recursive_cte_mix",
      """WITH RECURSIVE r AS (
        | SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node
        | FROM supplier WHERE s_nationkey = 1
        | UNION
        | SELECT e.dst AS node FROM edges e JOIN r ON r.node = e.src
        |), edges AS (
        | SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
        |        's' || CAST(l_suppkey AS VARCHAR) AS dst
        | FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        | UNION ALL
        | SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
        |        'c' || CAST(o_custkey AS VARCHAR) AS dst
        | FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |), reached AS (
        | SELECT substr(node, 1, 1) AS kind, COUNT(*) AS n FROM r GROUP BY 1
        |)
        |SELECT kind, n FROM reached""".stripMargin) {
      (s, d) => RecursiveSql.run(s, d,
        """WITH RECURSIVE r AS (
          | SELECT 's' || CAST(s_suppkey AS STRING) AS node
          | FROM supplier WHERE s_nationkey = 1
          | UNION
          | SELECT e.dst AS node FROM edges e JOIN r ON r.node = e.src
          |), edges AS (
          | SELECT 'c' || CAST(o_custkey AS STRING) AS src,
          |        's' || CAST(l_suppkey AS STRING) AS dst
          | FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          | UNION ALL
          | SELECT 's' || CAST(l_suppkey AS STRING) AS src,
          |        'c' || CAST(o_custkey AS STRING) AS dst
          | FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          |), reached AS (
          | SELECT substr(node, 1, 1) AS kind, COUNT(*) AS n FROM r GROUP BY 1
          |)
          |SELECT kind, n FROM reached""".stripMargin)
    },

    // … the CTE-mix MAINTAINED under the same insert-only changelog as
    // the recursive_paths twin: the pre-fixpoint `edges` helper view is
    // RE-CREATED per state binding (a temp view captures its plan at
    // creation — without the re-bind the batch-0 base would freeze),
    // delta bindings of orders/lineitem flow THROUGH it (the term reads
    // them only via edges — the transitive read set drives the
    // per-relation delta seeds), and the post-fixpoint `reached` helper
    // binds after the final closure for the outer query. Oracle:
    // DuckDB's native mixed WITH over the full tables.
    sql("incremental_sql_recursive_cte_mix_stream",
      """WITH RECURSIVE r AS (
        | SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node
        | FROM supplier WHERE s_nationkey = 1
        | UNION
        | SELECT e.dst AS node FROM edges e JOIN r ON r.node = e.src
        |), edges AS (
        | SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
        |        's' || CAST(l_suppkey AS VARCHAR) AS dst
        | FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        | UNION ALL
        | SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
        |        'c' || CAST(o_custkey AS VARCHAR) AS dst
        | FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |), reached AS (
        | SELECT substr(node, 1, 1) AS kind, COUNT(*) AS n FROM r GROUP BY 1
        |)
        |SELECT kind, n FROM reached""".stripMargin) {
      (s, d) => RecursiveSql.runIncremental(s, d,
        """WITH RECURSIVE r AS (
          | SELECT 's' || CAST(s_suppkey AS STRING) AS node
          | FROM supplier WHERE s_nationkey = 1
          | UNION
          | SELECT e.dst AS node FROM edges e JOIN r ON r.node = e.src
          |), edges AS (
          | SELECT 'c' || CAST(o_custkey AS STRING) AS src,
          |        's' || CAST(l_suppkey AS STRING) AS dst
          | FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          | UNION ALL
          | SELECT 's' || CAST(l_suppkey AS STRING) AS src,
          |        'c' || CAST(o_custkey AS STRING) AS dst
          | FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          |), reached AS (
          | SELECT substr(node, 1, 1) AS kind, COUNT(*) AS n FROM r GROUP BY 1
          |)
          |SELECT kind, n FROM reached""".stripMargin,
        batches = recursivePathsBatches, deltaLinear = true)
    },

    sql("cdc_roundtrip_lineitem",
      """SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'Insert' ELSE 'Delete' END AS action,
        | l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        | l_quantity, l_extendedprice, l_returnflag, l_shipdate
        |FROM lineitem""".stripMargin) {
      (s, d) =>
        val li = Tables.lineitem(s, d)
        val lines = CdcParser.toCdcLines(li.filter(col("l_orderkey") % 2 === 0),
            add = true, "LINE", lineitemCdcCols)
          .unionAll(CdcParser.toCdcLines(li.filter(col("l_orderkey") % 2 =!= 0),
            add = false, "LINE", lineitemCdcCols))
        CdcParser.parseRelation(lines, "LINE", Seq(
            "l_orderkey" -> LongType, "l_linenumber" -> LongType,
            "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
            "l_returnflag" -> StringType, "l_shipdate" -> TimestampType))
          .select("action", "l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_returnflag", "l_shipdate")
    },

    // CSV source round trip — the remaining text format next to the
    // reference's pipe-CDC: rows render through to_csv (longs,
    // strings, a double, and a TIMESTAMP, whose default format must
    // parse back losslessly) and return via from_csv with the original
    // schema; the oracle reads the same columns straight from parquet,
    // so any quoting/escape/type-format asymmetry between the writer
    // and parser fails the value hash. Both directions are codegen'd
    // row-local expressions — scan-shaped, no shuffle.
    sql("csv_roundtrip_orders",
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders""".stripMargin) {
      (s, d) =>
        val o = Tables.orders(s, d)
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
        val schema = org.apache.spark.sql.types.StructType(cols.map(c => o.schema(c)))
        o.select(to_csv(struct(cols.map(col): _*)).as("line"))
          .select(from_csv(col("line"), schema, Map.empty[String, String]).as("r"))
          .select(cols.map(c => col(s"r.$c")): _*)
    },

    // JSON CDC envelope round trip — the Debezium-style wire format
    // next to the pipe-CDC and CSV formats: creates/updates/deletes
    // render through toJsonEnvelope (update = before AND after image)
    // and parse back via parseJsonEnvelope into SIGNED row events (u →
    // retraction + assertion), the delta engine's changelog shape. The
    // oracle reconstructs the same event multiset in SQL, so any
    // op-demux, image-selection, sign, or timestamp-format asymmetry
    // fails the hash. timestampFormat is pinned to microseconds on
    // both directions (the JSON default truncates to millis).
    sql("cdc_json_roundtrip_orders",
      """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate FROM orders)
        |SELECT 'c' AS op, o_orderkey * 1000 AS ts_ms, 1 AS sign, o_orderkey, o_custkey,
        |  o_orderstatus, o_totalprice, o_orderdate
        | FROM base WHERE o_orderkey % 3 = 0
        |UNION ALL SELECT 'u', o_orderkey * 1000, -1, o_orderkey, o_custkey,
        |  o_orderstatus, o_totalprice, o_orderdate
        | FROM base WHERE o_orderkey % 3 = 1
        |UNION ALL SELECT 'u', o_orderkey * 1000, 1, o_orderkey, o_custkey,
        |  o_orderstatus, o_totalprice + 1.5, o_orderdate
        | FROM base WHERE o_orderkey % 3 = 1
        |UNION ALL SELECT 'd', o_orderkey * 1000, -1, o_orderkey, o_custkey,
        |  o_orderstatus, o_totalprice, o_orderdate
        | FROM base WHERE o_orderkey % 3 = 2""".stripMargin) {
      (s, d) =>
        val o = Tables.orders(s, d)
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        val rowSchema = org.apache.spark.sql.types.StructType(cols.map(o.schema(_)))
        val row = struct(cols.map(col): _*)
        val nullRow = lit(null).cast(rowSchema)
        val tsMs = (col("o_orderkey") * 1000).as("ts_ms")
        val jsonOpts = Map("timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS")
        val creates = o.filter(col("o_orderkey") % 3 === 0)
          .select(lit("c").as("op"), nullRow.as("before"), row.as("after"), tsMs)
        val updates = o.filter(col("o_orderkey") % 3 === 1)
          .select(lit("u").as("op"), row.as("before"),
            struct(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              (col("o_totalprice") + 1.5).as("o_totalprice"), col("o_orderdate")).as("after"),
            tsMs)
        val dels = o.filter(col("o_orderkey") % 3 === 2)
          .select(lit("d").as("op"), row.as("before"), nullRow.as("after"), tsMs)
        val lines = CdcParser.toJsonEnvelope(
          creates.unionByName(updates).unionByName(dels), jsonOpts)
        CdcParser.parseJsonEnvelope(lines, rowSchema, jsonOpts)
    },

    sql("incremental_q10",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalQ10),

    // The SAME maintained tree folded into (nation, order month)
    // buckets — see [[incrementalMonthlyRevenue]]: derived time-bucket
    // group keys are a fold-side expression over carried columns, no
    // new engine state.
    sql("incremental_monthly_revenue",
      s"""SELECT n_name, substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS order_month,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY n_name, order_month""".stripMargin)(incrementalMonthlyRevenue),

    sql("incremental_monthly_revenue_stream",
      s"""SELECT n_name, substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS order_month,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY n_name, order_month""".stripMargin)(incrementalMonthlyRevenueStream),

    // TOP-K over the MAINTAINED view — the presentation clause the
    // reference never implemented (SURVEY §2: sorts/limits ABSENT,
    // "even Q10's ORDER BY revenue DESC LIMIT 20"). The engine
    // maintains the grouped aggregate incrementally; the top-20 is a
    // per-refresh TakeOrdered over the (bounded, one-row-per-group)
    // view — O(groups) work per refresh, never a re-join. The LIMIT
    // boundary is deterministic: ties order by the unique group key
    // c_custkey in both engines, so the SELECTED SET is hash-stable,
    // not just the values.
    sql("incremental_q10_topk",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name, revenue_e4, n_rows FROM (
         | SELECT c_custkey, c_name, c_acctbal, n_name,
         |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         |  COUNT(*) AS n_rows
         | FROM customer, orders, lineitem, nation
         | WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND c_nationkey = n_nationkey
         |  AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         |  AND l_returnflag = 'R'
         |  AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         | GROUP BY c_custkey, c_name, c_acctbal, n_name) v
         |ORDER BY revenue_e4 DESC, c_custkey LIMIT 20""".stripMargin) {
      (s, dir) => incrementalQ10(s, dir)
        .orderBy(col("revenue_e4").desc, col("c_custkey"))
        .limit(20)
    },

    // Same query, same oracle, deltas on both sides (order deaths %50,
    // lineitem retractions linenumber 3) — but with the bloom
    // semi-join reduction ([[bloomPrefilterChild]]) pre-filtering the
    // lineitem changelog against the date-windowed orders key set, so
    // a reduction bug (over-dropping a probe event that WOULD have
    // joined alive at some replay point) fails the hash against the
    // unreduced truth.
    sql("incremental_q10_bloom",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalQ10Bloom),

    sql("incremental_order_revenue",
      """SELECT n_name,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS totalprice_e2,
        | COUNT(*) AS n_rows
        |FROM region, nation, customer, orders
        |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        | AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0
        |GROUP BY n_name""".stripMargin)(incrementalOrderRevenue),

    // Incremental semi-join: EXISTS compiled as set-semantics key node
    // → liveness gate (see existsStages). The oracle is the literal
    // correlated EXISTS over the changelogs' surviving rows.
    sql("incremental_exists_semi",
      """SELECT c_nationkey, COUNT(*) AS n_cust,
        | CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS acctbal_e2
        |FROM customer
        |WHERE c_custkey % 30 <> 0
        | AND EXISTS (SELECT 1 FROM orders
        |             WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
        |               AND o_orderkey % 40 <> 0)
        |GROUP BY c_nationkey""".stripMargin)(incrementalExistsSemi),

    // Incremental anti-join: NOT EXISTS via the inverted-liveness
    // (antiParent) node over the SAME wiring and delete schedule.
    sql("incremental_not_exists_anti",
      """SELECT c_nationkey, COUNT(*) AS n_cust,
        | CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS acctbal_e2
        |FROM customer
        |WHERE c_custkey % 30 <> 0
        | AND NOT EXISTS (SELECT 1 FROM orders
        |                 WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
        |                   AND o_orderkey % 40 <> 0)
        |GROUP BY c_nationkey""".stripMargin)(incrementalNotExistsAnti),

    // The reference's FULL dataflow end to end (DataFlow.java:63-119):
    // the changelog rendered as its CDC text format (one line stream,
    // Add/Sub + 4-char relation codes), demuxed + parsed back by
    // CdcParser, node predicates applied to the PARSED frames (the
    // pushdown now reaches the text scan), events canon-encoded, and
    // the same Q10 tree + aggregate. A reference user's actual input
    // files drive the engine; the oracle is incremental_q10's.
    sql("incremental_q10_from_cdc",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalQ10FromCdc),

    // The JSON-envelope wire format driving the SAME tree (per-topic
    // streams, 'd' envelopes as deletes) — same oracle as
    // incremental_q10, so a format/demux/sign asymmetry fails the hash.
    sql("incremental_q10_from_json",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalQ10FromJson),

    // The file-STREAM deployment shape gated end to end: CDC text
    // files dropped into a watched dir → readStream.text → CdcParser
    // demux → streaming tree (state carried across TWO file
    // micro-batches) → foreachBatch upsert into the result table.
    // Same oracle as incremental_q10.
    sql("incremental_q10_filestream",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalQ10FileStream),

    // STATE OBSERVABILITY gated: each Q10-tree node's end-of-replay
    // keyed-state footprint ([[DeltaEngine.stateMetrics]]) on the
    // fixture changelog. Deterministic by construction — n_keys is
    // every key that received events (parent-delta-only keys hold
    // liveness state and COUNT), state_rows is Σ|net multiset count|:
    // nation buffers all 25 rows; customer all customers; orders only
    // window survivors (%50 deletes net away); lineitem only R-flag
    // survivors (linenumber-3 deletes net away) while its key set
    // spans ALL window orders (their parent deltas arrived even where
    // every child died). state_bytes stays on the API (an engine-side
    // UTF-8 footprint the oracle can't portably mirror).
    sql("incremental_state_metrics",
      s"""SELECT 'nation' AS node,
         |  CAST((SELECT COUNT(DISTINCT n_nationkey) FROM nation) AS BIGINT) AS n_keys,
         |  CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS state_rows
         |UNION ALL
         |SELECT 'customer',
         | (SELECT COUNT(DISTINCT k) FROM (
         |    SELECT n_nationkey AS k FROM nation
         |    UNION SELECT c_nationkey FROM customer) t),
         | (SELECT COUNT(*) FROM customer)
         |UNION ALL
         |SELECT 'orders',
         | (SELECT COUNT(DISTINCT k) FROM (
         |    SELECT c_custkey AS k FROM customer
         |    UNION SELECT o_custkey FROM orders
         |    WHERE o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi') t),
         | (SELECT COUNT(*) FROM orders
         |  WHERE o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         |   AND o_orderkey % 50 <> 0)
         |UNION ALL
         |SELECT 'lineitem',
         | (SELECT COUNT(DISTINCT k) FROM (
         |    SELECT o_orderkey AS k FROM orders
         |    WHERE o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         |    UNION SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R') t),
         | (SELECT COUNT(*) FROM lineitem
         |  WHERE l_returnflag = 'R' AND l_linenumber <> 3)""".stripMargin) {
      (s, d) =>
        stateMetrics(chainStages(q10Tree), q10Changelogs(s, d), sourceFiltered = true)
          .select(col("node"), col("n_keys"), col("state_rows"))
    },

    // The SAME query as incremental_q10, but compiled FROM SQL TEXT by
    // [[SqlCompiler]] (Catalyst parser → FK-graph validation → NodeSpec
    // chain): the reference's "continuous sql query" pitch as an
    // actual API. Deletes mirror the q10 changelog set; the oracle is
    // the plain-SQL survivors query.
    sql("incremental_sql_q10",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        s"""SELECT c_custkey, c_name, c_acctbal, n_name,
           | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
           | COUNT(*) AS n_rows
           |FROM nation, customer, orders, lineitem
           |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           | AND c_nationkey = n_nationkey
           | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
           | AND l_returnflag = 'R'
           |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin,
        deletes = Map(
          "lineitem" -> (col("l_linenumber") === 3),
          "orders" -> (col("o_orderkey") % 50 === 0)))
    },

    // Same compiled query, same oracle — but the COMPILER applies the
    // bloom semi-join reduction (leaf changelog pre-filtered by the
    // parent's key bloom) because the session opts in, exercising the
    // SqlCompiler.run wiring rather than the explicit tree API.
    sql("incremental_sql_q10_bloom",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin) {
      (s, dir) =>
        val ss = s.newSession()
        ss.conf.set(BloomPrefilterConf, "true")
        ss.conf.set(BloomPrefilterItemsConf, "200000")
        ss.conf.set(BloomPrefilterFppConf, "0.01")
        SqlCompiler.run(ss, dir,
          s"""SELECT c_custkey, c_name, c_acctbal, n_name,
             | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
             | COUNT(*) AS n_rows
             |FROM nation, customer, orders, lineitem
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             | AND c_nationkey = n_nationkey
             | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
             | AND l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin,
          deletes = Map(
            "lineitem" -> (col("l_linenumber") === 3),
            "orders" -> (col("o_orderkey") % 50 === 0)))
    },

    // The skew mitigation behind the hash gate — q10 with the
    // lineitem hop salted; same oracle as incremental_q10.
    sql("incremental_q10_salted",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalQ10Salted),

    // The streaming engine (runStream), not its batch simulation,
    // behind the hash gate — same oracle as incremental_q10.
    sql("incremental_q10_stream",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalQ10Stream),

    // The flagship tree on transformWithState (Spark 4's supported
    // arbitrary-state API): per-node typed MapState child multisets
    // (point reads/writes in RocksDB instead of per-batch blob
    // rewrites), ValueState liveness counters, real per-key timers
    // for TTL — same replay, same oracle as incremental_q10_stream.
    sql("incremental_q10_tws",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalQ10Tws),

    // The maintained view MAINTAINED INTO THE LAKEHOUSE TABLE — the
    // reference's text-file sink upgraded: per-batch signed deltas
    // fold into MERGE commits on the versioned snapshot log (insert /
    // update / retract-to-zero DELETE), final snapshot vs the same
    // survivors oracle. Every intermediate version stays
    // time-travelable.
    sql("incremental_q10_snapshot_sink",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalQ10SnapshotSink),

    // The same continuous tree with EVENT-TIME TTL enabled (watermark
    // + EventTimeTimeout on every stage; delay past the fixture span,
    // so bounded state leaves the answer untouched — the production
    // contract). Same survivors oracle.
    sql("incremental_q10_stream_ttl",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalQ10StreamTtl),

    // LEFT OUTER over the MAINTAINED view — the enrichment shape a
    // reference user actually consumes: every customer (dimension
    // lookup via broadcast nation join), null-padded where no Q10
    // group survives the changelog, n_rows coalesced to 0. The outer
    // join is presentation over the incrementally maintained groups
    // (like HAVING/ORDER BY), so retraction correctness stays the
    // engine's concern and the padding is a stateless join — a
    // customer whose last lineitem dies reverts to the padded row on
    // the next read of the view.
    sql("incremental_q10_outer",
      s"""WITH v AS (
         | SELECT c_custkey,
         |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         |  COUNT(*) AS n
         | FROM customer, orders, lineitem, nation
         | WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND c_nationkey = n_nationkey
         |  AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         |  AND l_returnflag = 'R'
         |  AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         | GROUP BY c_custkey)
         |SELECT c.c_custkey, n.n_name, v.revenue_e4,
         | CAST(coalesce(v.n, 0) AS BIGINT) AS n_rows
         |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
         |LEFT JOIN v ON v.c_custkey = c.c_custkey""".stripMargin) {
      (s, dir) =>
        val view = incrementalQ10(s, dir)
          .select(col("c_custkey"), col("revenue_e4"), col("n_rows").as("__n"))
        Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
          .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .join(view, Seq("c_custkey"), "left")
          .select(col("c_custkey"), col("n_name"), col("revenue_e4"),
            coalesce(col("__n"), lit(0L)).as("n_rows"))
    },

    // SQL text → compiled plan → the CONTINUOUS engine (runStream over
    // raw streams, eventFilter pushdown) — same oracle as
    // incremental_q10.
    sql("incremental_sql_q10_stream",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalSqlQ10Stream),

    // LEFT OUTER JOIN from SQL text — inner tree + anti plan unioned
    // into one fold; NULL-extended orders (no R-lineitem) keep
    // COUNT(*) alive while SUM skips them. Oracle: the same LEFT JOIN
    // over the survivors.
    sql("incremental_sql_q10_outer",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM nation
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |LEFT JOIN lineitem ON l_orderkey = o_orderkey AND l_returnflag = 'R'
         | AND l_linenumber <> 3
         |WHERE o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalSqlQ10Outer),

    // TOP-LEVEL UNION ALL from SQL text — two maintained trees, one
    // result: customer-side and supplier-side nation revenue, each
    // branch compiled and maintained independently (lineitem routes
    // by l_orderkey in one and l_suppkey in the other), bag-unioned
    // as presentation. Oracle: the literal UNION ALL over the
    // delete-filtered fact.
    sql("incremental_sql_union",
      """WITH l AS (SELECT * FROM lineitem
        |           WHERE l_returnflag = 'R' AND l_partkey % 3 <> 0)
        |SELECT n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        | JOIN orders ON o_custkey = c_custkey
        | JOIN l ON l_orderkey = o_orderkey
        |GROUP BY n_name
        |UNION ALL
        |SELECT n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN supplier ON s_nationkey = n_nationkey
        | JOIN l ON l_suppkey = s_suppkey
        |GROUP BY n_name""".stripMargin)(incrementalSqlUnion),

    // … and through the CONTINUOUS engine: each branch replays its own
    // micro-batched tree, the union happens on the maintained outputs.
    sql("incremental_sql_union_stream",
      """WITH l AS (SELECT * FROM lineitem
        |           WHERE l_returnflag = 'R' AND l_partkey % 3 <> 0)
        |SELECT n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        | JOIN orders ON o_custkey = c_custkey
        | JOIN l ON l_orderkey = o_orderkey
        |GROUP BY n_name
        |UNION ALL
        |SELECT n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN supplier ON s_nationkey = n_nationkey
        | JOIN l ON l_suppkey = s_suppkey
        |GROUP BY n_name""".stripMargin)(incrementalSqlUnionStream),

    // Maintained INTERSECT — the cross-branch netting UNION ALL never
    // needed: the right branch's distinct tuples gate the left's
    // through a set-semantics key node + liveness hop keyed by the
    // OUTPUT ROW itself; deletes on either side flip tuples in/out.
    // Oracle: DuckDB's native INTERSECT over the survivor CTEs.
    sql("incremental_sql_intersect",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0)
        |SELECT DISTINCT n_name FROM nation
        |JOIN c ON c_nationkey = n_nationkey WHERE c_acctbal > 8000
        |INTERSECT
        |SELECT DISTINCT n_name FROM nation
        |JOIN s ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 5000""".stripMargin)(incrementalSqlIntersect),

    // Maintained EXCEPT — the same wiring with the hop inverted
    // (antiParent): tuples survive while ABSENT from the right, so a
    // right-side delete must flip tuples INTO the result.
    sql("incremental_sql_except",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0)
        |SELECT DISTINCT n_name FROM nation
        |JOIN c ON c_nationkey = n_nationkey WHERE c_acctbal > 8000
        |EXCEPT
        |SELECT DISTINCT n_name FROM nation
        |JOIN s ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 5000""".stripMargin)(incrementalSqlExcept),

    // Maintained bare UNION (SET semantics) — multiplicity collapse
    // across bag branches through one netting node: a nation with 3
    // qualifying customers and 2 qualifying suppliers is ONE row, and
    // stays present until the LAST qualifying row on either side is
    // deleted. Oracle: DuckDB's native UNION over the survivor CTEs.
    sql("incremental_sql_union_distinct",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0)
        |SELECT n_name FROM nation
        |JOIN c ON c_nationkey = n_nationkey WHERE c_acctbal > 8000
        |UNION
        |SELECT n_name FROM nation
        |JOIN s ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 5000""".stripMargin)(incrementalSqlUnionDistinct),

    // … and through the CONTINUOUS engine: branch trees and the
    // netting node in ONE streaming query, same oracle.
    sql("incremental_sql_union_distinct_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0)
        |SELECT n_name FROM nation
        |JOIN c ON c_nationkey = n_nationkey WHERE c_acctbal > 8000
        |UNION
        |SELECT n_name FROM nation
        |JOIN s ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 5000""".stripMargin)((s, d) => incrementalSqlUnionDistinctStream(s, d)),

    // … and on the TRANSFORMWITHSTATE driver — the cross-branch
    // netting node as a StatefulProcessor, same oracle.
    sql("incremental_sql_union_distinct_tws",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0)
        |SELECT n_name FROM nation
        |JOIN c ON c_nationkey = n_nationkey WHERE c_acctbal > 8000
        |UNION
        |SELECT n_name FROM nation
        |JOIN s ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 5000""".stripMargin)(
      (s, d) => incrementalSqlUnionDistinctStream(s, d, tws = true)),

    // MIXED union ASSOCIATION under set semantics: a parenthesized
    // UNION ALL group beneath a set UNION flattens exactly under the
    // netting node (DISTINCT of any ⊎/DISTINCT tree = DISTINCT of its
    // leaves), so `(A UNION ALL B) UNION C` compiles — the r12
    // "parenthesize to fix the association" fence, now a plan. The
    // converse (a set group under UNION ALL) stays fenced: it does
    // not collapse.
    sql("incremental_sql_union_mixed",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0)
        |SELECT n_name FROM (
        | SELECT n_name FROM nation JOIN c ON c_nationkey = n_nationkey
        |  WHERE c_acctbal > 8000
        | UNION ALL
        | SELECT n_name FROM nation JOIN s ON s_nationkey = n_nationkey
        |  WHERE s_acctbal > 5000) u
        |UNION
        |SELECT n_name FROM nation JOIN s ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 9000""".stripMargin) {
      (s, dir) => SqlCompiler.compileUnionDistinct(s, dir,
        """(SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
          |  WHERE c_acctbal > 8000
          | UNION ALL
          | SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
          |  WHERE s_acctbal > 5000)
          |UNION
          |SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
          |WHERE s_acctbal > 9000""".stripMargin)
        .run(s, dir, setOpDeletes)
    },

    sql("incremental_sql_union_mixed_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0)
        |SELECT n_name FROM (
        | SELECT n_name FROM nation JOIN c ON c_nationkey = n_nationkey
        |  WHERE c_acctbal > 8000
        | UNION ALL
        | SELECT n_name FROM nation JOIN s ON s_nationkey = n_nationkey
        |  WHERE s_acctbal > 5000) u
        |UNION
        |SELECT n_name FROM nation JOIN s ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 9000""".stripMargin) {
      (s, dir) => streamUnionDistinct(s, SqlCompiler.compileUnionDistinct(s, dir,
        """(SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
          |  WHERE c_acctbal > 8000
          | UNION ALL
          | SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
          |  WHERE s_acctbal > 5000)
          |UNION
          |SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
          |WHERE s_acctbal > 9000""".stripMargin),
        dir, setOpDeletes, "incremental_sql_union_mixed_stream_leaf")
    },

    // INTERSECT's liveness-gated hop on the TWS drivers, same oracle
    // as incremental_sql_intersect.
    sql("incremental_sql_intersect_tws",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0)
        |SELECT DISTINCT n_name FROM nation
        |JOIN c ON c_nationkey = n_nationkey WHERE c_acctbal > 8000
        |INTERSECT
        |SELECT DISTINCT n_name FROM nation
        |JOIN s ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 5000""".stripMargin)(incrementalSqlIntersectTws),

    // INTERSECT ALL — bag multiplicities via counts-based netting:
    // per nation, min(#qualifying customers, #qualifying suppliers)
    // copies survive; deletes move either count and the multiplicity
    // follows. Oracle: DuckDB's native INTERSECT ALL over survivors.
    sql("incremental_sql_intersect_all",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0)
        |SELECT n_name FROM nation
        |JOIN c ON c_nationkey = n_nationkey WHERE c_acctbal > 8000
        |INTERSECT ALL
        |SELECT n_name FROM nation
        |JOIN s ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 5000""".stripMargin)(incrementalSqlIntersectAll),

    // EXCEPT ALL — the surplus max(nl − nr, 0) per tuple.
    sql("incremental_sql_except_all",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0)
        |SELECT n_name FROM nation
        |JOIN c ON c_nationkey = n_nationkey WHERE c_acctbal > 8000
        |EXCEPT ALL
        |SELECT n_name FROM nation
        |JOIN s ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 5000""".stripMargin)(incrementalSqlExceptAll),

    // … and their CONTINUOUS twins: both branch trees in one streaming
    // query, side-tagged deltas, bag formula at presentation.
    sql("incremental_sql_intersect_all_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0)
        |SELECT n_name FROM nation
        |JOIN c ON c_nationkey = n_nationkey WHERE c_acctbal > 8000
        |INTERSECT ALL
        |SELECT n_name FROM nation
        |JOIN s ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 5000""".stripMargin)(incrementalSqlIntersectAllStream),

    sql("incremental_sql_except_all_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0)
        |SELECT n_name FROM nation
        |JOIN c ON c_nationkey = n_nationkey WHERE c_acctbal > 8000
        |EXCEPT ALL
        |SELECT n_name FROM nation
        |JOIN s ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 5000""".stripMargin)(incrementalSqlExceptAllStream),

    // ASOF JOIN from SQL TEXT — the as-of machinery green via the API
    // since r8, now reachable from a query string: compileAsOf parses
    // the DuckDB spelling (inequality in ON; Snowflake MATCH_CONDITION
    // accepted) and lowers onto the union-window operator. Same oracle
    // as events_asof_join.
    sql("incremental_sql_asof",
      """WITH c AS (SELECT user_id, ts, max(event_id) AS click_id
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, c.click_id AS asof_click_id, c.ts AS asof_click_ts
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)(
      incrementalSqlAsOf),

    // … with a TOLERANCE bound in the ON clause (kdb aj / pandas
    // merge_asof): `p.ts - c.ts <= INTERVAL 1 HOUR` compiles onto the
    // operator's staleness conditional. Same oracle as
    // events_asof_tolerance.
    sql("incremental_sql_asof_tolerance",
      """WITH c AS (SELECT user_id, ts, max(event_id) AS click_id
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts,
        | CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN c.click_id END AS asof_click_id,
        | CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN c.ts END AS asof_click_ts
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)(
      incrementalSqlAsOfTolerance),

    // … and the tolerance bound through the CONTINUOUS operator: the
    // compiled spec's toleranceMicros drives streamAsOfJoin's
    // staleness conditional, same oracle as the batch tolerance form.
    sql("incremental_sql_asof_tolerance_stream",
      """WITH c AS (SELECT user_id, ts, max(event_id) AS click_id
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts,
        | CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN c.click_id END AS asof_click_id,
        | CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN c.ts END AS asof_click_ts
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)(
      (s, d) => incrementalSqlAsOfStream(s, d,
        sqlText = """SELECT p.event_id, p.user_id, p.ts,
          | c.click_id AS asof_click_id, c.ts AS asof_click_ts
          |FROM p ASOF LEFT JOIN c
          |ON p.user_id = c.user_id AND p.ts >= c.ts
          | AND p.ts - c.ts <= INTERVAL 1 HOUR""".stripMargin,
        sinkName = "incremental_sql_asof_tolerance_stream")),

    // … and the same compiled spec lowered onto the CONTINUOUS
    // operator (streamAsOfJoin micro-batch replay), same oracle — the
    // SQL surface drives the stream, not a hand-wired twin.
    sql("incremental_sql_asof_stream",
      """WITH c AS (SELECT user_id, ts, max(event_id) AS click_id
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, c.click_id AS asof_click_id, c.ts AS asof_click_ts
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)(
      (s, d) => incrementalSqlAsOfStream(s, d)),

    // … with the RIGHT KEY in the select list: under LEFT the null
    // extension must surface NULL for c.user_id (matched rows carry
    // the key) — the lowering gates the left-key substitution on the
    // match witness instead of substituting unconditionally. 143 of
    // the 1981 sf0.01 purchases take the NULL path.
    sql("incremental_sql_asof_rightkey",
      """WITH c AS (SELECT user_id, ts, max(event_id) AS click_id
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, c.click_id AS asof_click_id,
        | c.user_id AS asof_click_user, c.ts AS asof_click_ts
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)(
      incrementalSqlAsOfRightKey),

    // … and the same right-key select through the CONTINUOUS
    // operator — the stream lowering's final projection carries the
    // identical match-witness gate. Same oracle.
    sql("incremental_sql_asof_rightkey_stream",
      """WITH c AS (SELECT user_id, ts, max(event_id) AS click_id
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, c.click_id AS asof_click_id,
        | c.user_id AS asof_click_user, c.ts AS asof_click_ts
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)(
      (s, d) => incrementalSqlAsOfStream(s, d, sqlText = asofRightKeySql,
        sinkName = "incremental_sql_asof_rightkey_stream")),

    // MAINTAINED VIEW OVER A VERSIONED TABLE (the r10 stretch): orders
    // resolves through a version-pinned shallow branch of the snapshot
    // log via SqlCompiler.compileOver — schemas, FK derivation,
    // changelogs and deletes all flow through the override. Oracle:
    // the branch head reconstructed in SQL (v1 = update + delete +
    // shifted-insert batches applied to the parquet base).
    sql("incremental_sql_over_branch",
      """WITH o AS (
        | SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 160 = 1 THEN o_totalprice + 1000
        |       ELSE o_totalprice END AS o_totalprice
        | FROM orders WHERE o_orderkey % 160 <> 0
        | UNION ALL
        | SELECT o_orderkey + 10000000, o_custkey, o_totalprice
        | FROM orders WHERE o_orderkey % 160 = 2),
        |c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0)
        |SELECT n_name, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        |JOIN o ON o_custkey = c_custkey
        |GROUP BY n_name""".stripMargin)(incrementalSqlOverBranch),

    // … and the branch-sourced maintained view through the CONTINUOUS
    // engine, same oracle.
    sql("incremental_sql_over_branch_stream",
      """WITH o AS (
        | SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 160 = 1 THEN o_totalprice + 1000
        |       ELSE o_totalprice END AS o_totalprice
        | FROM orders WHERE o_orderkey % 160 <> 0
        | UNION ALL
        | SELECT o_orderkey + 10000000, o_custkey, o_totalprice
        | FROM orders WHERE o_orderkey % 160 = 2),
        |c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0)
        |SELECT n_name, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        |JOIN o ON o_custkey = c_custkey
        |GROUP BY n_name""".stripMargin)(incrementalSqlOverBranchStream),

    // … both through the CONTINUOUS engine: branch trees AND set
    // stages in one streaming query, flips crossing micro-batches.
    sql("incremental_sql_intersect_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0)
        |SELECT DISTINCT n_name FROM nation
        |JOIN c ON c_nationkey = n_nationkey WHERE c_acctbal > 8000
        |INTERSECT
        |SELECT DISTINCT n_name FROM nation
        |JOIN s ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 5000""".stripMargin)(incrementalSqlIntersectStream),

    sql("incremental_sql_except_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0)
        |SELECT DISTINCT n_name FROM nation
        |JOIN c ON c_nationkey = n_nationkey WHERE c_acctbal > 8000
        |EXCEPT
        |SELECT DISTINCT n_name FROM nation
        |JOIN s ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 5000""".stripMargin)(incrementalSqlExceptStream),

    // FULL OUTER JOIN from SQL text — both preservation directions
    // maintained: the anti plan NULL-extends orders that lost every
    // lineitem, the orphan plan preserves lineitems whose order was
    // deleted (they fold under NULL customer/nation keys — SQL's
    // right-preserved row). Oracle: DuckDB FULL JOIN over
    // delete-filtered derived tables (deletes must live in the
    // subqueries, not WHERE, which would NULL-reject the orphans).
    sql("incremental_sql_q10_fullouter",
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |GROUP BY c_custkey, n_name""".stripMargin)(incrementalSqlQ10FullOuter),

    // FULL OUTER × EXISTS gate on an inner relation: the gate is FALSE
    // on every right-preserved row (structural NULL correlation), so
    // the orphan class is not built; children of gate-failing nations
    // were MATCHED rows at join time and are WHERE-dropped — the
    // ungated-prefix orphan plan must not resurrect them. Oracle is
    // the literal FULL JOIN + WHERE EXISTS over the post-delete state,
    // so DuckDB performs the same join-then-filter independently.
    sql("incremental_sql_q10_fullouter_gated",
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE EXISTS (SELECT 1 FROM region
        |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
        |GROUP BY c_custkey, n_name""".stripMargin) {
      (s, dir) => incrementalSqlQ10FullOuterGated(s, dir, "")
    },
    sql("incremental_sql_q10_fullouter_gated_stream",
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE EXISTS (SELECT 1 FROM region
        |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
        |GROUP BY c_custkey, n_name""".stripMargin) {
      (s, dir) => incrementalSqlQ10FullOuterGatedStream(s, dir, "",
        "incremental_sql_q10_fullouter_gated_leaf")
    },

    // … and the NOT EXISTS mirror: trivially TRUE on the structural
    // NULLs, so the orphan group (lineitems whose order died, under
    // the delete set) IS emitted while every ASIA-matched row drops.
    sql("incremental_sql_q10_fullouter_gated_anti",
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE NOT EXISTS (SELECT 1 FROM region
        |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
        |GROUP BY c_custkey, n_name""".stripMargin) {
      (s, dir) => incrementalSqlQ10FullOuterGated(s, dir, "NOT ")
    },
    sql("incremental_sql_q10_fullouter_gated_anti_stream",
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE NOT EXISTS (SELECT 1 FROM region
        |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
        |GROUP BY c_custkey, n_name""".stripMargin) {
      (s, dir) => incrementalSqlQ10FullOuterGatedStream(s, dir, "NOT ",
        "incremental_sql_q10_fullouter_gated_anti_leaf")
    },
    // … through the TRANSFORMWITHSTATE driver — the ungated-prefix
    // orphan plan + the gate key node on the supported state API.
    sql("incremental_sql_q10_fullouter_gated_anti_tws",
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE NOT EXISTS (SELECT 1 FROM region
        |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
        |GROUP BY c_custkey, n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s,
        SqlCompiler.compile(s, dir, q10FullOuterGatedSql("NOT ")), dir,
        q10FullOuterDeletes, "incremental_sql_q10_fullouter_gated_anti_tws_leaf",
        tws = true)
    },
    // the IN spelling of the same gate (IN ≡ EXISTS on the matched
    // side; on structural NULLs both are not-TRUE, so the orphan class
    // drops identically — the oracle says so in the IN spelling).
    sql("incremental_sql_q10_fullouter_gated_in",
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
        |GROUP BY c_custkey, n_name""".stripMargin) {
      (s, dir) => SqlCompiler.compile(s, dir,
        """SELECT c_custkey, n_name,
          | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
          | COUNT(*) AS n_rows
          |FROM nation
          |JOIN customer ON c_nationkey = n_nationkey
          |JOIN orders ON o_custkey = c_custkey
          |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
          |GROUP BY c_custkey, n_name""".stripMargin)
        .run(s, dir, q10FullOuterDeletes)
    },
    sql("incremental_sql_q10_fullouter_gated_in_stream",
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
        |GROUP BY c_custkey, n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT c_custkey, n_name,
            | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
            | COUNT(*) AS n_rows
            |FROM nation
            |JOIN customer ON c_nationkey = n_nationkey
            |JOIN orders ON o_custkey = c_custkey
            |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
            |WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
            |GROUP BY c_custkey, n_name""".stripMargin),
        dir, q10FullOuterDeletes, "incremental_sql_q10_fullouter_gated_in_leaf")
    },

    // FULL OUTER + WHERE on the preserved side (r8's loud rejection,
    // now planned): the date conjunct NULL-rejects every orphan row
    // in SQL, so the compile drops the orphan plan and keeps the
    // NULL-extension side — gated against DuckDB running the LITERAL
    // FULL JOIN + WHERE, which performs the same NULL-rejection
    // independently.
    sql("incremental_sql_q10_fullouter_filtered",
      s"""WITH o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
         |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
         |SELECT c_custkey, n_name,
         | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM nation JOIN customer ON c_nationkey = n_nationkey
         | JOIN o ON o_custkey = c_custkey
         | FULL JOIN l ON l_orderkey = o_orderkey
         |WHERE o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         |GROUP BY c_custkey, n_name""".stripMargin)(incrementalSqlQ10FullOuterFiltered),

    // … and through the CONTINUOUS engine.
    sql("incremental_sql_q10_fullouter_filtered_stream",
      s"""WITH o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
         |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
         |SELECT c_custkey, n_name,
         | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM nation JOIN customer ON c_nationkey = n_nationkey
         | JOIN o ON o_custkey = c_custkey
         | FULL JOIN l ON l_orderkey = o_orderkey
         |WHERE o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         |GROUP BY c_custkey, n_name""".stripMargin)(incrementalSqlQ10FullOuterFilteredStream),

    // FULL OUTER + WHERE on the boundary CHILD — the mirror
    // NULL-rejection: extensions die, orphans survive the filter
    // (effectively the RIGHT-preserved reading), gated against the
    // literal FULL JOIN + WHERE which DuckDB NULL-rejects itself.
    sql("incremental_sql_q10_fullouter_child_filtered",
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE l_linenumber <> 3
        |GROUP BY c_custkey, n_name""".stripMargin)(incrementalSqlQ10FullOuterChildFiltered),

    // … and through the CONTINUOUS engine (orphans assert/retract
    // across micro-batches under the child filter).
    sql("incremental_sql_q10_fullouter_child_filtered_stream",
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE l_linenumber <> 3
        |GROUP BY c_custkey, n_name""".stripMargin)(incrementalSqlQ10FullOuterChildFilteredStream),

    // FULL OUTER + WHERE o_orderkey IS NULL — the find-the-orphans
    // idiom (r9's loud fence, now planned): the view is EXACTLY the
    // orphan plan's output, every left grouping key NULL. Gated
    // against DuckDB running the literal FULL JOIN + IS NULL, which
    // selects the right-preserved rows independently; ancestor
    // deletes make orphan creation flow through the tree prefix.
    sql("incremental_sql_q10_fullouter_isnull",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 30 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE o_orderkey IS NULL
        |GROUP BY c_custkey, n_name""".stripMargin)(incrementalSqlQ10FullOuterIsNull),

    // … and through the CONTINUOUS engine: batch 2's customer/order
    // deletes must CREATE orphan rows through held state in a view
    // that has no inner tree at all.
    sql("incremental_sql_q10_fullouter_isnull_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 30 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE o_orderkey IS NULL
        |GROUP BY c_custkey, n_name""".stripMargin)(incrementalSqlQ10FullOuterIsNullStream),

    // FULL OUTER with ANCESTOR deletes (r8's other fence): deleting a
    // customer must orphan its orders' lineitems — the tree-prefix
    // orphan key node sees the flip through the customer hop. Oracle:
    // all three delete sets as derived tables, orphans via FULL JOIN.
    sql("incremental_sql_q10_fullouter_ancestor_del",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 30 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |GROUP BY c_custkey, n_name""".stripMargin)(incrementalSqlQ10FullOuterAncestorDel),

    // TWO NESTED FULL OUTER boundaries × WHERE — the r10 verdict's
    // last compile fence, lifted. SQL's double FULL OUTER decomposes
    // into six row classes (see SqlCompiler's NESTED TWO-BOUNDARY
    // section); the WHERE on the leaf kills the three classes whose
    // lineitem side is NULL, so this maintains the main tree PLUS the
    // two genuinely new plans: orphan-orders ⋈ their lineitems
    // (a customer delete moves whole order subtrees into it) and
    // orphan-lineitems keyed off orders' RAW changelog (an orders
    // delete moves rows into it). Deletes on all three levels.
    sql("incremental_sql_q10_fullouter_two_boundary",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_linenumber <> 3)
        |SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN o ON o_custkey = c_custkey
        |FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY n_name, o_orderpriority""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
          | SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS rev_e2
          |FROM nation
          |JOIN customer ON c_nationkey = n_nationkey
          |FULL OUTER JOIN orders ON o_custkey = c_custkey
          |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE l_returnflag = 'R'
          |GROUP BY n_name, o_orderpriority""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "orders" -> (col("o_orderkey") % 50 === 0),
          "lineitem" -> (col("l_linenumber") === 3)))
    },

    // … and WITHOUT a WHERE: all SIX classes maintained at once,
    // including orphan-orders-with-no-lineitems (the NOT EXISTS wiring
    // over the orphan hop's emissions — the one class the filtered
    // entry's WHERE kills). Same triple-level deletes.
    sql("incremental_sql_q10_fullouter_two_boundary_all",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_linenumber <> 3)
        |SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN o ON o_custkey = c_custkey
        |FULL JOIN l ON l_orderkey = o_orderkey
        |GROUP BY n_name, o_orderpriority""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
          | SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS rev_e2
          |FROM nation
          |JOIN customer ON c_nationkey = n_nationkey
          |FULL OUTER JOIN orders ON o_custkey = c_custkey
          |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
          |GROUP BY n_name, o_orderpriority""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "orders" -> (col("o_orderkey") % 50 === 0),
          "lineitem" -> (col("l_linenumber") === 3)))
    },

    // … the filtered two-boundary view through the CONTINUOUS engine,
    // same oracle: six plans' state across micro-batches, deletes
    // retracting in later batches than their inserts.
    sql("incremental_sql_q10_fullouter_two_boundary_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_linenumber <> 3)
        |SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN o ON o_custkey = c_custkey
        |FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY n_name, o_orderpriority""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
            | SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS rev_e2
            |FROM nation
            |JOIN customer ON c_nationkey = n_nationkey
            |FULL OUTER JOIN orders ON o_custkey = c_custkey
            |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
            |WHERE l_returnflag = 'R'
            |GROUP BY n_name, o_orderpriority""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "orders" -> (col("o_orderkey") % 50 === 0),
          "lineitem" -> (col("l_linenumber") === 3)),
        "incremental_sql_q10_fullouter_two_boundary_stream_leaf")
    },

    // … and the same six-plan compile on the TRANSFORMWITHSTATE
    // drivers, same oracle — the orphan-subtree chains (stages
    // consuming other stages' emissions) on the supported state API.
    sql("incremental_sql_q10_fullouter_two_boundary_tws",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_linenumber <> 3)
        |SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN o ON o_custkey = c_custkey
        |FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY n_name, o_orderpriority""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
            | SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS rev_e2
            |FROM nation
            |JOIN customer ON c_nationkey = n_nationkey
            |FULL OUTER JOIN orders ON o_custkey = c_custkey
            |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
            |WHERE l_returnflag = 'R'
            |GROUP BY n_name, o_orderpriority""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "orders" -> (col("o_orderkey") % 50 === 0),
          "lineitem" -> (col("l_linenumber") === 3)),
        "incremental_sql_q10_fullouter_two_boundary_tws_leaf", tws = true)
    },

    // … and the UNFILTERED six-class view through the CONTINUOUS
    // engine — all five preservation plans' state across micro-batches
    // at once, same oracle as the batch _all entry.
    sql("incremental_sql_q10_fullouter_two_boundary_all_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_linenumber <> 3)
        |SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN o ON o_custkey = c_custkey
        |FULL JOIN l ON l_orderkey = o_orderkey
        |GROUP BY n_name, o_orderpriority""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
            | SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS rev_e2
            |FROM nation
            |JOIN customer ON c_nationkey = n_nationkey
            |FULL OUTER JOIN orders ON o_custkey = c_custkey
            |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
            |GROUP BY n_name, o_orderpriority""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "orders" -> (col("o_orderkey") % 50 === 0),
          "lineitem" -> (col("l_linenumber") === 3)),
        "incremental_sql_q10_fullouter_two_boundary_all_stream_leaf")
    },

    // … and the FIND-THE-ORPHANS reading across both boundaries:
    // `c_custkey IS NULL` selects exactly the classes whose customer
    // side is nulled (orphan-orders ⋈ lineitems + orphan-lineitems;
    // the main tree never runs — suppressMainLeaf), composed with the
    // null-rejecting lineitem conjunct that drops the no-C class.
    sql("incremental_sql_q10_fullouter_two_boundary_isnull",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_linenumber <> 3)
        |SELECT o_orderpriority, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN o ON o_custkey = c_custkey
        |FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE c_custkey IS NULL AND l_returnflag = 'R'
        |GROUP BY o_orderpriority""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT o_orderpriority, COUNT(*) AS n_rows,
          | SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS rev_e2
          |FROM nation
          |JOIN customer ON c_nationkey = n_nationkey
          |FULL OUTER JOIN orders ON o_custkey = c_custkey
          |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE c_custkey IS NULL AND l_returnflag = 'R'
          |GROUP BY o_orderpriority""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "orders" -> (col("o_orderkey") % 50 === 0),
          "lineitem" -> (col("l_linenumber") === 3)))
    },

    // … the same compiled FULL OUTER (fused leaf + anti plan, ancestor
    // deletes) through the TRANSFORMWITHSTATE driver — the compiler's
    // hardest maintained shape on the supported state API, same
    // oracle: three state implementations, one truth.
    sql("incremental_sql_q10_fullouter_tws",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 30 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |GROUP BY c_custkey, n_name""".stripMargin)(incrementalSqlQ10FullOuterTws),

    // … and through the CONTINUOUS engine — the customer delete
    // arrives in batch 2 and must CREATE orphans through held state.
    sql("incremental_sql_q10_fullouter_ancestor_del_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 30 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |GROUP BY c_custkey, n_name""".stripMargin)(incrementalSqlQ10FullOuterAncestorDelStream),

    // The same FULL OUTER through the CONTINUOUS engine — orphan
    // preservation flips ON mid-stream when batch 2 deletes orders.
    sql("incremental_sql_q10_fullouter_stream",
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_partkey % 3 <> 0)
        |SELECT c_custkey, n_name,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        | JOIN o ON o_custkey = c_custkey
        | FULL JOIN l ON l_orderkey = o_orderkey
        |GROUP BY c_custkey, n_name""".stripMargin)(incrementalSqlQ10FullOuterStream),

    // RIGHT OUTER JOIN from SQL text — canonicalized by the compiler
    // onto the LEFT OUTER machinery (children swapped, preserved side
    // unchanged); same oracle as the LEFT form because the two
    // spellings denote the same view.
    sql("incremental_sql_q10_right",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM nation
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |LEFT JOIN lineitem ON l_orderkey = o_orderkey AND l_returnflag = 'R'
         | AND l_linenumber <> 3
         |WHERE o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalSqlQ10Right),

    // The same compiled LEFT JOIN through the CONTINUOUS engine —
    // NULL-extensions assert/retract across real micro-batches.
    sql("incremental_sql_q10_outer_stream",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM nation
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |LEFT JOIN lineitem ON l_orderkey = o_orderkey AND l_returnflag = 'R'
         | AND l_linenumber <> 3
         |WHERE o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalSqlQ10OuterStream),

    // Conf-wired skew salting through the COMPILER (the bloom conf
    // pattern) — lineitem's stage folds over 8 salted sub-keys; same
    // survivors oracle as incremental_sql_q10.
    sql("incremental_sql_q10_salted",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin)(incrementalSqlQ10Salted),

    sql("incremental_q10_rev_quantile",
      s"""WITH v AS (
         | SELECT c_custkey, c_name, c_acctbal, n_name,
         |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
         | FROM customer, orders, lineitem, nation
         | WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND c_nationkey = n_nationkey
         |  AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         |  AND l_returnflag = 'R'
         |  AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         | GROUP BY c_custkey, c_name, c_acctbal, n_name),
         |h AS (SELECT n_name, revenue_e4 // $RevBinE4 AS bin, count(*) AS n FROM v GROUP BY 1, 2),
         |c AS (SELECT n_name, bin, n,
         |  sum(n) OVER (PARTITION BY n_name ORDER BY bin) AS cum,
         |  sum(n) OVER (PARTITION BY n_name) AS total FROM h)
         |SELECT n_name,
         | min(CASE WHEN cum * 2 >= total
         |   THEN (CAST(bin AS DOUBLE) + 0.5) * CAST($RevBinE4 AS DOUBLE) END) AS p50_rev_est,
         | CAST(max(total) AS BIGINT) AS n_cust
         |FROM c GROUP BY n_name""".stripMargin)(incrementalQ10RevQuantile),

    sql("incremental_q10_running",
      s"""WITH base AS (
         | SELECT c_custkey, o_orderkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |  CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT) AS rev_e4
         | FROM customer, orders, lineitem, nation
         | WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND c_nationkey = n_nationkey
         |  AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         |  AND l_returnflag = 'R'),
         |ev AS (
         | SELECT 0 AS seq, 1 AS sign, c_custkey, l_orderkey, l_linenumber, rev_e4 FROM base
         | UNION ALL
         | SELECT 1, -1, c_custkey, l_orderkey, l_linenumber, rev_e4 FROM base WHERE o_orderkey % 50 = 0
         | UNION ALL
         | SELECT 1, -1, c_custkey, l_orderkey, l_linenumber, rev_e4 FROM base
         | WHERE l_linenumber = 3 AND o_orderkey % 50 <> 0)
         |SELECT c_custkey, CAST(seq AS BIGINT) AS seq, l_orderkey, l_linenumber,
         | CAST(sign AS BIGINT) AS sign,
         | CAST(SUM(sign * rev_e4) OVER (PARTITION BY c_custkey
         |   ORDER BY seq, l_orderkey, l_linenumber, sign, rev_e4
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_revenue_e4
         |FROM ev""".stripMargin)(incrementalQ10Running),

    sql("incremental_supplier_rev",
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM region, nation, supplier, lineitem
        |WHERE n_regionkey = r_regionkey AND s_nationkey = n_nationkey
        | AND l_suppkey = s_suppkey AND r_name IN ('ASIA', 'EUROPE')
        | AND l_quantity >= 25 AND l_linenumber <> 2 AND s_suppkey % 20 <> 0
        |GROUP BY n_name""".stripMargin)(incrementalSupplierRevenue),

    // AVG maintained incrementally — compiled by SqlCompiler to the
    // retractable SUM/COUNT pair (exact integral folds, one double
    // division per group; FP arguments are rejected at compile time).
    // The oracle mirrors the same exact-sum-then-divide so the double
    // is bit-identical.
    sql("incremental_sql_avg",
      """SELECT n_name,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
        |   / COUNT(*) AS avg_price_e2,
        | COUNT(*) AS n_rows
        |FROM region, nation, customer, orders
        |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        | AND o_custkey = c_custkey
        | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        | AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name,
          | AVG(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS avg_price_e2,
          | COUNT(*) AS n_rows
          |FROM region, nation, customer, orders
          |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
          | AND o_custkey = c_custkey
          | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
          |GROUP BY n_name""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 7 === 0)))
    },

    // VAR_SAMP / STDDEV_SAMP maintained incrementally — the compiler
    // folds the retractable moments (n, Σx, Σx²) exactly (Σ in
    // DECIMAL(38,0); INTEGRAL argument enforced at compile time) and
    // evaluates (n·Σx² − (Σx)²)/(n·(n−1)) once per group in double.
    // The oracle mirrors that formula literally over the same exact
    // integer moments (HUGEINT sums), so the doubles — and sqrt, IEEE
    // correctly rounded — are bit-identical across engines.
    // POPULATION variance/stddev — same retractable (n, Σx, Σx²)
    // moments as the _SAMP forms, denominator n² (defined from one
    // row, so single-row groups emit 0 instead of NULL).
    sql("incremental_sql_stddev_pop",
      """WITH t AS (
        | SELECT n_name, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
        | FROM region, nation, customer, orders
        | WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        |  AND o_custkey = c_custkey
        |  AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        |  AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0),
        |m AS (SELECT n_name, COUNT(v) AS n, SUM(CAST(v AS HUGEINT)) AS s,
        |             SUM(CAST(v AS HUGEINT) * v) AS ss, COUNT(*) AS n_rows
        |      FROM t GROUP BY n_name)
        |SELECT n_name,
        | (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |   / CAST(NULLIF(n * n, 0) AS DOUBLE) AS var_pop_e2,
        | sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |   / CAST(NULLIF(n * n, 0) AS DOUBLE)) AS std_pop_e2,
        | n_rows
        |FROM m""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name,
          | VAR_POP(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS var_pop_e2,
          | STDDEV_POP(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS std_pop_e2,
          | COUNT(*) AS n_rows
          |FROM region, nation, customer, orders
          |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
          | AND o_custkey = c_custkey
          | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
          |GROUP BY n_name""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 7 === 0)))
    },

    // The population-moments fold over the CONTINUOUS engine's
    // streamed leaf — same oracle as incremental_sql_stddev_pop
    // (stream/batch parity: the exact (n, Σx, Σx²) state must survive
    // micro-batch replay with deletes retracting in later batches).
    sql("incremental_sql_stddev_pop_stream",
      """WITH t AS (
        | SELECT n_name, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
        | FROM region, nation, customer, orders
        | WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        |  AND o_custkey = c_custkey
        |  AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        |  AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0),
        |m AS (SELECT n_name, COUNT(v) AS n, SUM(CAST(v AS HUGEINT)) AS s,
        |             SUM(CAST(v AS HUGEINT) * v) AS ss, COUNT(*) AS n_rows
        |      FROM t GROUP BY n_name)
        |SELECT n_name,
        | (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |   / CAST(NULLIF(n * n, 0) AS DOUBLE) AS var_pop_e2,
        | sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |   / CAST(NULLIF(n * n, 0) AS DOUBLE)) AS std_pop_e2,
        | n_rows
        |FROM m""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name,
            | VAR_POP(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS var_pop_e2,
            | STDDEV_POP(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS std_pop_e2,
            | COUNT(*) AS n_rows
            |FROM region, nation, customer, orders
            |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
            | AND o_custkey = c_custkey
            | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
            |GROUP BY n_name""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 7 === 0)),
        "incremental_sql_stddev_pop_stream_leaf")
    },

    sql("incremental_sql_stddev",
      """WITH t AS (
        | SELECT n_name, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
        | FROM region, nation, customer, orders
        | WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        |  AND o_custkey = c_custkey
        |  AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        |  AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0),
        |m AS (SELECT n_name, COUNT(v) AS n, SUM(CAST(v AS HUGEINT)) AS s,
        |             SUM(CAST(v AS HUGEINT) * v) AS ss, COUNT(*) AS n_rows
        |      FROM t GROUP BY n_name)
        |SELECT n_name,
        | (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |   / CAST(NULLIF(n * (n - 1), 0) AS DOUBLE) AS var_price_e2,
        | sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |   / CAST(NULLIF(n * (n - 1), 0) AS DOUBLE)) AS std_price_e2,
        | n_rows
        |FROM m""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name,
          | VAR_SAMP(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS var_price_e2,
          | STDDEV_SAMP(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS std_price_e2,
          | COUNT(*) AS n_rows
          |FROM region, nation, customer, orders
          |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
          | AND o_custkey = c_custkey
          | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
          |GROUP BY n_name""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 7 === 0)))
    },

    // Pearson CORRELATION maintained incrementally — the compiler
    // folds retractable CO-MOMENTS (n, Σx, Σy, Σx², Σy², Σxy) exactly
    // (DECIMAL(38,0); INTEGRAL arguments enforced) and evaluates
    //   r = (n·Σxy − Σx·Σy) / (sqrt(n·Σx²−(Σx)²)·sqrt(n·Σy²−(Σy)²))
    // once per group in double. The oracle mirrors the formula
    // literally over HUGEINT moments (including the greatest(…, 0)
    // clamps before each sqrt), so the doubles are bit-identical.
    sql("incremental_sql_corr",
      """WITH t AS (
        | SELECT n_name, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x,
        |  o_custkey AS y
        | FROM region, nation, customer, orders
        | WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        |  AND o_custkey = c_custkey
        |  AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        |  AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0),
        |m AS (SELECT n_name,
        |  COUNT(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END) AS n,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(x AS HUGEINT) END) AS sx,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(y AS HUGEINT) END) AS sy,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(x AS HUGEINT) * x END) AS sxx,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(y AS HUGEINT) * y END) AS syy,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(x AS HUGEINT) * y END) AS sxy,
        |  COUNT(*) AS n_rows
        | FROM t GROUP BY n_name)
        |SELECT n_name,
        | (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / NULLIF(sqrt(GREATEST(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
        |    * sqrt(GREATEST(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), 0.0)), 0.0) AS corr_price_cust,
        | n_rows
        |FROM m""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name,
          | CORR(CAST(round(o_totalprice * 100, 0) AS BIGINT), o_custkey) AS corr_price_cust,
          | COUNT(*) AS n_rows
          |FROM region, nation, customer, orders
          |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
          | AND o_custkey = c_custkey
          | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
          |GROUP BY n_name""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 7 === 0)))
    },

    // CORR composed with ROLLUP — the co-moment folds run per grouping
    // set through the same delta-side Expand as every other aggregate
    // family, so subtotal and grand-total correlations maintain
    // incrementally too; DuckDB's native ROLLUP + its own moment
    // mirror per set is the oracle.
    sql("incremental_sql_corr_rollup",
      """WITH t AS (
        | SELECT n_name, o_orderstatus,
        |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x, o_custkey AS y
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderkey % 6 <> 0),
        |m AS (SELECT n_name, o_orderstatus,
        |  COUNT(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END) AS n,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(x AS HUGEINT) END) AS sx,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(y AS HUGEINT) END) AS sy,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(x AS HUGEINT) * x END) AS sxx,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(y AS HUGEINT) * y END) AS syy,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(x AS HUGEINT) * y END) AS sxy,
        |  COUNT(*) AS n_rows
        | FROM t GROUP BY ROLLUP (n_name, o_orderstatus))
        |SELECT n_name, o_orderstatus,
        | (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / NULLIF(sqrt(GREATEST(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
        |    * sqrt(GREATEST(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), 0.0)), 0.0) AS r,
        | n_rows
        |FROM m""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, o_orderstatus,
          | CORR(CAST(round(o_totalprice * 100, 0) AS BIGINT), o_custkey) AS r,
          | COUNT(*) AS n_rows
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          |GROUP BY ROLLUP (n_name, o_orderstatus)""".stripMargin,
        deletes = Map("orders" -> (col("o_orderkey") % 6 === 0)))
    },
    // CORR × ROLLUP on the CONTINUOUS engine — same oracle as
    // incremental_sql_corr_rollup: the per-grouping-set co-moment
    // folds (delta-side Expand) under micro-batch replay.
    sql("incremental_sql_corr_rollup_stream",
      """WITH t AS (
        | SELECT n_name, o_orderstatus,
        |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x, o_custkey AS y
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderkey % 6 <> 0),
        |m AS (SELECT n_name, o_orderstatus,
        |  COUNT(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END) AS n,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(x AS HUGEINT) END) AS sx,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(y AS HUGEINT) END) AS sy,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(x AS HUGEINT) * x END) AS sxx,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(y AS HUGEINT) * y END) AS syy,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(x AS HUGEINT) * y END) AS sxy,
        |  COUNT(*) AS n_rows
        | FROM t GROUP BY ROLLUP (n_name, o_orderstatus))
        |SELECT n_name, o_orderstatus,
        | (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / NULLIF(sqrt(GREATEST(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
        |    * sqrt(GREATEST(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), 0.0)), 0.0) AS r,
        | n_rows
        |FROM m""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, o_orderstatus,
            | CORR(CAST(round(o_totalprice * 100, 0) AS BIGINT), o_custkey) AS r,
            | COUNT(*) AS n_rows
            |FROM nation, customer, orders
            |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
            |GROUP BY ROLLUP (n_name, o_orderstatus)""".stripMargin),
        dir, Map("orders" -> (col("o_orderkey") % 6 === 0)),
        "incremental_sql_corr_rollup_stream_leaf")
    },

    // CORR + COVAR_SAMP over the CONTINUOUS engine's streamed leaf —
    // the co-moment folds under micro-batch replay with retractions in
    // later batches; oracle mirrors both closed forms over HUGEINT
    // moments.
    sql("incremental_sql_corr_stream",
      """WITH t AS (
        | SELECT n_name, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x,
        |  o_custkey AS y
        | FROM region, nation, customer, orders
        | WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        |  AND o_custkey = c_custkey
        |  AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        |  AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0),
        |m AS (SELECT n_name,
        |  COUNT(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END) AS n,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(x AS HUGEINT) END) AS sx,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(y AS HUGEINT) END) AS sy,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(x AS HUGEINT) * x END) AS sxx,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(y AS HUGEINT) * y END) AS syy,
        |  SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN CAST(x AS HUGEINT) * y END) AS sxy,
        |  COUNT(*) AS n_rows
        | FROM t GROUP BY n_name)
        |SELECT n_name,
        | (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / NULLIF(sqrt(GREATEST(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
        |    * sqrt(GREATEST(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), 0.0)), 0.0) AS corr_price_cust,
        | (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / CAST(NULLIF(n * (n - 1), 0) AS DOUBLE) AS covar_price_cust,
        | n_rows
        |FROM m""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name,
            | CORR(CAST(round(o_totalprice * 100, 0) AS BIGINT), o_custkey) AS corr_price_cust,
            | COVAR_SAMP(CAST(round(o_totalprice * 100, 0) AS BIGINT), o_custkey) AS covar_price_cust,
            | COUNT(*) AS n_rows
            |FROM region, nation, customer, orders
            |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
            | AND o_custkey = c_custkey
            | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
            |GROUP BY n_name""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 7 === 0)),
        "incremental_sql_corr_stream_leaf")
    },

    // The integer-moments fold over the CONTINUOUS engine's streamed
    // leaf — same oracle as incremental_sql_stddev, so the exactness
    // of (n, Σx, Σx²) must survive micro-batch replay: partial state
    // across batches, deletes arriving as retractions in a LATER
    // batch than their inserts. A drifting float fold would diverge
    // here even when the batch entry passes.
    sql("incremental_sql_stddev_stream",
      """WITH t AS (
        | SELECT n_name, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
        | FROM region, nation, customer, orders
        | WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        |  AND o_custkey = c_custkey
        |  AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        |  AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0),
        |m AS (SELECT n_name, COUNT(v) AS n, SUM(CAST(v AS HUGEINT)) AS s,
        |             SUM(CAST(v AS HUGEINT) * v) AS ss, COUNT(*) AS n_rows
        |      FROM t GROUP BY n_name)
        |SELECT n_name,
        | (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |   / CAST(NULLIF(n * (n - 1), 0) AS DOUBLE) AS var_price_e2,
        | sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |   / CAST(NULLIF(n * (n - 1), 0) AS DOUBLE)) AS std_price_e2,
        | n_rows
        |FROM m""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name,
            | VAR_SAMP(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS var_price_e2,
            | STDDEV_SAMP(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS std_price_e2,
            | COUNT(*) AS n_rows
            |FROM region, nation, customer, orders
            |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
            | AND o_custkey = c_custkey
            | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
            |GROUP BY n_name""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 7 === 0)),
        "incremental_sql_stddev_stream_leaf")
    },

    // COUNT(DISTINCT) maintained incrementally — no extra engine
    // state: the leaf delta multiset nets per (group, value), so the
    // compiler derives it with a per-value rollup joined back on the
    // group keys.
    sql("incremental_sql_count_distinct",
      """SELECT n_name, COUNT(DISTINCT o_orderpriority) AS n_prio,
        | CAST(SUM(DISTINCT o_custkey) AS BIGINT) AS sum_cust, COUNT(*) AS n_rows
        |FROM region, nation, customer, orders
        |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        | AND o_custkey = c_custkey
        | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        | AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, COUNT(DISTINCT o_orderpriority) AS n_prio,
          | SUM(DISTINCT o_custkey) AS sum_cust, COUNT(*) AS n_rows
          |FROM region, nation, customer, orders
          |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
          | AND o_custkey = c_custkey
          | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
          |GROUP BY n_name""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 7 === 0)))
    },

    // AVG(DISTINCT) — the remaining distinct-aggregate form: same
    // per-(group, value) netting rollup as SUM/COUNT DISTINCT, exact
    // integer Σ and n over the surviving value set, ONE correctly-
    // rounded IEEE division — so retraction-exact and bit-identical
    // cross-engine.
    sql("incremental_sql_avg_distinct",
      """SELECT n_name, AVG(DISTINCT o_custkey) AS avg_cust,
        | COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_rows
        |FROM region, nation, customer, orders
        |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        | AND o_custkey = c_custkey
        | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        | AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, AVG(DISTINCT o_custkey) AS avg_cust,
          | COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_rows
          |FROM region, nation, customer, orders
          |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
          | AND o_custkey = c_custkey
          | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
          |GROUP BY n_name""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 7 === 0)))
    },

    // The per-(group, value) netting rollup over the CONTINUOUS
    // engine's streamed leaf — same oracle as
    // incremental_sql_count_distinct: a value's net count crossing
    // zero in a LATER micro-batch must remove it from the distinct set.
    sql("incremental_sql_count_distinct_stream",
      """SELECT n_name, COUNT(DISTINCT o_orderpriority) AS n_prio,
        | CAST(SUM(DISTINCT o_custkey) AS BIGINT) AS sum_cust, COUNT(*) AS n_rows
        |FROM region, nation, customer, orders
        |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        | AND o_custkey = c_custkey
        | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        | AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, COUNT(DISTINCT o_orderpriority) AS n_prio,
            | SUM(DISTINCT o_custkey) AS sum_cust, COUNT(*) AS n_rows
            |FROM region, nation, customer, orders
            |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
            | AND o_custkey = c_custkey
            | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
            |GROUP BY n_name""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 7 === 0)),
        "incremental_sql_count_distinct_stream_leaf")
    },

    // AVG(DISTINCT) on the same streamed rollup — same oracle as
    // incremental_sql_avg_distinct (exact integer Σ and n over the
    // surviving value set, one IEEE division at presentation).
    sql("incremental_sql_avg_distinct_stream",
      """SELECT n_name, AVG(DISTINCT o_custkey) AS avg_cust,
        | COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_rows
        |FROM region, nation, customer, orders
        |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        | AND o_custkey = c_custkey
        | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        | AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, AVG(DISTINCT o_custkey) AS avg_cust,
            | COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_rows
            |FROM region, nation, customer, orders
            |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
            | AND o_custkey = c_custkey
            | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
            |GROUP BY n_name""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 7 === 0)),
        "incremental_sql_avg_distinct_stream_leaf")
    },

    // Aggregate FILTER clauses — everyday SQL the compiler turns into
    // sign-weighted CASE folds (rows failing the predicate contribute
    // NULL, which every retractable aggregate handles exactly; COUNT
    // FILTER becomes a 0/1 SUM). One entry carries a FILTER on every
    // supported kind; the oracle uses DuckDB's native FILTER (CASE for
    // the DISTINCT one) so the rewrite itself is what's gated.
    sql("incremental_sql_filter",
      """SELECT n_name,
        | COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |   FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS big_rev_e2,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |   FILTER (WHERE o_orderkey % 2 = 0) AS DOUBLE)
        |   / COUNT(*) FILTER (WHERE o_orderkey % 2 = 0) AS avg_even_e2,
        | MAX(o_orderkey) FILTER (WHERE o_orderkey % 2 = 1) AS max_odd,
        | COUNT(DISTINCT CASE WHEN o_totalprice > 100000 THEN o_orderpriority END) AS n_prio_big,
        | COUNT(*) AS n_rows
        |FROM region, nation, customer, orders
        |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        | AND o_custkey = c_custkey
        | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        | AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name,
          | COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
          | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
          |   FILTER (WHERE o_totalprice > 150000) AS big_rev_e2,
          | AVG(CAST(round(o_totalprice * 100, 0) AS BIGINT))
          |   FILTER (WHERE o_orderkey % 2 = 0) AS avg_even_e2,
          | MAX(o_orderkey) FILTER (WHERE o_orderkey % 2 = 1) AS max_odd,
          | COUNT(DISTINCT o_orderpriority) FILTER (WHERE o_totalprice > 100000) AS n_prio_big,
          | COUNT(*) AS n_rows
          |FROM region, nation, customer, orders
          |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
          | AND o_custkey = c_custkey
          | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
          |GROUP BY n_name""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 7 === 0)))
    },

    // EXISTS from SQL text — the correlated subquery compiles to a
    // set-semantics key node over orders(o_custkey) gating customer's
    // changelog through an extra liveness hop (SqlCompiler gate
    // surgery); the subquery's local predicate is pushed to the orders
    // scan. Same changelog/delete schedule as the hand-built
    // incremental_exists_semi, proving text and tree agree.
    sql("incremental_sql_exists",
      """SELECT c_nationkey, COUNT(*) AS n_cust,
        | CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS acctbal_e2
        |FROM customer
        |WHERE c_custkey % 30 <> 0
        | AND EXISTS (SELECT 1 FROM orders
        |             WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
        |               AND o_orderkey % 40 <> 0)
        |GROUP BY c_nationkey""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT c_nationkey, COUNT(*) AS n_cust,
          | SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS acctbal_e2
          |FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders
          |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
          |GROUP BY c_nationkey""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 30 === 0),
          "orders" -> (col("o_orderkey") % 40 === 0)))
    },

    // NOT EXISTS from SQL text, composed WITH an outer FK tree: the
    // anti gate splices in front of customer's tree stage (base
    // changelog routes by the correlation key c_custkey, the gate
    // re-keys survivors by c_nationkey into the nation join).
    sql("incremental_sql_not_exists",
      """SELECT n_name, COUNT(*) AS n_cust,
        | CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS acctbal_e2
        |FROM nation, customer
        |WHERE c_nationkey = n_nationkey
        | AND c_custkey % 30 <> 0
        | AND NOT EXISTS (SELECT 1 FROM orders
        |                 WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
        |                   AND o_orderkey % 40 <> 0)
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, COUNT(*) AS n_cust,
          | SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS acctbal_e2
          |FROM nation, customer
          |WHERE c_nationkey = n_nationkey
          | AND NOT EXISTS (SELECT 1 FROM orders
          |                 WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
          |GROUP BY n_name""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 30 === 0),
          "orders" -> (col("o_orderkey") % 40 === 0)))
    },

    // IN (subquery) from SQL text — the projected column is the
    // matching key, the equality implicit; compiles to the same semi
    // gate. Deletes shrink the matching set (a customer leaving
    // retracts every order it admitted) and the outer side.
    sql("incremental_sql_in",
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_orderkey % 6 <> 0
        | AND o_custkey IN (SELECT c_custkey FROM customer
        |                   WHERE c_acctbal > 1000 AND c_custkey % 30 <> 0)
        |GROUP BY o_orderpriority""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT o_orderpriority, COUNT(*) AS n_orders
          |FROM orders
          |WHERE o_custkey IN (SELECT c_custkey FROM customer
          |                    WHERE c_acctbal > 1000)
          |GROUP BY o_orderpriority""".stripMargin,
        deletes = Map(
          "orders" -> (col("o_orderkey") % 6 === 0),
          "customer" -> (col("c_custkey") % 30 === 0)))
    },

    // SELF-JOIN from SQL text — one relation under two FROM aliases,
    // compiled via SqlCompiler's alias expansion (each instance becomes
    // its own virtual relation o1/o2 with prefixed columns): urgent
    // orders paired with low-priority orders of the same customer, the
    // hierarchy/pair shape a real user writes first. Plans as customer
    // (a root dimension) shared by the two instances — the
    // trunk-bucketed pair glue — with instance-independent deletes
    // retracting across the product in both directions. DuckDB runs
    // the self-join natively as the oracle.
    sql("incremental_sql_self_join",
      """SELECT c_mktsegment, COUNT(*) AS n_pairs,
        | CAST(SUM(CAST(round(o2.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS low_rev_e2
        |FROM customer, orders o1, orders o2
        |WHERE o1.o_custkey = c_custkey AND o2.o_custkey = c_custkey
        | AND o1.o_orderpriority = '1-URGENT' AND o2.o_orderpriority = '5-LOW'
        | AND o1.o_orderkey % 7 <> 0 AND o2.o_orderkey % 5 <> 0
        |GROUP BY c_mktsegment""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT c_mktsegment, COUNT(*) AS n_pairs,
          | SUM(CAST(round(o2.o_totalprice * 100, 0) AS BIGINT)) AS low_rev_e2
          |FROM customer, orders o1, orders o2
          |WHERE o1.o_custkey = c_custkey AND o2.o_custkey = c_custkey
          | AND o1.o_orderpriority = '1-URGENT' AND o2.o_orderpriority = '5-LOW'
          |GROUP BY c_mktsegment""".stripMargin,
        deletes = Map(
          "o1" -> (col("o1_o_orderkey") % 7 === 0),
          "o2" -> (col("o2_o_orderkey") % 5 === 0)))
    },

    // TWO pair stages in ONE graph — the next shape after one shared
    // dimension: nation shared by customer AND supplier (outer glue,
    // trunk-bucketed — root dim), customer shared by two orders
    // instances via self-join expansion (inner glue, customer-keyed —
    // c_custkey cardinality grows with the data, so PairOrientation
    // .Auto correctly keeps the zero-extra-shuffle routing there).
    // Deletes hit a branch of EACH glue, so retractions cross both
    // products. Five relations, six stages, DuckDB runs the quad join
    // natively as the oracle.
    sql("incremental_sql_two_pairs",
      """SELECT n_name, COUNT(*) AS n_quads,
        | CAST(SUM(CAST(round(o2.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS low_rev_e2
        |FROM nation, customer, supplier, orders o1, orders o2
        |WHERE c_nationkey = n_nationkey AND s_nationkey = n_nationkey
        | AND o1.o_custkey = c_custkey AND o2.o_custkey = c_custkey
        | AND o1.o_orderpriority = '1-URGENT' AND o2.o_orderpriority = '5-LOW'
        | AND s_acctbal >= 0
        | AND o1.o_orderkey % 7 <> 0 AND s_suppkey % 5 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, COUNT(*) AS n_quads,
          | SUM(CAST(round(o2.o_totalprice * 100, 0) AS BIGINT)) AS low_rev_e2
          |FROM nation, customer, supplier, orders o1, orders o2
          |WHERE c_nationkey = n_nationkey AND s_nationkey = n_nationkey
          | AND o1.o_custkey = c_custkey AND o2.o_custkey = c_custkey
          | AND o1.o_orderpriority = '1-URGENT' AND o2.o_orderpriority = '5-LOW'
          | AND s_acctbal >= 0
          |GROUP BY n_name""".stripMargin,
        deletes = Map(
          "o1" -> (col("o1_o_orderkey") % 7 === 0),
          "supplier" -> (col("s_suppkey") % 5 === 0)))
    },

    // The reference's FULL flagship shape — grouped aggregate + HAVING
    // + ORDER BY + LIMIT — compiled from one SQL text: the wrappers
    // are presentation over the maintained view (deterministic via the
    // c_custkey tie-break), the fold underneath is the same q10 tree.
    sql("incremental_sql_q10_full",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |HAVING COUNT(*) >= 2
         |ORDER BY revenue_e4 DESC, c_custkey
         |LIMIT 20""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        s"""SELECT c_custkey, c_name, c_acctbal, n_name,
           | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
           | COUNT(*) AS n_rows
           |FROM nation, customer, orders, lineitem
           |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           | AND c_nationkey = n_nationkey
           | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
           | AND l_returnflag = 'R'
           |GROUP BY c_custkey, c_name, c_acctbal, n_name
           |HAVING n_rows >= 2
           |ORDER BY revenue_e4 DESC, c_custkey
           |LIMIT 20""".stripMargin,
        deletes = Map(
          "lineitem" -> (col("l_linenumber") === 3),
          "orders" -> (col("o_orderkey") % 50 === 0)))
    },

    // MIN/MAX maintained via the same per-value netting — deleting
    // the current extreme must re-expose the runner-up.
    sql("incremental_sql_minmax",
      """SELECT n_name, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
        | COUNT(*) AS n_rows
        |FROM region, nation, customer, orders
        |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        | AND o_custkey = c_custkey
        | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        | AND c_custkey % 11 <> 0 AND o_totalprice <= 400000
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
          | COUNT(*) AS n_rows
          |FROM region, nation, customer, orders
          |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
          | AND o_custkey = c_custkey
          | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
          |GROUP BY n_name""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_totalprice") > 400000)))
    },

    // The per-(group, value) NETTING aggregates (MIN/MAX/MEDIAN) over
    // the CONTINUOUS engine's streamed leaf — value nets must survive
    // micro-batch boundaries (a later batch's delete re-exposes the
    // runner-up extreme / shifts the median), same oracle family as
    // the batch entries.
    sql("incremental_sql_minmax_stream",
      """SELECT n_name, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
        | quantile_disc(o_totalprice, 0.5) AS med, COUNT(*) AS n_rows
        |FROM region, nation, customer, orders
        |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        | AND o_custkey = c_custkey
        | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        | AND c_custkey % 11 <> 0 AND o_totalprice <= 400000
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
            | MEDIAN(o_totalprice) AS med, COUNT(*) AS n_rows
            |FROM region, nation, customer, orders
            |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
            | AND o_custkey = c_custkey
            | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
            |GROUP BY n_name""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_totalprice") > 400000)),
        "incremental_sql_minmax_stream_leaf")
    },

    // INCREMENTAL ROLLUP — every expanded grouping set maintained
    // independently (exact for every aggregate kind) and unioned with
    // null-padded inactive keys, against DuckDB's native ROLLUP.
    // Perf note (r10, the r9 verdict's one >40% bench move): the
    // r8→r9 1.55→2.29 s median was machine contention (the r9 bench
    // JVM also ran 3×32 scale-check passes), not a plan change —
    // profiled warm steady state at sf0.1 is ~1.4 s on unchanged
    // machinery.
    sql("incremental_sql_rollup",
      """SELECT n_name, o_orderpriority,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS price_e2,
        | COUNT(*) AS n_orders
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderkey % 6 <> 0 AND c_custkey % 9 <> 0
        |GROUP BY ROLLUP (n_name, o_orderpriority)""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, o_orderpriority,
          | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS price_e2,
          | COUNT(*) AS n_orders
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          |GROUP BY ROLLUP (n_name, o_orderpriority)""".stripMargin,
        deletes = Map(
          "orders" -> (col("o_orderkey") % 6 === 0),
          "customer" -> (col("c_custkey") % 9 === 0)))
    },

    // The ROLLUP fold over the CONTINUOUS engine's streamed leaf —
    // same oracle as incremental_sql_rollup, so a stream/batch
    // grouping-set divergence fails the hash.
    sql("incremental_sql_rollup_stream",
      """SELECT n_name, o_orderpriority,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS price_e2,
        | COUNT(*) AS n_orders
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderkey % 6 <> 0 AND c_custkey % 9 <> 0
        |GROUP BY ROLLUP (n_name, o_orderpriority)""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, o_orderpriority,
            | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS price_e2,
            | COUNT(*) AS n_orders
            |FROM nation, customer, orders
            |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
            |GROUP BY ROLLUP (n_name, o_orderpriority)""".stripMargin),
        dir, Map(
          "orders" -> (col("o_orderkey") % 6 === 0),
          "customer" -> (col("c_custkey") % 9 === 0)),
        "incremental_sql_rollup_stream_leaf")
    },

    // ROLLUP with GROUPING() disambiguation — the per-set constant
    // that separates subtotal NULLs from null-valued keys, against
    // DuckDB's native GROUPING().
    sql("incremental_sql_rollup_grouping",
      """SELECT n_name, o_orderstatus,
        | CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
        | CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        | COUNT(*) AS n_orders
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderkey % 6 <> 0
        |GROUP BY ROLLUP (n_name, o_orderstatus)""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, o_orderstatus,
          | GROUPING(n_name) AS g_nation, GROUPING(o_orderstatus) AS g_status,
          | COUNT(*) AS n_orders
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          |GROUP BY ROLLUP (n_name, o_orderstatus)""".stripMargin,
        deletes = Map("orders" -> (col("o_orderkey") % 6 === 0)))
    },

    // INCREMENTAL CUBE with COUNT(DISTINCT) — the per-value rollup
    // runs inside EVERY grouping set including the grand total (the
    // non-derivable aggregate case that re-aggregation shortcuts get
    // wrong), against DuckDB's native CUBE.
    sql("incremental_sql_cube",
      """SELECT n_name, o_orderstatus,
        | COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderkey % 6 <> 0
        |GROUP BY CUBE (n_name, o_orderstatus)""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, o_orderstatus,
          | COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          |GROUP BY CUBE (n_name, o_orderstatus)""".stripMargin,
        deletes = Map("orders" -> (col("o_orderkey") % 6 === 0)))
    },

    // The CUBE fold (with a DISTINCT aggregate riding along) over the
    // CONTINUOUS engine's streamed leaf — same oracle as
    // incremental_sql_cube, completing the grouping-set family's
    // stream/batch parity next to incremental_sql_rollup_stream.
    sql("incremental_sql_cube_stream",
      """SELECT n_name, o_orderstatus,
        | COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderkey % 6 <> 0
        |GROUP BY CUBE (n_name, o_orderstatus)""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, o_orderstatus,
            | COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
            |FROM nation, customer, orders
            |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
            |GROUP BY CUBE (n_name, o_orderstatus)""".stripMargin),
        dir, Map("orders" -> (col("o_orderkey") % 6 === 0)),
        "incremental_sql_cube_stream_leaf")
    },

    // DISCRETE MEDIAN under retraction — derives from the same
    // per-(group, value) netting rollup as MIN/MAX (deleting the
    // current median re-exposes the next value exactly); the oracle is
    // DuckDB's quantile_disc(x, 0.5), the identical lower-median
    // element selection, bit-exact even on the DOUBLE argument since
    // both engines SELECT an existing value rather than folding.
    sql("incremental_sql_median",
      """SELECT n_name, quantile_disc(o_totalprice, 0.5) AS med_price,
        | COUNT(*) AS n_rows
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderstatus = 'F'
        | AND c_custkey % 11 <> 0 AND o_orderkey % 6 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, MEDIAN(o_totalprice) AS med_price,
          | COUNT(*) AS n_rows
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          | AND o_orderstatus = 'F'
          |GROUP BY n_name""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 6 === 0)))
    },

    // MEDIAN's element selection over the CONTINUOUS engine's
    // streamed rollup — same oracle as incremental_sql_median.
    sql("incremental_sql_median_stream",
      """SELECT n_name, quantile_disc(o_totalprice, 0.5) AS med_price,
        | COUNT(*) AS n_rows
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderstatus = 'F'
        | AND c_custkey % 11 <> 0 AND o_orderkey % 6 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, MEDIAN(o_totalprice) AS med_price,
            | COUNT(*) AS n_rows
            |FROM nation, customer, orders
            |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
            | AND o_orderstatus = 'F'
            |GROUP BY n_name""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 6 === 0)),
        "incremental_sql_median_stream_leaf")
    },

    // GENERAL DISCRETE QUANTILES under retraction — MEDIAN's element
    // selection at arbitrary q: the inverted-CDF cut (smallest value
    // whose cumulative net count reaches ceil(q·n)) evaluated in exact
    // integer cross-products of the rational q, so Q1 and Q3 ride the
    // SAME per-(group, value) rollup and cumulative frame as each
    // other (one sort, two conditional MINs). Oracle = DuckDB's
    // native quantile_disc at both q's.
    sql("incremental_sql_quantile",
      """SELECT n_name, quantile_disc(o_totalprice, 0.25) AS q1_price,
        | quantile_disc(o_totalprice, 0.75) AS q3_price,
        | COUNT(*) AS n_rows
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderstatus = 'F' AND o_orderkey % 6 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, quantile_disc(o_totalprice, 0.25) AS q1_price,
          | quantile_disc(o_totalprice, 0.75) AS q3_price,
          | COUNT(*) AS n_rows
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          | AND o_orderstatus = 'F'
          |GROUP BY n_name""".stripMargin,
        deletes = Map("orders" -> (col("o_orderkey") % 6 === 0)))
    },

    // The quantile fold over the CONTINUOUS engine's streamed leaf —
    // same oracle as incremental_sql_quantile (stream/batch parity for
    // the new aggregate family).
    sql("incremental_sql_quantile_stream",
      """SELECT n_name, quantile_disc(o_totalprice, 0.25) AS q1_price,
        | quantile_disc(o_totalprice, 0.75) AS q3_price,
        | COUNT(*) AS n_rows
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderstatus = 'F' AND o_orderkey % 6 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, quantile_disc(o_totalprice, 0.25) AS q1_price,
            | quantile_disc(o_totalprice, 0.75) AS q3_price,
            | COUNT(*) AS n_rows
            |FROM nation, customer, orders
            |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
            | AND o_orderstatus = 'F'
            |GROUP BY n_name""".stripMargin),
        dir, Map("orders" -> (col("o_orderkey") % 6 === 0)),
        "incremental_sql_quantile_stream_leaf")
    },

    // MODE under retraction with a DETERMINISTIC tie rule (largest net
    // count, then smallest value): rank-1 selection over the netting
    // rollup's frequency table. DuckDB's mode() leaves ties
    // unspecified, so the oracle spells the identical window instead —
    // the tie rule is part of the operator's contract, not an
    // implementation accident.
    sql("incremental_sql_mode",
      """WITH base AS (
        | SELECT n_name, o_orderpriority
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderkey % 6 <> 0),
        |pv AS (SELECT n_name, o_orderpriority AS v, COUNT(*) AS n
        |       FROM base GROUP BY n_name, v),
        |md AS (SELECT n_name, v FROM (
        |        SELECT n_name, v,
        |         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY n DESC, v) AS rk
        |        FROM pv) WHERE rk = 1),
        |cnt AS (SELECT n_name, COUNT(*) AS n_rows FROM base GROUP BY n_name)
        |SELECT cnt.n_name, md.v AS mode_prio, n_rows
        |FROM cnt JOIN md USING (n_name)""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, mode(o_orderpriority) AS mode_prio,
          | COUNT(*) AS n_rows
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          |GROUP BY n_name""".stripMargin,
        deletes = Map("orders" -> (col("o_orderkey") % 6 === 0)))
    },

    // The mode fold over the CONTINUOUS engine's streamed leaf — same
    // oracle as incremental_sql_mode (stream/batch parity across the
    // whole new aggregate family, next to the quantile twin).
    sql("incremental_sql_mode_stream",
      """WITH base AS (
        | SELECT n_name, o_orderpriority
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderkey % 6 <> 0),
        |pv AS (SELECT n_name, o_orderpriority AS v, COUNT(*) AS n
        |       FROM base GROUP BY n_name, v),
        |md AS (SELECT n_name, v FROM (
        |        SELECT n_name, v,
        |         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY n DESC, v) AS rk
        |        FROM pv) WHERE rk = 1),
        |cnt AS (SELECT n_name, COUNT(*) AS n_rows FROM base GROUP BY n_name)
        |SELECT cnt.n_name, md.v AS mode_prio, n_rows
        |FROM cnt JOIN md USING (n_name)""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, mode(o_orderpriority) AS mode_prio,
            | COUNT(*) AS n_rows
            |FROM nation, customer, orders
            |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
            |GROUP BY n_name""".stripMargin),
        dir, Map("orders" -> (col("o_orderkey") % 6 === 0)),
        "incremental_sql_mode_stream_leaf")
    },

    // MAX_BY / MIN_BY under retraction — "which order was the
    // extreme": state is the netting rollup over the (price, orderkey)
    // PAIR, and the answer is a struct extreme, so ties on the price
    // break deterministically toward the extreme key. The oracle
    // spells the same rule as join-back-on-extreme + MAX/MIN over the
    // tied keys.
    sql("incremental_sql_argmax",
      """WITH base AS (
        | SELECT n_name, o_orderkey, o_totalprice
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderkey % 6 <> 0),
        |mx AS (SELECT n_name, MAX(o_totalprice) AS mp, MIN(o_totalprice) AS mn
        |       FROM base GROUP BY n_name)
        |SELECT base.n_name,
        | MAX(CASE WHEN o_totalprice = mp THEN o_orderkey END) AS top_order,
        | MIN(CASE WHEN o_totalprice = mn THEN o_orderkey END) AS bottom_order,
        | COUNT(*) AS n_rows
        |FROM base JOIN mx USING (n_name)
        |GROUP BY base.n_name""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, max_by(o_orderkey, o_totalprice) AS top_order,
          | min_by(o_orderkey, o_totalprice) AS bottom_order,
          | COUNT(*) AS n_rows
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          |GROUP BY n_name""".stripMargin,
        deletes = Map("orders" -> (col("o_orderkey") % 6 === 0)))
    },

    // SCALAR-SUBQUERY GATE — the above-global-average idiom as a
    // maintained view: the scalar is NONLINEAR (one input row moves
    // the average and can flip every other row's predicate), so the
    // compiler resolves it per refresh over the SURVIVOR inputs and
    // splices the literal into the orders scan filter
    // (Compiled.withScalarGatesResolved); the streaming path fences
    // it loudly. Exact-money determinism: AVG over e2 BIGINTs is an
    // exact integer sum + ONE IEEE division in both engines, and the
    // row-side comparand is an exact BIGINT below 2^53.
    sql("incremental_sql_scalar_gate",
      """WITH srv AS (SELECT * FROM orders WHERE o_orderkey % 6 <> 0),
        |a AS (SELECT AVG(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS ap FROM srv)
        |SELECT n_name, COUNT(*) AS n_big,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS big_rev_e2
        |FROM nation, customer, srv, a
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND CAST(round(o_totalprice * 100, 0) AS BIGINT) > ap
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, COUNT(*) AS n_big,
          | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS big_rev_e2
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          | AND CAST(round(o_totalprice * 100, 0) AS BIGINT) >
          |     (SELECT AVG(CAST(round(o_totalprice * 100, 0) AS BIGINT)) FROM orders)
          |GROUP BY n_name""".stripMargin,
        deletes = Map("orders" -> (col("o_orderkey") % 6 === 0)))
    },

    // The scalar gate on the CONTINUOUS engine: the gate is NONLINEAR,
    // so the streamed form resolves it ONCE against the survivor
    // inputs (Compiled.withScalarGatesResolved — the deployment
    // pattern: a periodically recomputed threshold broadcast into the
    // stream as a scan-filter literal) and then streams the gate-free
    // view. Same oracle as incremental_sql_scalar_gate: the maintained
    // state after full replay equals the batch refresh.
    sql("incremental_sql_scalar_gate_stream",
      """WITH srv AS (SELECT * FROM orders WHERE o_orderkey % 6 <> 0),
        |a AS (SELECT AVG(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS ap FROM srv)
        |SELECT n_name, COUNT(*) AS n_big,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS big_rev_e2
        |FROM nation, customer, srv, a
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND CAST(round(o_totalprice * 100, 0) AS BIGINT) > ap
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => {
        val deletes = Map("orders" -> (col("o_orderkey") % 6 === 0))
        runSqlStreamed(s, SqlCompiler.compile(s, dir,
            """SELECT n_name, COUNT(*) AS n_big,
              | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS big_rev_e2
              |FROM nation, customer, orders
              |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
              | AND CAST(round(o_totalprice * 100, 0) AS BIGINT) >
              |     (SELECT AVG(CAST(round(o_totalprice * 100, 0) AS BIGINT)) FROM orders)
              |GROUP BY n_name""".stripMargin)
            .withScalarGatesResolved(s, dir, deletes),
          dir, deletes, "incremental_sql_scalar_gate_stream_leaf")
      }
    },

    // ANALYTIC PRESENTATION over a maintained view — window functions
    // in the SELECT list compile as a post-view decoration
    // (Compiled.windowItems): the incrementally maintained aggregate
    // is the window's input frame, so each refresh ranks the
    // group-cardinality view, never the input. RANK within nation plus
    // a nation-total window aggregate, both referencing the maintained
    // alias; deterministic ties (price DESC, then priority). The
    // oracle spells the same windows over a subquery (standard SQL has
    // no lateral alias in OVER; the engine's dialect defines windows
    // over the view's output columns).
    sql("incremental_sql_window_rank",
      """WITH v AS (
        | SELECT n_name, o_orderpriority,
        |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS price_e2
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderkey % 6 <> 0
        | GROUP BY n_name, o_orderpriority)
        |SELECT n_name, o_orderpriority, price_e2,
        | RANK() OVER (PARTITION BY n_name
        |   ORDER BY price_e2 DESC, o_orderpriority) AS prio_rank,
        | CAST(SUM(price_e2) OVER (PARTITION BY n_name) AS BIGINT) AS nation_total_e2
        |FROM v""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, o_orderpriority,
          | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS price_e2,
          | RANK() OVER (PARTITION BY n_name
          |   ORDER BY price_e2 DESC, o_orderpriority) AS prio_rank,
          | SUM(price_e2) OVER (PARTITION BY n_name) AS nation_total_e2
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          |GROUP BY n_name, o_orderpriority""".stripMargin,
        deletes = Map("orders" -> (col("o_orderkey") % 6 === 0)))
    },

    // HAVING × WINDOW in SQL evaluation order over the maintained
    // view: the HAVING prefix filters groups FIRST, then the rank
    // decorates the survivors (a rank counting filtered-out groups
    // would be off by the number of dropped rows above the cut — the
    // bug the ordering machinery exists to prevent). Partitioned rank
    // (per priority), deterministic ties.
    sql("incremental_sql_having_window",
      """WITH v AS (
        | SELECT o_orderpriority, n_name, COUNT(*) AS n_orders
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderkey % 5 <> 0
        | GROUP BY o_orderpriority, n_name
        | HAVING COUNT(*) > 100)
        |SELECT o_orderpriority, n_name, n_orders,
        | RANK() OVER (PARTITION BY o_orderpriority
        |   ORDER BY n_orders DESC, n_name) AS nation_rank
        |FROM v""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT o_orderpriority, n_name, COUNT(*) AS n_orders,
          | RANK() OVER (PARTITION BY o_orderpriority
          |   ORDER BY n_orders DESC, n_name) AS nation_rank
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          |GROUP BY o_orderpriority, n_name HAVING n_orders > 100""".stripMargin,
        deletes = Map("orders" -> (col("o_orderkey") % 5 === 0)))
    },

    // HAVING × WINDOW on the CONTINUOUS engine — same oracle as
    // incremental_sql_having_window: the presentation chain (HAVING
    // prefix, then the rank decoration) recomputes per refresh over
    // the streamed maintained view, so group survival under
    // retraction must land BEFORE the rank counts them.
    sql("incremental_sql_having_window_stream",
      """WITH v AS (
        | SELECT o_orderpriority, n_name, COUNT(*) AS n_orders
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderkey % 5 <> 0
        | GROUP BY o_orderpriority, n_name
        | HAVING COUNT(*) > 100)
        |SELECT o_orderpriority, n_name, n_orders,
        | RANK() OVER (PARTITION BY o_orderpriority
        |   ORDER BY n_orders DESC, n_name) AS nation_rank
        |FROM v""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT o_orderpriority, n_name, COUNT(*) AS n_orders,
            | RANK() OVER (PARTITION BY o_orderpriority
            |   ORDER BY n_orders DESC, n_name) AS nation_rank
            |FROM nation, customer, orders
            |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
            |GROUP BY o_orderpriority, n_name HAVING n_orders > 100""".stripMargin),
        dir, Map("orders" -> (col("o_orderkey") % 5 === 0)),
        "incremental_sql_having_window_stream_leaf")
    },

    // The windowed view over the CONTINUOUS engine's streamed leaf —
    // same oracle as incremental_sql_window_rank (the decoration
    // recomputes per micro-batch over the maintained view).
    sql("incremental_sql_window_rank_stream",
      """WITH v AS (
        | SELECT n_name, o_orderpriority,
        |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS price_e2
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderkey % 6 <> 0
        | GROUP BY n_name, o_orderpriority)
        |SELECT n_name, o_orderpriority, price_e2,
        | RANK() OVER (PARTITION BY n_name
        |   ORDER BY price_e2 DESC, o_orderpriority) AS prio_rank,
        | CAST(SUM(price_e2) OVER (PARTITION BY n_name) AS BIGINT) AS nation_total_e2
        |FROM v""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, o_orderpriority,
            | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS price_e2,
            | RANK() OVER (PARTITION BY n_name
            |   ORDER BY price_e2 DESC, o_orderpriority) AS prio_rank,
            | SUM(price_e2) OVER (PARTITION BY n_name) AS nation_total_e2
            |FROM nation, customer, orders
            |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
            |GROUP BY n_name, o_orderpriority""".stripMargin),
        dir, Map("orders" -> (col("o_orderkey") % 6 === 0)),
        "incremental_sql_window_rank_stream_leaf")
    },

    // The pair-rollup fold over the CONTINUOUS engine's streamed
    // leaf — same oracle as incremental_sql_argmax, closing the
    // stream/batch parity for the whole new aggregate family
    // (quantile, mode, max_by/min_by).
    sql("incremental_sql_argmax_stream",
      """WITH base AS (
        | SELECT n_name, o_orderkey, o_totalprice
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderkey % 6 <> 0),
        |mx AS (SELECT n_name, MAX(o_totalprice) AS mp, MIN(o_totalprice) AS mn
        |       FROM base GROUP BY n_name)
        |SELECT base.n_name,
        | MAX(CASE WHEN o_totalprice = mp THEN o_orderkey END) AS top_order,
        | MIN(CASE WHEN o_totalprice = mn THEN o_orderkey END) AS bottom_order,
        | COUNT(*) AS n_rows
        |FROM base JOIN mx USING (n_name)
        |GROUP BY base.n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, max_by(o_orderkey, o_totalprice) AS top_order,
            | min_by(o_orderkey, o_totalprice) AS bottom_order,
            | COUNT(*) AS n_rows
            |FROM nation, customer, orders
            |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
            |GROUP BY n_name""".stripMargin),
        dir, Map("orders" -> (col("o_orderkey") % 6 === 0)),
        "incremental_sql_argmax_stream_leaf")
    },

    // GROUP BY expressions compiled from text: a COMPUTED grouping key
    // (calendar year) evaluates over the typed leaf deltas — grouping
    // is no longer limited to stored columns. The oracle wraps the SUM
    // in CAST(... AS BIGINT) (DuckDB SUM(BIGINT) returns HUGEINT);
    // Spark's sum(BIGINT) is already BIGINT, so the compiled text keeps
    // the bare SUM.
    sql("incremental_sql_group_expr",
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS price_e2,
        | COUNT(*) AS n_orders
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderkey % 4 <> 0
        |GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
          | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS price_e2,
          | COUNT(*) AS n_orders
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          |GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)""".stripMargin,
        deletes = Map("orders" -> (col("o_orderkey") % 4 === 0)))
    },

    // VIEW MODE (bag): a SELECT with no aggregate maintains the JOIN
    // ITSELF — the leaf deltas net per selected tuple and the view
    // restores SQL bag multiplicity by net-count explode. The selected
    // pair (n_name, o_orderpriority) is deliberately low-cardinality so
    // most net counts are way above 1: the multiplicity machinery, not
    // just survivorship, is what the row-count+hash compare checks.
    sql("incremental_sql_join_view",
      """SELECT n_name, o_orderpriority
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderstatus = 'F'
        | AND o_orderkey % 10 <> 0 AND c_custkey % 13 <> 0""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, o_orderpriority
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          | AND o_orderstatus = 'F'""".stripMargin,
        deletes = Map(
          "orders" -> (col("o_orderkey") % 10 === 0),
          "customer" -> (col("c_custkey") % 13 === 0)))
    },

    // SELECT * — the first query a real user types: the star expands
    // to the FROM relations' columns (schema order, FROM order; the
    // FK graph's bare-name uniqueness makes it unambiguous) and the
    // FULL-WIDTH join view is maintained. Every column type rides the
    // canonical row's string codec (BIGINT, VARCHAR and the DOUBLE
    // c_acctbal — Java's toString/parse roundtrip is exact).
    sql("incremental_sql_select_star",
      """SELECT * FROM nation JOIN customer ON c_nationkey = n_nationkey
        |WHERE c_custkey % 13 <> 0""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        "SELECT * FROM nation JOIN customer ON c_nationkey = n_nationkey",
        deletes = Map("customer" -> (col("c_custkey") % 13 === 0)))
    },

    // … through the CONTINUOUS engine, same oracle.
    sql("incremental_sql_select_star_stream",
      """SELECT * FROM nation JOIN customer ON c_nationkey = n_nationkey
        |WHERE c_custkey % 13 <> 0""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          "SELECT * FROM nation JOIN customer ON c_nationkey = n_nationkey"),
        dir, Map("customer" -> (col("c_custkey") % 13 === 0)),
        "incremental_sql_select_star_stream_leaf")
    },

    // QUALIFIED star (n.*) resolving through a table alias, mixed with
    // an explicit column — DuckDB runs the identical spelling.
    sql("incremental_sql_select_star_qualified",
      """SELECT c_mktsegment, n.*
        |FROM nation n JOIN customer c ON c_nationkey = n_nationkey
        |WHERE c_custkey % 13 <> 0""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT c_mktsegment, n.*
          |FROM nation n JOIN customer c ON c_nationkey = n_nationkey""".stripMargin,
        deletes = Map("customer" -> (col("c_custkey") % 13 === 0)))
    },

    // … through the CONTINUOUS engine, same oracle.
    sql("incremental_sql_select_star_qualified_stream",
      """SELECT c_mktsegment, n.*
        |FROM nation n JOIN customer c ON c_nationkey = n_nationkey
        |WHERE c_custkey % 13 <> 0""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT c_mktsegment, n.*
            |FROM nation n JOIN customer c ON c_nationkey = n_nationkey""".stripMargin),
        dir, Map("customer" -> (col("c_custkey") % 13 === 0)),
        "incremental_sql_select_star_qualified_stream_leaf")
    },

    // VIEW MODE through the CONTINUOUS engine — same oracle as
    // incremental_sql_join_view, so stream/batch view divergence
    // fails the hash.
    sql("incremental_sql_view_stream",
      """SELECT n_name, o_orderpriority
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderstatus = 'F'
        | AND o_orderkey % 10 <> 0 AND c_custkey % 13 <> 0""".stripMargin)(
      incrementalSqlViewStream),

    // VIEW MODE (set): SELECT DISTINCT over the same tree — the
    // maintained set view (net > 0 = present), no multiplicity.
    sql("incremental_sql_distinct_view",
      """SELECT DISTINCT n_name, o_orderpriority, o_orderstatus
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderkey % 10 <> 0 AND c_custkey % 13 <> 0""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT DISTINCT n_name, o_orderpriority, o_orderstatus
          |FROM nation, customer, orders
          |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey""".stripMargin,
        deletes = Map(
          "orders" -> (col("o_orderkey") % 10 === 0),
          "customer" -> (col("c_custkey") % 13 === 0)))
    },

    // BRANCHING tree (multi-parent lineitem: orders-chain AND part) —
    // the AJU capability beyond a chain. The oracle is the plain-SQL
    // survivors query over the five-way join with deletes excluded on
    // both branches.
    sql("incremental_part_revenue",
      s"""SELECT n_name, p_brand,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM nation, customer, orders, lineitem, part
         |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
         | AND l_orderkey = o_orderkey AND l_partkey = p_partkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R' AND p_size <= 25
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0 AND p_partkey % 10 <> 0
         |GROUP BY n_name, p_brand""".stripMargin)(incrementalPartRevenue),

    // SHARED DIMENSION (many-to-many): nation referenced by both the
    // customer→orders trunk and the supplier branch. The maintained
    // aggregate folds signed PAIR deltas — every (order, supplier)
    // pair of a nation — against the plain-SQL survivors oracle, with
    // deletes on both sides of the product.
    sql("incremental_shared_dim",
      s"""SELECT n_name,
         | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_e2,
         | COUNT(*) AS n_pairs
         |FROM nation, customer, orders, supplier
         |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
         | AND s_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND o_orderkey % 7 <> 0 AND s_suppkey % 5 <> 0 AND s_acctbal >= 0
         |GROUP BY n_name""".stripMargin)(incrementalSharedRevenue),

    // The dimension-keyed plan trunk-bucketed by the EXPLICIT
    // swapPairOrientation API (S = 8) behind the SAME oracle — both
    // construction paths to the bucketed product must be
    // answer-invariant. (The default incremental_shared_dim plan is
    // already trunk-bucketed via PairOrientation.Auto.)
    sql("incremental_shared_dim_salted",
      s"""SELECT n_name,
         | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_e2,
         | COUNT(*) AS n_pairs
         |FROM nation, customer, orders, supplier
         |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
         | AND s_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND o_orderkey % 7 <> 0 AND s_suppkey % 5 <> 0 AND s_acctbal >= 0
         |GROUP BY n_name""".stripMargin)(incrementalSharedRevenueSalted),

    // The CONTINUOUS pair stage itself (runStreamTree micro-batches,
    // state across batches) behind the same survivors oracle.
    sql("incremental_shared_dim_stream",
      s"""SELECT n_name,
         | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_e2,
         | COUNT(*) AS n_pairs
         |FROM nation, customer, orders, supplier
         |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
         | AND s_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND o_orderkey % 7 <> 0 AND s_suppkey % 5 <> 0 AND s_acctbal >= 0
         |GROUP BY n_name""".stripMargin)(incrementalSharedStream),

    // The pair stage on transformWithState — same replay, same
    // survivors oracle; with incremental_q10_tws this puts the whole
    // stage vocabulary (liveness AND pair) on the supported
    // arbitrary-state API.
    sql("incremental_shared_dim_tws",
      s"""SELECT n_name,
         | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_e2,
         | COUNT(*) AS n_pairs
         |FROM nation, customer, orders, supplier
         |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
         | AND s_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND o_orderkey % 7 <> 0 AND s_suppkey % 5 <> 0 AND s_acctbal >= 0
         |GROUP BY n_name""".stripMargin)(incrementalSharedTws),

    // The SAME shared-dimension query compiled FROM SQL TEXT.
    sql("incremental_sql_shared_dim",
      s"""SELECT n_name,
         | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_e2,
         | COUNT(*) AS n_pairs
         |FROM nation, customer, orders, supplier
         |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
         | AND s_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND o_orderkey % 7 <> 0 AND s_suppkey % 5 <> 0 AND s_acctbal >= 0
         |GROUP BY n_name""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        s"""SELECT n_name,
           | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS revenue_e2,
           | COUNT(*) AS n_pairs
           |FROM nation, customer, orders, supplier
           |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
           | AND s_nationkey = n_nationkey
           | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
           | AND s_acctbal >= 0
           |GROUP BY n_name""".stripMargin,
        deletes = Map(
          "orders" -> (col("o_orderkey") % 7 === 0),
          "supplier" -> (col("s_suppkey") % 5 === 0)))
    },

    // Shared dimension WITH a parent above it: region's liveness
    // threads through the trunk (region→nation→customer) before the
    // supplier product — five relations, one pair glue, compiled from
    // text.
    sql("incremental_sql_shared_parent",
      """SELECT n_name,
        | CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sbal_e2,
        | COUNT(*) AS n_pairs
        |FROM region, nation, customer, supplier
        |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        | AND s_nationkey = n_nationkey
        | AND r_name <> 'ASIA' AND c_custkey % 6 <> 0 AND s_suppkey % 5 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name,
          | SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS sbal_e2,
          | COUNT(*) AS n_pairs
          |FROM region, nation, customer, supplier
          |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
          | AND s_nationkey = n_nationkey AND r_name <> 'ASIA'
          |GROUP BY n_name""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 6 === 0),
          "supplier" -> (col("s_suppkey") % 5 === 0)))
    },

    // The SAME branching query compiled FROM SQL TEXT: SqlCompiler
    // linearizes the multi-parent lineitem into per-FK stages.
    sql("incremental_sql_part_revenue",
      s"""SELECT n_name, p_brand,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM nation, customer, orders, lineitem, part
         |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
         | AND l_orderkey = o_orderkey AND l_partkey = p_partkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R' AND p_size <= 25
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0 AND p_partkey % 10 <> 0
         |GROUP BY n_name, p_brand""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        s"""SELECT n_name, p_brand,
           | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
           | COUNT(*) AS n_rows
           |FROM nation, customer, orders, lineitem, part
           |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
           | AND l_orderkey = o_orderkey AND l_partkey = p_partkey
           | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
           | AND l_returnflag = 'R' AND p_size <= 25
           |GROUP BY n_name, p_brand""".stripMargin,
        deletes = Map(
          "lineitem" -> (col("l_linenumber") === 3),
          "orders" -> (col("o_orderkey") % 50 === 0),
          "part" -> (col("p_partkey") % 10 === 0)))
    }) ++ streamTwinDefs

  // ROUND 12: the stream-twin completion — every remaining batch-only
  // compiled view gains a CONTINUOUS sibling on the generic
  // [[runSqlStreamed]] machinery, gated against the SAME oracle as its
  // batch twin (shared SQL text), so any stream/batch divergence fails
  // the hash. The changelog surface is this engine's identity: a view
  // that can only batch-refresh is half a view.
  private def streamTwinDefs: Seq[GraftQuery] = Seq(

    // The FULL flagship decoration chain (HAVING + ORDER BY + LIMIT)
    // over the CONTINUOUS engine's streamed leaf — the presentation
    // wrappers run per refresh over the group-cardinality view, the
    // fold underneath replays as micro-batches.
    sql("incremental_sql_q10_full_stream",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |HAVING COUNT(*) >= 2
         |ORDER BY revenue_e4 DESC, c_custkey
         |LIMIT 20""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          s"""SELECT c_custkey, c_name, c_acctbal, n_name,
             | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
             | COUNT(*) AS n_rows
             |FROM nation, customer, orders, lineitem
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             | AND c_nationkey = n_nationkey
             | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
             | AND l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, c_acctbal, n_name
             |HAVING n_rows >= 2
             |ORDER BY revenue_e4 DESC, c_custkey
             |LIMIT 20""".stripMargin),
        dir, Map(
          "lineitem" -> (col("l_linenumber") === 3),
          "orders" -> (col("o_orderkey") % 50 === 0)),
        "incremental_sql_q10_full_stream_leaf")
    },

    // The BRANCHING (multi-parent lineitem) compiled tree streamed —
    // both parents' liveness flips propagate to the same leaf state
    // across micro-batches.
    sql("incremental_sql_part_revenue_stream",
      s"""SELECT n_name, p_brand,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM nation, customer, orders, lineitem, part
         |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
         | AND l_orderkey = o_orderkey AND l_partkey = p_partkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R' AND p_size <= 25
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0 AND p_partkey % 10 <> 0
         |GROUP BY n_name, p_brand""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          s"""SELECT n_name, p_brand,
             | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
             | COUNT(*) AS n_rows
             |FROM nation, customer, orders, lineitem, part
             |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
             | AND l_orderkey = o_orderkey AND l_partkey = p_partkey
             | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
             | AND l_returnflag = 'R' AND p_size <= 25
             |GROUP BY n_name, p_brand""".stripMargin),
        dir, Map(
          "lineitem" -> (col("l_linenumber") === 3),
          "orders" -> (col("o_orderkey") % 50 === 0),
          "part" -> (col("p_partkey") % 10 === 0)),
        "incremental_sql_part_revenue_stream_leaf")
    },

    // The compiled PAIR-GLUE (shared dimension) streamed through the
    // SQL path — the tree-API twin (incremental_shared_dim_stream)
    // already exists; this one proves the COMPILER's stage layout
    // streams too.
    sql("incremental_sql_shared_dim_stream",
      s"""SELECT n_name,
         | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_e2,
         | COUNT(*) AS n_pairs
         |FROM nation, customer, orders, supplier
         |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
         | AND s_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND o_orderkey % 7 <> 0 AND s_suppkey % 5 <> 0 AND s_acctbal >= 0
         |GROUP BY n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          s"""SELECT n_name,
             | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS revenue_e2,
             | COUNT(*) AS n_pairs
             |FROM nation, customer, orders, supplier
             |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
             | AND s_nationkey = n_nationkey
             | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
             | AND s_acctbal >= 0
             |GROUP BY n_name""".stripMargin),
        dir, Map(
          "orders" -> (col("o_orderkey") % 7 === 0),
          "supplier" -> (col("s_suppkey") % 5 === 0)),
        "incremental_sql_shared_dim_stream_leaf")
    },

    // Shared dimension WITH an ancestor above the trunk, streamed —
    // region's liveness threads through the pair glue across
    // micro-batches.
    sql("incremental_sql_shared_parent_stream",
      """SELECT n_name,
        | CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sbal_e2,
        | COUNT(*) AS n_pairs
        |FROM region, nation, customer, supplier
        |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        | AND s_nationkey = n_nationkey
        | AND r_name <> 'ASIA' AND c_custkey % 6 <> 0 AND s_suppkey % 5 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name,
            | SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS sbal_e2,
            | COUNT(*) AS n_pairs
            |FROM region, nation, customer, supplier
            |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
            | AND s_nationkey = n_nationkey AND r_name <> 'ASIA'
            |GROUP BY n_name""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 6 === 0),
          "supplier" -> (col("s_suppkey") % 5 === 0)),
        "incremental_sql_shared_parent_stream_leaf")
    },

    // BOTH glue kinds in one streamed graph: the nation pair stage and
    // the self-join customer pair, with deletes crossing each product.
    sql("incremental_sql_two_pairs_stream",
      """SELECT n_name, COUNT(*) AS n_quads,
        | CAST(SUM(CAST(round(o2.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS low_rev_e2
        |FROM nation, customer, supplier, orders o1, orders o2
        |WHERE c_nationkey = n_nationkey AND s_nationkey = n_nationkey
        | AND o1.o_custkey = c_custkey AND o2.o_custkey = c_custkey
        | AND o1.o_orderpriority = '1-URGENT' AND o2.o_orderpriority = '5-LOW'
        | AND s_acctbal >= 0
        | AND o1.o_orderkey % 7 <> 0 AND s_suppkey % 5 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, COUNT(*) AS n_quads,
            | SUM(CAST(round(o2.o_totalprice * 100, 0) AS BIGINT)) AS low_rev_e2
            |FROM nation, customer, supplier, orders o1, orders o2
            |WHERE c_nationkey = n_nationkey AND s_nationkey = n_nationkey
            | AND o1.o_custkey = c_custkey AND o2.o_custkey = c_custkey
            | AND o1.o_orderpriority = '1-URGENT' AND o2.o_orderpriority = '5-LOW'
            | AND s_acctbal >= 0
            |GROUP BY n_name""".stripMargin),
        dir, Map(
          "o1" -> (col("o1_o_orderkey") % 7 === 0),
          "supplier" -> (col("s_suppkey") % 5 === 0)),
        "incremental_sql_two_pairs_stream_leaf")
    },

    // The SQL-text self-join streamed — each aliased instance is its
    // own changelog identity; instance-independent deletes retract
    // across the pair product through held state.
    sql("incremental_sql_self_join_stream",
      """SELECT c_mktsegment, COUNT(*) AS n_pairs,
        | CAST(SUM(CAST(round(o2.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS low_rev_e2
        |FROM customer, orders o1, orders o2
        |WHERE o1.o_custkey = c_custkey AND o2.o_custkey = c_custkey
        | AND o1.o_orderpriority = '1-URGENT' AND o2.o_orderpriority = '5-LOW'
        | AND o1.o_orderkey % 7 <> 0 AND o2.o_orderkey % 5 <> 0
        |GROUP BY c_mktsegment""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT c_mktsegment, COUNT(*) AS n_pairs,
            | SUM(CAST(round(o2.o_totalprice * 100, 0) AS BIGINT)) AS low_rev_e2
            |FROM customer, orders o1, orders o2
            |WHERE o1.o_custkey = c_custkey AND o2.o_custkey = c_custkey
            | AND o1.o_orderpriority = '1-URGENT' AND o2.o_orderpriority = '5-LOW'
            |GROUP BY c_mktsegment""".stripMargin),
        dir, Map(
          "o1" -> (col("o1_o_orderkey") % 7 === 0),
          "o2" -> (col("o2_o_orderkey") % 5 === 0)),
        "incremental_sql_self_join_stream_leaf")
    },

    // The maintained BAG VIEW streamed under the batch entry's own
    // name family (incremental_sql_view_stream predates the twin
    // naming convention; this sibling closes the name-matched matrix).
    sql("incremental_sql_join_view_stream",
      """SELECT n_name, o_orderpriority
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderstatus = 'F'
        | AND o_orderkey % 10 <> 0 AND c_custkey % 13 <> 0""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, o_orderpriority
            |FROM nation, customer, orders
            |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
            | AND o_orderstatus = 'F'""".stripMargin),
        dir, Map(
          "orders" -> (col("o_orderkey") % 10 === 0),
          "customer" -> (col("c_custkey") % 13 === 0)),
        "incremental_sql_join_view_stream_leaf")
    },

    // The maintained SET VIEW (SELECT DISTINCT) streamed — presence
    // flips (net > 0) assert and retract across micro-batches.
    sql("incremental_sql_distinct_view_stream",
      """SELECT DISTINCT n_name, o_orderpriority, o_orderstatus
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderkey % 10 <> 0 AND c_custkey % 13 <> 0""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT DISTINCT n_name, o_orderpriority, o_orderstatus
            |FROM nation, customer, orders
            |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey""".stripMargin),
        dir, Map(
          "orders" -> (col("o_orderkey") % 10 === 0),
          "customer" -> (col("c_custkey") % 13 === 0)),
        "incremental_sql_distinct_view_stream_leaf")
    },

    // RIGHT JOIN (parsed as the mirrored LEFT) streamed — the
    // NULL-extension anti plan holds state across micro-batches.
    sql("incremental_sql_q10_right_stream",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM nation
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |LEFT JOIN lineitem ON l_orderkey = o_orderkey AND l_returnflag = 'R'
         | AND l_linenumber <> 3
         |WHERE o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          s"""SELECT c_custkey, c_name, c_acctbal, n_name,
             | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
             | COUNT(*) AS n_rows
             |FROM lineitem
             |RIGHT JOIN (nation
             | JOIN customer ON c_nationkey = n_nationkey
             | JOIN orders ON o_custkey = c_custkey)
             | ON l_orderkey = o_orderkey AND l_returnflag = 'R'
             |WHERE o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
             |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin),
        dir, q10OuterDeletes, "incremental_sql_q10_right_stream_leaf")
    },

    // The BLOOM-REDUCED compiled tree streamed: the leaf changelog is
    // pre-filtered by a STATIC bloom built from the parent's key
    // universe before entering the stream — the standard deployment
    // shape for a pre-built reduction filter — and the reduction must
    // be answer-invariant through the replay (same oracle as
    // incremental_sql_q10).
    sql("incremental_sql_q10_bloom_stream",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin) {
      (s, dir) =>
        val ss = s.newSession()
        ss.conf.set(BloomPrefilterConf, "true")
        runSqlStreamed(ss, SqlCompiler.compile(ss, dir,
            s"""SELECT c_custkey, c_name, c_acctbal, n_name,
               | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
               | COUNT(*) AS n_rows
               |FROM nation, customer, orders, lineitem
               |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
               | AND c_nationkey = n_nationkey
               | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
               | AND l_returnflag = 'R'
               |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin),
          dir, Map(
            "lineitem" -> (col("l_linenumber") === 3),
            "orders" -> (col("o_orderkey") % 50 === 0)),
          "incremental_sql_q10_bloom_stream_leaf",
          transformLogs = logs => bloomPrefilterChild(logs,
            parentRel = "orders", parentChildKey = "o_orderkey",
            childRel = "lineitem", expectedItems = 200000L, fpp = 0.01))
    },

    // The SALTED compiled tree streamed: the salt widening is baked
    // into the stages at COMPILE time (own events bucket by row hash,
    // liveness deltas replicate ×8), so the identical stage list runs
    // on the streaming tree runner — de-skew must be answer-invariant
    // through micro-batch replay too.
    sql("incremental_sql_q10_salted_stream",
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4,
         | COUNT(*) AS n_rows
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         | AND c_nationkey = n_nationkey
         | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
         | AND l_returnflag = 'R'
         | AND l_linenumber <> 3 AND o_orderkey % 50 <> 0
         |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin) {
      (s, dir) =>
        val ss = s.newSession()
        ss.conf.set(SaltRelationConf, "lineitem")
        ss.conf.set(SaltWidthConf, "8")
        runSqlStreamed(ss, SqlCompiler.compile(ss, dir,
            s"""SELECT c_custkey, c_name, c_acctbal, n_name,
               | SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS revenue_e4,
               | COUNT(*) AS n_rows
               |FROM nation, customer, orders, lineitem
               |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
               | AND c_nationkey = n_nationkey
               | AND o_orderdate >= TIMESTAMP '$dateLo' AND o_orderdate < TIMESTAMP '$dateHi'
               | AND l_returnflag = 'R'
               |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin),
          dir, Map(
            "lineitem" -> (col("l_linenumber") === 3),
            "orders" -> (col("o_orderkey") % 50 === 0)),
          "incremental_sql_q10_salted_stream_leaf")
    },

    // The aggregate FILTER clause family streamed — per-clause signed
    // folds (conditional sums, the distinct-value rollup) across
    // micro-batches.
    sql("incremental_sql_filter_stream",
      """SELECT n_name,
        | COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |   FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS big_rev_e2,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |   FILTER (WHERE o_orderkey % 2 = 0) AS DOUBLE)
        |   / COUNT(*) FILTER (WHERE o_orderkey % 2 = 0) AS avg_even_e2,
        | MAX(o_orderkey) FILTER (WHERE o_orderkey % 2 = 1) AS max_odd,
        | COUNT(DISTINCT CASE WHEN o_totalprice > 100000 THEN o_orderpriority END) AS n_prio_big,
        | COUNT(*) AS n_rows
        |FROM region, nation, customer, orders
        |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        | AND o_custkey = c_custkey
        | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        | AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name,
            | COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
            | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
            |   FILTER (WHERE o_totalprice > 150000) AS big_rev_e2,
            | AVG(CAST(round(o_totalprice * 100, 0) AS BIGINT))
            |   FILTER (WHERE o_orderkey % 2 = 0) AS avg_even_e2,
            | MAX(o_orderkey) FILTER (WHERE o_orderkey % 2 = 1) AS max_odd,
            | COUNT(DISTINCT o_orderpriority) FILTER (WHERE o_totalprice > 100000) AS n_prio_big,
            | COUNT(*) AS n_rows
            |FROM region, nation, customer, orders
            |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
            | AND o_custkey = c_custkey
            | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
            |GROUP BY n_name""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 7 === 0)),
        "incremental_sql_filter_stream_leaf")
    },

    // AVG's retractable SUM/COUNT pair streamed — exact integral folds
    // across micro-batches, one double division per group at read.
    sql("incremental_sql_avg_stream",
      """SELECT n_name,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
        |   / COUNT(*) AS avg_price_e2,
        | COUNT(*) AS n_rows
        |FROM region, nation, customer, orders
        |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        | AND o_custkey = c_custkey
        | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
        | AND c_custkey % 11 <> 0 AND o_orderkey % 7 <> 0
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name,
            | AVG(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS avg_price_e2,
            | COUNT(*) AS n_rows
            |FROM region, nation, customer, orders
            |WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
            | AND o_custkey = c_custkey
            | AND r_name <> 'AFRICA' AND o_orderstatus = 'F'
            |GROUP BY n_name""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 11 === 0),
          "orders" -> (col("o_orderkey") % 7 === 0)),
        "incremental_sql_avg_stream_leaf")
    },

    // COMPUTED grouping keys streamed — the year() expression
    // evaluates over the typed leaf deltas per micro-batch.
    sql("incremental_sql_group_expr_stream",
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS price_e2,
        | COUNT(*) AS n_orders
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderkey % 4 <> 0
        |GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
            | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS price_e2,
            | COUNT(*) AS n_orders
            |FROM nation, customer, orders
            |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
            |GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)""".stripMargin),
        dir, Map("orders" -> (col("o_orderkey") % 4 === 0)),
        "incremental_sql_group_expr_stream_leaf")
    },

    // The EXISTS semi gate streamed — the subquery's set-semantics key
    // node and the liveness hop hold state across micro-batches, so a
    // late order insert must re-admit its customer (and a delete
    // re-evict it).
    sql("incremental_sql_exists_stream",
      """SELECT c_nationkey, COUNT(*) AS n_cust,
        | CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS acctbal_e2
        |FROM customer
        |WHERE c_custkey % 30 <> 0
        | AND EXISTS (SELECT 1 FROM orders
        |             WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
        |               AND o_orderkey % 40 <> 0)
        |GROUP BY c_nationkey""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT c_nationkey, COUNT(*) AS n_cust,
            | SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS acctbal_e2
            |FROM customer
            |WHERE EXISTS (SELECT 1 FROM orders
            |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
            |GROUP BY c_nationkey""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 30 === 0),
          "orders" -> (col("o_orderkey") % 40 === 0)),
        "incremental_sql_exists_stream_leaf")
    },

    // The NOT EXISTS anti gate composed with an outer FK tree,
    // streamed — an order insert must EVICT its customer from the
    // view (and the order's later delete re-admit it) through held
    // state.
    sql("incremental_sql_not_exists_stream",
      """SELECT n_name, COUNT(*) AS n_cust,
        | CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS acctbal_e2
        |FROM nation, customer
        |WHERE c_nationkey = n_nationkey
        | AND c_custkey % 30 <> 0
        | AND NOT EXISTS (SELECT 1 FROM orders
        |                 WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
        |                   AND o_orderkey % 40 <> 0)
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, COUNT(*) AS n_cust,
            | SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS acctbal_e2
            |FROM nation, customer
            |WHERE c_nationkey = n_nationkey
            | AND NOT EXISTS (SELECT 1 FROM orders
            |                 WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
            |GROUP BY n_name""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 30 === 0),
          "orders" -> (col("o_orderkey") % 40 === 0)),
        "incremental_sql_not_exists_stream_leaf")
    },

    // IN (subquery) streamed — the matching-set gate's admissions and
    // evictions replay as micro-batches (a customer delete retracts
    // every order it admitted).
    sql("incremental_sql_in_stream",
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_orderkey % 6 <> 0
        | AND o_custkey IN (SELECT c_custkey FROM customer
        |                   WHERE c_acctbal > 1000 AND c_custkey % 30 <> 0)
        |GROUP BY o_orderpriority""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT o_orderpriority, COUNT(*) AS n_orders
            |FROM orders
            |WHERE o_custkey IN (SELECT c_custkey FROM customer
            |                    WHERE c_acctbal > 1000)
            |GROUP BY o_orderpriority""".stripMargin),
        dir, Map(
          "orders" -> (col("o_orderkey") % 6 === 0),
          "customer" -> (col("c_custkey") % 30 === 0)),
        "incremental_sql_in_stream_leaf")
    },

    // ROLLUP with GROUPING() flags streamed — the per-set constants
    // decorate the streamed grouping-set fold.
    sql("incremental_sql_rollup_grouping_stream",
      """SELECT n_name, o_orderstatus,
        | CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
        | CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        | COUNT(*) AS n_orders
        |FROM nation, customer, orders
        |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        | AND o_orderkey % 6 <> 0
        |GROUP BY ROLLUP (n_name, o_orderstatus)""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, o_orderstatus,
            | GROUPING(n_name) AS g_nation, GROUPING(o_orderstatus) AS g_status,
            | COUNT(*) AS n_orders
            |FROM nation, customer, orders
            |WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
            |GROUP BY ROLLUP (n_name, o_orderstatus)""".stripMargin),
        dir, Map("orders" -> (col("o_orderkey") % 6 === 0)),
        "incremental_sql_rollup_grouping_stream_leaf")
    },

    // The two-boundary FIND-THE-ORPHANS reading streamed: only the
    // three selected orphan-class plans run (suppressMainLeaf — the
    // inner tree is never built), their state holding across
    // micro-batches; same oracle as the batch _isnull entry.
    sql("incremental_sql_q10_fullouter_two_boundary_isnull_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_linenumber <> 3)
        |SELECT o_orderpriority, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN o ON o_custkey = c_custkey
        |FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE c_custkey IS NULL AND l_returnflag = 'R'
        |GROUP BY o_orderpriority""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT o_orderpriority, COUNT(*) AS n_rows,
            | SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS rev_e2
            |FROM nation
            |JOIN customer ON c_nationkey = n_nationkey
            |FULL OUTER JOIN orders ON o_custkey = c_custkey
            |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
            |WHERE c_custkey IS NULL AND l_returnflag = 'R'
            |GROUP BY o_orderpriority""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "orders" -> (col("o_orderkey") % 50 === 0),
          "lineitem" -> (col("l_linenumber") === 3)),
        "incremental_sql_q10_fullouter_two_boundary_isnull_stream_leaf")
    }) ++ round12Defs

  private def starFullOuterSql =
    """SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
      | SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS sbal_e2
      |FROM nation
      |FULL OUTER JOIN customer ON c_nationkey = n_nationkey
      |FULL OUTER JOIN supplier ON s_nationkey = n_nationkey
      |GROUP BY n_name, c_mktsegment""".stripMargin

  private def starFullOuterOracle =
    """WITH n AS (SELECT * FROM nation WHERE n_nationkey % 7 <> 0),
      |     c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
      |     s AS (SELECT * FROM supplier WHERE s_suppkey % 5 <> 0)
      |SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
      | CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sbal_e2
      |FROM n FULL JOIN c ON c_nationkey = n_nationkey
      |FULL JOIN s ON s_nationkey = n_nationkey
      |GROUP BY n_name, c_mktsegment""".stripMargin

  private def starFullOuterDeletes = Map(
    "nation" -> (col("n_nationkey") % 7 === 0),
    "customer" -> (col("c_custkey") % 13 === 0),
    "supplier" -> (col("s_suppkey") % 5 === 0))

  // PAIR-STAR fixtures: the boundary fact tables shrink via RELATION
  // OVERRIDES (urgent orders, quantity ≤ 2 lineitems — compileOver's
  // loader seam, mirroring the oracle's CTE pre-filters): expressing
  // the restriction as WHERE would NULL-reject the preservation
  // classes, and expressing it as changelog DELETES makes the replay
  // materialize the UNSHRUNK per-(customer, supplier) double product
  // before retracting 90% of it — quadratic in fact size (it OOMed a
  // sf0.01 stream replay). Deletes stay on all four non-dim relations
  // for the retraction dynamics the entry exists to gate.
  private def pairStarSql =
    """SELECT n_name, o_orderpriority, l_returnflag, COUNT(*) AS n_rows,
      | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS ord_e2,
      | SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS li_e2
      |FROM nation
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN supplier ON s_nationkey = n_nationkey
      |FULL OUTER JOIN orders ON o_custkey = c_custkey
      |FULL OUTER JOIN lineitem ON l_suppkey = s_suppkey
      |GROUP BY n_name, o_orderpriority, l_returnflag""".stripMargin

  private def pairStarOracle =
    """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
      |     s AS (SELECT * FROM supplier WHERE s_suppkey % 5 <> 0),
      |     o AS (SELECT * FROM orders
      |           WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 7 <> 0),
      |     l AS (SELECT * FROM lineitem
      |           WHERE l_quantity <= 2 AND l_linenumber <> 3)
      |SELECT n_name, o_orderpriority, l_returnflag, COUNT(*) AS n_rows,
      | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS ord_e2,
      | CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS li_e2
      |FROM nation JOIN c ON c_nationkey = n_nationkey
      |JOIN s ON s_nationkey = n_nationkey
      |FULL JOIN o ON o_custkey = c_custkey
      |FULL JOIN l ON l_suppkey = s_suppkey
      |GROUP BY n_name, o_orderpriority, l_returnflag""".stripMargin

  private def pairStarOverrides: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "orders" -> ((s, dir) => Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")),
    "lineitem" -> ((s, dir) => Tables.lineitem(s, dir)
      .filter(col("l_quantity") <= 2)))

  private def pairStarDeletes = Map(
    "customer" -> (col("c_custkey") % 13 === 0),
    "supplier" -> (col("s_suppkey") % 5 === 0),
    "orders" -> (col("o_orderkey") % 7 === 0),
    "lineitem" -> (col("l_linenumber") === 3))

  // The pair-star with an inner CHAIN PREFIX above the bridge:
  // region→nation→{customer, supplier}, boundaries off the two bridge
  // relations. The region delete drives the transitive orphan path.
  private def pairStarChainSql =
    """SELECT r_name, o_orderpriority, l_returnflag, COUNT(*) AS n_rows,
      | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS ord_e2,
      | SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS li_e2
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN supplier ON s_nationkey = n_nationkey
      |FULL OUTER JOIN orders ON o_custkey = c_custkey
      |FULL OUTER JOIN lineitem ON l_suppkey = s_suppkey
      |GROUP BY r_name, o_orderpriority, l_returnflag""".stripMargin

  private def pairStarChainOracle =
    """WITH r AS (SELECT * FROM region WHERE r_regionkey % 2 <> 0),
      |     c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
      |     s AS (SELECT * FROM supplier WHERE s_suppkey % 5 <> 0),
      |     o AS (SELECT * FROM orders
      |           WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 7 <> 0),
      |     l AS (SELECT * FROM lineitem
      |           WHERE l_quantity <= 2 AND l_linenumber <> 3)
      |SELECT r_name, o_orderpriority, l_returnflag, COUNT(*) AS n_rows,
      | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS ord_e2,
      | CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS li_e2
      |FROM r JOIN nation ON n_regionkey = r_regionkey
      |JOIN c ON c_nationkey = n_nationkey
      |JOIN s ON s_nationkey = n_nationkey
      |FULL JOIN o ON o_custkey = c_custkey
      |FULL JOIN l ON l_suppkey = s_suppkey
      |GROUP BY r_name, o_orderpriority, l_returnflag""".stripMargin

  private def pairStarChainDeletes = Map(
    "region" -> (col("r_regionkey") % 2 === 0),
    "customer" -> (col("c_custkey") % 13 === 0),
    "supplier" -> (col("s_suppkey") % 5 === 0),
    "orders" -> (col("o_orderkey") % 7 === 0),
    "lineitem" -> (col("l_linenumber") === 3))

  // WHERE-level gate on the bridging dimension: EXISTS drops the
  // orphan classes statically; NOT EXISTS keeps all six, gating
  // classes 1-4 dynamically through spliced gate hops.
  private def pairStarGate(neg: String) =
    s"""WHERE ${neg}EXISTS (SELECT 1 FROM region
       |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')""".stripMargin
  /** Splice the gate before the statement's FINAL GROUP BY only — a
    * blanket String.replace would corrupt both statements if the pair
    * statement ever grows a subquery containing its own GROUP BY. */
  private def spliceBeforeLastGroupBy(sqlText: String, gate: String): String = {
    val at = sqlText.lastIndexOf("GROUP BY")
    require(at >= 0, "pair-star statement lost its GROUP BY")
    sqlText.substring(0, at) + gate + "\n" + sqlText.substring(at)
  }
  private def pairStarGatedSql(neg: String) =
    spliceBeforeLastGroupBy(pairStarSql, pairStarGate(neg))
  private def pairStarGatedOracle(neg: String) =
    spliceBeforeLastGroupBy(pairStarOracle, pairStarGate(neg))

  // CHAIN × GATE: the un-prefixed pair-star gates the bridge dimension
  // on region — but region IS the chain's prefix root here, and a gate
  // subquery over a FROM relation is the loudly-fenced self-semi
  // shape (boundary-side gates are fenced too: three-valued
  // semantics; and non-root inner gates like customer trip the hop
  // key-alignment fence). So the chain composition gates the BRIDGE
  // NATION — now a CHILD of the folded region prefix, unlike the
  // un-prefixed twin where it was the tree root — on `events`
  // activity ("nations with a high-value click"), correlated on
  // n_nationkey: batch-2 deletes retract through the gate hops AND
  // the region prefix in one changelog. EXISTS is FALSE on the
  // core-NULL classes' structural NULLs (static drop); NOT EXISTS
  // keeps all six.
  private def pairStarChainGate(neg: String) =
    s"""WHERE ${neg}EXISTS (SELECT 1 FROM events
       |  WHERE user_id = n_nationkey AND event_type = 'click' AND value > 180)""".stripMargin
  private def pairStarChainGatedSql(neg: String) =
    spliceBeforeLastGroupBy(pairStarChainSql, pairStarChainGate(neg))
  private def pairStarChainGatedOracle(neg: String) =
    spliceBeforeLastGroupBy(pairStarChainOracle, pairStarChainGate(neg))

  // CHAIN × WHERE: the boundary predicate on the chain-prefixed pair
  // shape — same class selection as the un-prefixed filtered twin
  // ({1, 3, 6}: every lineitem-NULL class is NULL-rejected), now with
  // the prefix folded into the surviving classes' cores, so a REGION
  // delete must retract transitively through the filtered plans.
  private def pairStarChainFilteredSql =
    spliceBeforeLastGroupBy(pairStarChainSql, "WHERE l_returnflag = 'R'")
  private def pairStarChainFilteredOracle =
    spliceBeforeLastGroupBy(pairStarChainOracle, "WHERE l_returnflag = 'R'")

  private def pairStarFilteredOracle =
    """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
      |     s AS (SELECT * FROM supplier WHERE s_suppkey % 5 <> 0),
      |     o AS (SELECT * FROM orders
      |           WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 7 <> 0),
      |     l AS (SELECT * FROM lineitem
      |           WHERE l_quantity <= 2 AND l_linenumber <> 3)
      |SELECT n_name, o_orderpriority, l_returnflag, COUNT(*) AS n_rows,
      | CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS ord_e2,
      | CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS li_e2
      |FROM nation JOIN c ON c_nationkey = n_nationkey
      |JOIN s ON s_nationkey = n_nationkey
      |FULL JOIN o ON o_custkey = c_custkey
      |FULL JOIN l ON l_suppkey = s_suppkey
      |WHERE l_returnflag = 'R'
      |GROUP BY n_name, o_orderpriority, l_returnflag""".stripMargin

  private def pairStarFilteredSql =
    """SELECT n_name, o_orderpriority, l_returnflag, COUNT(*) AS n_rows,
      | SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS ord_e2,
      | SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS li_e2
      |FROM nation
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN supplier ON s_nationkey = n_nationkey
      |FULL OUTER JOIN orders ON o_custkey = c_custkey
      |FULL OUTER JOIN lineitem ON l_suppkey = s_suppkey
      |WHERE l_returnflag = 'R'
      |GROUP BY n_name, o_orderpriority, l_returnflag""".stripMargin

  // Further round-12 compiler-scope entries.
  private def round12Defs: Seq[GraftQuery] = Seq(

    // INDEPENDENT (star) double FULL OUTER — two boundaries hanging
    // off the SAME inner parent factorize into the per-boundary
    // product: the pair-product main tree plus five chain/gate plans
    // (a-no-b, b-no-a, bare parent, and the two orphan directions).
    // Nation deletes orphan BOTH boundary sides at once — the class
    // the nested shape cannot produce. DuckDB runs the literal double
    // FULL JOIN natively as the oracle.
    sql("incremental_sql_q10_fullouter_star", starFullOuterOracle) {
      (s, dir) => SqlCompiler.run(s, dir, starFullOuterSql,
        deletes = starFullOuterDeletes)
    },

    // … and through the CONTINUOUS engine: all six preservation plans
    // hold state across micro-batches; a nation delete in batch 2 must
    // retract its pair products AND assert both orphan directions.
    sql("incremental_sql_q10_fullouter_star_stream", starFullOuterOracle) {
      (s, dir) => runSqlStreamed(s,
        SqlCompiler.compile(s, dir, starFullOuterSql),
        dir, starFullOuterDeletes,
        "incremental_sql_q10_fullouter_star_stream_leaf")
    },

    // … and the star view on the TRANSFORMWITHSTATE drivers — all six
    // preservation plans' state on the supported arbitrary-state API,
    // same oracle: three state implementations, one truth.
    sql("incremental_sql_q10_fullouter_star_tws", starFullOuterOracle) {
      (s, dir) => runSqlStreamed(s,
        SqlCompiler.compile(s, dir, starFullOuterSql),
        dir, starFullOuterDeletes,
        "incremental_sql_q10_fullouter_star_tws_leaf", tws = true)
    },

    // PAIR-STAR double FULL OUTER — the two boundaries hang off
    // DIFFERENT relations of a dimension-bridged core (orders off
    // customer, lineitem off supplier, customer⟂supplier bridged by
    // nation: the `incremental_shared_dim` composition under FULL
    // OUTER, r12's remaining star fence). The main tree is the
    // four-way pair product; the five preservation plans re-plan the
    // pair with one boundary removed (absence-gated parents) or ride
    // the bare core's pair emissions (the orphan key nodes — so a
    // customer delete orphans its orders even though orders' own
    // changelog never fires, and a nation losing all suppliers
    // orphans its customers' orders by PAIR-EMPTINESS, SQL's exact
    // answer). Deletes on all four non-dim relations. The relation
    // overrides shrink both boundary facts, but the view's cost is
    // inherently the per-nation trunk×branch PRODUCT the query asks
    // for (~290M joined rows at sf0.1, ~90 s) — quadratic in SF like
    // any shared-dimension product, so it is correctness-gated at
    // sf0.01 and deliberately NOT a bench headliner. DuckDB runs the
    // literal nested double FULL JOIN natively.
    sql("incremental_sql_q10_fullouter_star_pair", pairStarOracle) {
      (s, dir) => SqlCompiler.compileOver(s, dir, pairStarSql, pairStarOverrides)
        .run(s, dir, pairStarDeletes)
    },

    // … and through the CONTINUOUS engine: the pair product AND all
    // five factorized plans hold state across micro-batches — batch-2
    // deletes must retract pair products and flip both orphan
    // directions through held state.
    sql("incremental_sql_q10_fullouter_star_pair_stream", pairStarOracle) {
      (s, dir) => runSqlStreamed(s,
        SqlCompiler.compileOver(s, dir, pairStarSql, pairStarOverrides),
        dir, pairStarDeletes,
        "incremental_sql_q10_fullouter_star_pair_stream_leaf")
    },

    // WHERE × pair-star: the boundary predicate NULL-rejects every
    // class whose lineitem side is NULL, so only the pair product,
    // core⋈lineitem, and lineitem-orphan plans build ({1, 3, 6} of
    // the matrix — the same per-boundary-product class selection as
    // the same-parent star, now on the pair shape). The predicate
    // also lands as a lineitem scan filter.
    sql("incremental_sql_q10_fullouter_star_pair_filtered",
      pairStarFilteredOracle) {
      (s, dir) => SqlCompiler.compileOver(s, dir, pairStarFilteredSql,
        pairStarOverrides)
        .run(s, dir, pairStarDeletes)
    },

    // … and through the CONTINUOUS engine: the three surviving classes
    // ({1, 3, 6} — the WHERE NULL-rejects every lineitem-NULL class)
    // hold state across micro-batches; batch-2 deletes must retract
    // pair products and flip the lineitem-orphan direction through
    // held state, under the same class selection.
    sql("incremental_sql_q10_fullouter_star_pair_filtered_stream",
      pairStarFilteredOracle) {
      (s, dir) => runSqlStreamed(s,
        SqlCompiler.compileOver(s, dir, pairStarFilteredSql, pairStarOverrides),
        dir, pairStarDeletes,
        "incremental_sql_q10_fullouter_star_pair_filtered_stream_leaf")
    },

    // GATES × PAIR-STAR: a NOT EXISTS gate on the bridging dimension
    // keeps all six classes (trivially TRUE on the orphans' structural
    // NULLs) and gates the pair product and classes 2-4 DYNAMICALLY —
    // a region flip must retract/assert its nations' pair products
    // through the spliced gate hops, while orphan-ness stays join-time
    // (the orphan key nodes ride the UNGATED core).
    sql("incremental_sql_q10_fullouter_star_pair_gated",
      pairStarGatedOracle("NOT ")) {
      (s, dir) => SqlCompiler.compileOver(s, dir, pairStarGatedSql("NOT "),
        pairStarOverrides)
        .run(s, dir, pairStarDeletes)
    },
    sql("incremental_sql_q10_fullouter_star_pair_gated_stream",
      pairStarGatedOracle("NOT ")) {
      (s, dir) => runSqlStreamed(s,
        SqlCompiler.compileOver(s, dir, pairStarGatedSql("NOT "), pairStarOverrides),
        dir, pairStarDeletes,
        "incremental_sql_q10_fullouter_star_pair_gated_stream_leaf")
    },

    // … and on the TRANSFORMWITHSTATE drivers — the gate key nodes,
    // the gated replanned cores, and the ungated orphan plans all on
    // the supported arbitrary-state API: three state implementations,
    // one truth, now for the gated pair-star too.
    sql("incremental_sql_q10_fullouter_star_pair_gated_tws",
      pairStarGatedOracle("NOT ")) {
      (s, dir) => runSqlStreamed(s,
        SqlCompiler.compileOver(s, dir, pairStarGatedSql("NOT "), pairStarOverrides),
        dir, pairStarDeletes,
        "incremental_sql_q10_fullouter_star_pair_gated_tws_leaf", tws = true)
    },

    // … and the EXISTS direction: never TRUE on structural NULLs, so
    // classes 5/6 are DROPPED statically (starDrop) and only the live
    // classes build — the other half of the static/dynamic split.
    sql("incremental_sql_q10_fullouter_star_pair_gated_exists",
      pairStarGatedOracle("")) {
      (s, dir) => SqlCompiler.compileOver(s, dir, pairStarGatedSql(""),
        pairStarOverrides)
        .run(s, dir, pairStarDeletes)
    },
    sql("incremental_sql_q10_fullouter_star_pair_gated_exists_stream",
      pairStarGatedOracle("")) {
      (s, dir) => runSqlStreamed(s,
        SqlCompiler.compileOver(s, dir, pairStarGatedSql(""), pairStarOverrides),
        dir, pairStarDeletes,
        "incremental_sql_q10_fullouter_star_pair_gated_exists_stream_leaf")
    },

    // … and on the TRANSFORMWITHSTATE drivers — the pair product plus
    // all five factorized plans' state on the supported arbitrary-
    // state API, same oracle: three state implementations, one truth.
    sql("incremental_sql_q10_fullouter_star_pair_tws", pairStarOracle) {
      (s, dir) => runSqlStreamed(s,
        SqlCompiler.compileOver(s, dir, pairStarSql, pairStarOverrides),
        dir, pairStarDeletes,
        "incremental_sql_q10_fullouter_star_pair_tws_leaf", tws = true)
    },

    // PAIR-star under an inner CHAIN PREFIX (region→nation→{customer,
    // supplier}): the six-class factorization carries over with the
    // whole prefix folded into the core — a REGION delete retracts its
    // nations' pair products and transitively orphans their customers'
    // orders AND suppliers' lineitems (classes 5/6 ride the core's
    // merged pair emissions, which already fold the prefix — the same
    // move that closed ancestor deletes in r9). Spec-asserted against
    // stock SQL; this is the gated DuckDB entry.
    sql("incremental_sql_q10_fullouter_star_pair_chain",
      pairStarChainOracle) {
      (s, dir) => SqlCompiler.compileOver(s, dir, pairStarChainSql,
        pairStarOverrides).run(s, dir, pairStarChainDeletes)
    },
    sql("incremental_sql_q10_fullouter_star_pair_chain_stream",
      pairStarChainOracle) {
      (s, dir) => runSqlStreamed(s,
        SqlCompiler.compileOver(s, dir, pairStarChainSql, pairStarOverrides),
        dir, pairStarChainDeletes,
        "incremental_sql_q10_fullouter_star_pair_chain_stream_leaf")
    },

    // CHAIN × GATE (NOT EXISTS): region feeds BOTH the folded prefix
    // and the spliced gate hop — a batch-2 region delete retracts its
    // nations' pair products through the prefix AND flips the gate for
    // any nation whose ASIA witness died, in one changelog. All six
    // classes survive (NOT EXISTS is TRUE on the orphans' structural
    // NULLs); the orphan key nodes ride the UNGATED prefix-folded core.
    sql("incremental_sql_q10_fullouter_star_pair_chain_gated",
      pairStarChainGatedOracle("NOT ")) {
      (s, dir) => SqlCompiler.compileOver(s, dir,
        pairStarChainGatedSql("NOT "), pairStarOverrides)
        .run(s, dir, pairStarChainDeletes)
    },
    sql("incremental_sql_q10_fullouter_star_pair_chain_gated_stream",
      pairStarChainGatedOracle("NOT ")) {
      (s, dir) => runSqlStreamed(s,
        SqlCompiler.compileOver(s, dir, pairStarChainGatedSql("NOT "),
          pairStarOverrides),
        dir, pairStarChainDeletes,
        "incremental_sql_q10_fullouter_star_pair_chain_gated_stream_leaf")
    },

    // … and the EXISTS direction on the chain: never TRUE on
    // structural NULLs, so the orphan classes drop statically and only
    // the live prefix-folded classes build — the static/dynamic split,
    // now composed under the chain prefix.
    sql("incremental_sql_q10_fullouter_star_pair_chain_gated_exists",
      pairStarChainGatedOracle("")) {
      (s, dir) => SqlCompiler.compileOver(s, dir,
        pairStarChainGatedSql(""), pairStarOverrides)
        .run(s, dir, pairStarChainDeletes)
    },
    sql("incremental_sql_q10_fullouter_star_pair_chain_gated_exists_stream",
      pairStarChainGatedOracle("")) {
      (s, dir) => runSqlStreamed(s,
        SqlCompiler.compileOver(s, dir, pairStarChainGatedSql(""),
          pairStarOverrides),
        dir, pairStarChainDeletes,
        "incremental_sql_q10_fullouter_star_pair_chain_gated_exists_stream_leaf")
    },

    // CHAIN × WHERE (boundary predicate): the lineitem-side conjunct
    // NULL-rejects every lineitem-NULL class — the {1, 3, 6} selection
    // of the r12 matrix — on the chain-prefixed shape, so a region
    // delete retracts transitively through the surviving filtered
    // plans and the lineitem-orphan direction still flips dynamically.
    sql("incremental_sql_q10_fullouter_star_pair_chain_filtered",
      pairStarChainFilteredOracle) {
      (s, dir) => SqlCompiler.compileOver(s, dir,
        pairStarChainFilteredSql, pairStarOverrides)
        .run(s, dir, pairStarChainDeletes)
    },
    sql("incremental_sql_q10_fullouter_star_pair_chain_filtered_stream",
      pairStarChainFilteredOracle) {
      (s, dir) => runSqlStreamed(s,
        SqlCompiler.compileOver(s, dir, pairStarChainFilteredSql,
          pairStarOverrides),
        dir, pairStarChainDeletes,
        "incremental_sql_q10_fullouter_star_pair_chain_filtered_stream_leaf")
    },

    // Star boundaries under an inner CHAIN (region→nation): the five
    // factorized plans build on the chain prefix — a REGION delete
    // must retract its nations' pair products and orphan their
    // customers AND suppliers transitively (the orphan key nodes ride
    // the prefix's merged emissions, not the parent's raw changelog).
    sql("incremental_sql_q10_fullouter_star_chain",
      """WITH r AS (SELECT * FROM region WHERE r_regionkey % 2 <> 0),
        |     c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 5 <> 0)
        |SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sbal_e2
        |FROM r JOIN nation ON n_regionkey = r_regionkey
        |FULL JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN s ON s_nationkey = n_nationkey
        |GROUP BY n_name, c_mktsegment""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
          | SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS sbal_e2
          |FROM region
          |JOIN nation ON n_regionkey = r_regionkey
          |FULL OUTER JOIN customer ON c_nationkey = n_nationkey
          |FULL OUTER JOIN supplier ON s_nationkey = n_nationkey
          |GROUP BY n_name, c_mktsegment""".stripMargin,
        deletes = Map(
          "region" -> (col("r_regionkey") % 2 === 0),
          "customer" -> (col("c_custkey") % 13 === 0),
          "supplier" -> (col("s_suppkey") % 5 === 0)))
    },

    // … and streamed: batch 2's region deletes flip orphanhood on BOTH
    // boundary sides through the prefix-fed key-node state.
    sql("incremental_sql_q10_fullouter_star_chain_stream",
      """WITH r AS (SELECT * FROM region WHERE r_regionkey % 2 <> 0),
        |     c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 5 <> 0)
        |SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sbal_e2
        |FROM r JOIN nation ON n_regionkey = r_regionkey
        |FULL JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN s ON s_nationkey = n_nationkey
        |GROUP BY n_name, c_mktsegment""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
            | SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS sbal_e2
            |FROM region
            |JOIN nation ON n_regionkey = r_regionkey
            |FULL OUTER JOIN customer ON c_nationkey = n_nationkey
            |FULL OUTER JOIN supplier ON s_nationkey = n_nationkey
            |GROUP BY n_name, c_mktsegment""".stripMargin),
        dir, Map(
          "region" -> (col("r_regionkey") % 2 === 0),
          "customer" -> (col("c_custkey") % 13 === 0),
          "supplier" -> (col("s_suppkey") % 5 === 0)),
        "incremental_sql_q10_fullouter_star_chain_stream_leaf")
    },

    // Star × WHERE class selection: the parent-side conjunct kills
    // exactly the two orphan classes; the three gated-extension plans
    // and the pair-product main tree maintain the rest. DuckDB runs
    // the literal double FULL JOIN + WHERE as the oracle.
    sql("incremental_sql_q10_fullouter_star_filtered",
      """WITH n AS (SELECT * FROM nation WHERE n_nationkey % 7 <> 0),
        |     c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 5 <> 0)
        |SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sbal_e2
        |FROM n FULL JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN s ON s_nationkey = n_nationkey
        |WHERE n_name <> 'KENYA'
        |GROUP BY n_name, c_mktsegment""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
          | SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS sbal_e2
          |FROM nation
          |FULL OUTER JOIN customer ON c_nationkey = n_nationkey
          |FULL OUTER JOIN supplier ON s_nationkey = n_nationkey
          |WHERE n_name <> 'KENYA'
          |GROUP BY n_name, c_mktsegment""".stripMargin,
        deletes = starFullOuterDeletes)
    },

    // Star × parent-key IS NULL — the find-the-orphans reading across
    // BOTH boundaries at once: only the two orphan plans run (main
    // suppressed, extension classes dropped); nation deletes must
    // assert orphans on BOTH sides.
    sql("incremental_sql_q10_fullouter_star_isnull",
      """WITH n AS (SELECT * FROM nation WHERE n_nationkey % 7 <> 0),
        |     c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 5 <> 0)
        |SELECT c_mktsegment, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sbal_e2
        |FROM n FULL JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN s ON s_nationkey = n_nationkey
        |WHERE n_nationkey IS NULL
        |GROUP BY c_mktsegment""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT c_mktsegment, COUNT(*) AS n_rows,
          | SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS sbal_e2
          |FROM nation
          |FULL OUTER JOIN customer ON c_nationkey = n_nationkey
          |FULL OUTER JOIN supplier ON s_nationkey = n_nationkey
          |WHERE n_nationkey IS NULL
          |GROUP BY c_mktsegment""".stripMargin,
        deletes = starFullOuterDeletes)
    },

    // … and both through the CONTINUOUS engine, same oracles.
    sql("incremental_sql_q10_fullouter_star_filtered_stream",
      """WITH n AS (SELECT * FROM nation WHERE n_nationkey % 7 <> 0),
        |     c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 5 <> 0)
        |SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sbal_e2
        |FROM n FULL JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN s ON s_nationkey = n_nationkey
        |WHERE n_name <> 'KENYA'
        |GROUP BY n_name, c_mktsegment""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
            | SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS sbal_e2
            |FROM nation
            |FULL OUTER JOIN customer ON c_nationkey = n_nationkey
            |FULL OUTER JOIN supplier ON s_nationkey = n_nationkey
            |WHERE n_name <> 'KENYA'
            |GROUP BY n_name, c_mktsegment""".stripMargin),
        dir, starFullOuterDeletes,
        "incremental_sql_q10_fullouter_star_filtered_stream_leaf")
    },

    sql("incremental_sql_q10_fullouter_star_isnull_stream",
      """WITH n AS (SELECT * FROM nation WHERE n_nationkey % 7 <> 0),
        |     c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 5 <> 0)
        |SELECT c_mktsegment, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sbal_e2
        |FROM n FULL JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN s ON s_nationkey = n_nationkey
        |WHERE n_nationkey IS NULL
        |GROUP BY c_mktsegment""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT c_mktsegment, COUNT(*) AS n_rows,
            | SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS sbal_e2
            |FROM nation
            |FULL OUTER JOIN customer ON c_nationkey = n_nationkey
            |FULL OUTER JOIN supplier ON s_nationkey = n_nationkey
            |WHERE n_nationkey IS NULL
            |GROUP BY c_mktsegment""".stripMargin),
        dir, starFullOuterDeletes,
        "incremental_sql_q10_fullouter_star_isnull_stream_leaf")
    },

    // GATES × NESTED two-boundary: EXISTS on a prefix relation drops
    // the prefix-NULL classes 3/4/6 statically (structural NULL
    // correlation is never TRUE) while classes 1/2/5 gate dynamically
    // through the gated stage list — DuckDB runs the literal
    // join-then-filter as the oracle.
    sql("incremental_sql_q10_fullouter_two_boundary_gated",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_linenumber <> 3)
        |SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN o ON o_custkey = c_custkey
        |FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE EXISTS (SELECT 1 FROM region
        |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
        |GROUP BY n_name, o_orderpriority""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
          | SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS rev_e2
          |FROM nation
          |JOIN customer ON c_nationkey = n_nationkey
          |FULL OUTER JOIN orders ON o_custkey = c_custkey
          |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE EXISTS (SELECT 1 FROM region
          |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
          |GROUP BY n_name, o_orderpriority""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "orders" -> (col("o_orderkey") % 50 === 0),
          "lineitem" -> (col("l_linenumber") === 3)))
    },

    sql("incremental_sql_q10_fullouter_two_boundary_gated_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_linenumber <> 3)
        |SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN o ON o_custkey = c_custkey
        |FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE EXISTS (SELECT 1 FROM region
        |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
        |GROUP BY n_name, o_orderpriority""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
            | SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS rev_e2
            |FROM nation
            |JOIN customer ON c_nationkey = n_nationkey
            |FULL OUTER JOIN orders ON o_custkey = c_custkey
            |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
            |WHERE EXISTS (SELECT 1 FROM region
            |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
            |GROUP BY n_name, o_orderpriority""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "orders" -> (col("o_orderkey") % 50 === 0),
          "lineitem" -> (col("l_linenumber") === 3)),
        "incremental_sql_q10_fullouter_2b_gated_leaf")
    },

    // … NOT EXISTS keeps classes 3/4/6 — and they must key off the
    // JOIN-TIME prefix: an ASIA customer is gate-dead but join-alive,
    // so its orders must NOT resurrect as orphan-order classes. The
    // customer deletes make real orphans; the gate makes gate-dead
    // non-orphans; DuckDB distinguishes them independently.
    sql("incremental_sql_q10_fullouter_two_boundary_gated_anti",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_linenumber <> 3)
        |SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN o ON o_custkey = c_custkey
        |FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE NOT EXISTS (SELECT 1 FROM region
        |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
        |GROUP BY n_name, o_orderpriority""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
          | SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS rev_e2
          |FROM nation
          |JOIN customer ON c_nationkey = n_nationkey
          |FULL OUTER JOIN orders ON o_custkey = c_custkey
          |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE NOT EXISTS (SELECT 1 FROM region
          |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
          |GROUP BY n_name, o_orderpriority""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "orders" -> (col("o_orderkey") % 50 === 0),
          "lineitem" -> (col("l_linenumber") === 3)))
    },
    sql("incremental_sql_q10_fullouter_two_boundary_gated_anti_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     o AS (SELECT * FROM orders WHERE o_orderkey % 50 <> 0),
        |     l AS (SELECT * FROM lineitem WHERE l_linenumber <> 3)
        |SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        |FROM nation JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN o ON o_custkey = c_custkey
        |FULL JOIN l ON l_orderkey = o_orderkey
        |WHERE NOT EXISTS (SELECT 1 FROM region
        |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
        |GROUP BY n_name, o_orderpriority""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, o_orderpriority, COUNT(*) AS n_rows,
            | SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS rev_e2
            |FROM nation
            |JOIN customer ON c_nationkey = n_nationkey
            |FULL OUTER JOIN orders ON o_custkey = c_custkey
            |FULL OUTER JOIN lineitem ON l_orderkey = o_orderkey
            |WHERE NOT EXISTS (SELECT 1 FROM region
            |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
            |GROUP BY n_name, o_orderpriority""".stripMargin),
        dir, Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "orders" -> (col("o_orderkey") % 50 === 0),
          "lineitem" -> (col("l_linenumber") === 3)),
        "incremental_sql_q10_fullouter_2b_gated_anti_leaf")
    },

    // GATES × STAR: the gate correlates to the SHARED PARENT itself —
    // the absence hops chain onto the gate hop (classes 2-4 consume
    // the gate-filtered nation changelog), while the orphan classes
    // 5/6 decide statically: EXISTS drops them, NOT EXISTS keeps them
    // riding the UNGATED parent liveness (a gate-dead nation's
    // customers are join-matched, not orphans).
    sql("incremental_sql_q10_fullouter_star_gated",
      """WITH n AS (SELECT * FROM nation WHERE n_nationkey % 7 <> 0),
        |     c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 5 <> 0)
        |SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sbal_e2
        |FROM n FULL JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN s ON s_nationkey = n_nationkey
        |WHERE EXISTS (SELECT 1 FROM region
        |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
        |GROUP BY n_name, c_mktsegment""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
          | SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS sbal_e2
          |FROM nation
          |FULL OUTER JOIN customer ON c_nationkey = n_nationkey
          |FULL OUTER JOIN supplier ON s_nationkey = n_nationkey
          |WHERE EXISTS (SELECT 1 FROM region
          |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
          |GROUP BY n_name, c_mktsegment""".stripMargin,
        deletes = Map(
          "nation" -> (col("n_nationkey") % 7 === 0),
          "customer" -> (col("c_custkey") % 13 === 0),
          "supplier" -> (col("s_suppkey") % 5 === 0)))
    },
    sql("incremental_sql_q10_fullouter_star_gated_stream",
      """WITH n AS (SELECT * FROM nation WHERE n_nationkey % 7 <> 0),
        |     c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 5 <> 0)
        |SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sbal_e2
        |FROM n FULL JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN s ON s_nationkey = n_nationkey
        |WHERE EXISTS (SELECT 1 FROM region
        |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
        |GROUP BY n_name, c_mktsegment""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
            | SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS sbal_e2
            |FROM nation
            |FULL OUTER JOIN customer ON c_nationkey = n_nationkey
            |FULL OUTER JOIN supplier ON s_nationkey = n_nationkey
            |WHERE EXISTS (SELECT 1 FROM region
            |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
            |GROUP BY n_name, c_mktsegment""".stripMargin),
        dir, Map(
          "nation" -> (col("n_nationkey") % 7 === 0),
          "customer" -> (col("c_custkey") % 13 === 0),
          "supplier" -> (col("s_suppkey") % 5 === 0)),
        "incremental_sql_q10_fullouter_star_gated_leaf")
    },
    sql("incremental_sql_q10_fullouter_star_gated_anti",
      """WITH n AS (SELECT * FROM nation WHERE n_nationkey % 7 <> 0),
        |     c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 5 <> 0)
        |SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sbal_e2
        |FROM n FULL JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN s ON s_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM region
        |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
        |GROUP BY n_name, c_mktsegment""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
          | SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS sbal_e2
          |FROM nation
          |FULL OUTER JOIN customer ON c_nationkey = n_nationkey
          |FULL OUTER JOIN supplier ON s_nationkey = n_nationkey
          |WHERE NOT EXISTS (SELECT 1 FROM region
          |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
          |GROUP BY n_name, c_mktsegment""".stripMargin,
        deletes = Map(
          "nation" -> (col("n_nationkey") % 7 === 0),
          "customer" -> (col("c_custkey") % 13 === 0),
          "supplier" -> (col("s_suppkey") % 5 === 0)))
    },
    sql("incremental_sql_q10_fullouter_star_gated_anti_stream",
      """WITH n AS (SELECT * FROM nation WHERE n_nationkey % 7 <> 0),
        |     c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 5 <> 0)
        |SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sbal_e2
        |FROM n FULL JOIN c ON c_nationkey = n_nationkey
        |FULL JOIN s ON s_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM region
        |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
        |GROUP BY n_name, c_mktsegment""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT n_name, c_mktsegment, COUNT(*) AS n_rows,
            | SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS sbal_e2
            |FROM nation
            |FULL OUTER JOIN customer ON c_nationkey = n_nationkey
            |FULL OUTER JOIN supplier ON s_nationkey = n_nationkey
            |WHERE NOT EXISTS (SELECT 1 FROM region
            |  WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
            |GROUP BY n_name, c_mktsegment""".stripMargin),
        dir, Map(
          "nation" -> (col("n_nationkey") % 7 === 0),
          "customer" -> (col("c_custkey") % 13 === 0),
          "supplier" -> (col("s_suppkey") % 5 === 0)),
        "incremental_sql_q10_fullouter_star_gated_anti_leaf")
    },

    // NOT IN (subquery) — the null-free-provable case: both columns
    // are FK-graph key columns (NOT NULL by the engine's key
    // contract), so NOT IN lowers to the anti gate; a nullable column
    // on either side keeps the loud three-valued fence
    // (SqlCompilerSpec exercises the rejection). A customer delete
    // must ADMIT every order it was excluding.
    sql("incremental_sql_not_in",
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_orderkey % 6 <> 0
        | AND o_custkey NOT IN (SELECT c_custkey FROM customer
        |                       WHERE c_acctbal > 1000 AND c_custkey % 30 <> 0)
        |GROUP BY o_orderpriority""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT o_orderpriority, COUNT(*) AS n_orders
          |FROM orders
          |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
          |                        WHERE c_acctbal > 1000)
          |GROUP BY o_orderpriority""".stripMargin,
        deletes = Map(
          "orders" -> (col("o_orderkey") % 6 === 0),
          "customer" -> (col("c_custkey") % 30 === 0)))
    },

    // … and through the CONTINUOUS engine: exclusion-set admissions
    // and evictions replay as micro-batches through the anti gate's
    // held state.
    sql("incremental_sql_not_in_stream",
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_orderkey % 6 <> 0
        | AND o_custkey NOT IN (SELECT c_custkey FROM customer
        |                       WHERE c_acctbal > 1000 AND c_custkey % 30 <> 0)
        |GROUP BY o_orderpriority""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT o_orderpriority, COUNT(*) AS n_orders
            |FROM orders
            |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
            |                        WHERE c_acctbal > 1000)
            |GROUP BY o_orderpriority""".stripMargin),
        dir, Map(
          "orders" -> (col("o_orderkey") % 6 === 0),
          "customer" -> (col("c_custkey") % 30 === 0)),
        "incremental_sql_not_in_stream_leaf")
    },

    // The self-join written in EXPLICIT `JOIN t alias ON …` syntax —
    // the spelling a real user writes first; same alias expansion,
    // same oracle family as the comma-form incremental_sql_self_join.
    sql("incremental_sql_self_alias",
      """SELECT c_mktsegment, COUNT(*) AS n_pairs,
        | CAST(SUM(CAST(round(o2.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS low_rev_e2
        |FROM customer
        |JOIN orders o1 ON o1.o_custkey = c_custkey
        |JOIN orders o2 ON o2.o_custkey = c_custkey
        |WHERE o1.o_orderpriority = '1-URGENT' AND o2.o_orderpriority = '5-LOW'
        | AND o1.o_orderkey % 7 <> 0 AND o2.o_orderkey % 5 <> 0
        |GROUP BY c_mktsegment""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT c_mktsegment, COUNT(*) AS n_pairs,
          | SUM(CAST(round(o2.o_totalprice * 100, 0) AS BIGINT)) AS low_rev_e2
          |FROM customer
          |JOIN orders o1 ON o1.o_custkey = c_custkey
          |JOIN orders o2 ON o2.o_custkey = c_custkey
          |WHERE o1.o_orderpriority = '1-URGENT' AND o2.o_orderpriority = '5-LOW'
          |GROUP BY c_mktsegment""".stripMargin,
        deletes = Map(
          "o1" -> (col("o1_o_orderkey") % 7 === 0),
          "o2" -> (col("o2_o_orderkey") % 5 === 0)))
    },

    // … and streamed: the aliased instances replay as independent
    // event streams through the pair product's held state.
    sql("incremental_sql_self_alias_stream",
      """SELECT c_mktsegment, COUNT(*) AS n_pairs,
        | CAST(SUM(CAST(round(o2.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS low_rev_e2
        |FROM customer
        |JOIN orders o1 ON o1.o_custkey = c_custkey
        |JOIN orders o2 ON o2.o_custkey = c_custkey
        |WHERE o1.o_orderpriority = '1-URGENT' AND o2.o_orderpriority = '5-LOW'
        | AND o1.o_orderkey % 7 <> 0 AND o2.o_orderkey % 5 <> 0
        |GROUP BY c_mktsegment""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT c_mktsegment, COUNT(*) AS n_pairs,
            | SUM(CAST(round(o2.o_totalprice * 100, 0) AS BIGINT)) AS low_rev_e2
            |FROM customer
            |JOIN orders o1 ON o1.o_custkey = c_custkey
            |JOIN orders o2 ON o2.o_custkey = c_custkey
            |WHERE o1.o_orderpriority = '1-URGENT' AND o2.o_orderpriority = '5-LOW'
            |GROUP BY c_mktsegment""".stripMargin),
        dir, Map(
          "o1" -> (col("o1_o_orderkey") % 7 === 0),
          "o2" -> (col("o2_o_orderkey") % 5 === 0)),
        "incremental_sql_self_alias_stream_leaf")
    },

    // ---- WITH (CTE): maintained views composed under an outer query --
    // SqlCompiler.compileCte splits the WITH prefix textually
    // (paren/quote/comment-aware, like the set-op splitter), compiles
    // every CTE body as its OWN incrementally maintained view, and
    // evaluates the outer query as stock Spark SQL over the refreshed
    // view outputs — so the input-proportional work stays inside the
    // incremental folds and the outer side gets the FULL SQL surface
    // (presentation, re-aggregation, view⋈view joins, windows over
    // dims). Oracles are the same WITH text in DuckDB with the delete
    // predicates folded in. Column-alias lists rename view output;
    // set-semantics UNION bodies maintain via the netting node;
    // recursion routes to RecursiveSql (SqlCompilerSpec).

    // presentation outer: threshold + ORDER BY/LIMIT over a maintained
    // per-(nation, customer) revenue view — the "top-N over a view"
    // idiom with the top-N OUTSIDE the maintained fold
    sql("incremental_sql_cte_topn",
      """WITH rev AS (
        | SELECT n_name, c_custkey,
        |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderstatus = 'F'
        |  AND c_custkey % 13 <> 0 AND o_orderkey % 10 <> 0
        | GROUP BY n_name, c_custkey)
        |SELECT n_name, c_custkey, rev_e2 FROM rev
        |WHERE rev_e2 > 20000000
        |ORDER BY rev_e2 DESC, c_custkey LIMIT 10""".stripMargin) {
      (s, dir) => SqlCompiler.runCte(s, dir,
        """WITH rev AS (
          | SELECT n_name, c_custkey,
          |  SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_e2
          | FROM nation, customer, orders
          | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          |  AND o_orderstatus = 'F'
          | GROUP BY n_name, c_custkey)
          |SELECT n_name, c_custkey, rev_e2 FROM rev
          |WHERE rev_e2 > 20000000
          |ORDER BY rev_e2 DESC, c_custkey LIMIT 10""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "orders" -> (col("o_orderkey") % 10 === 0)))
    },

    // re-aggregation outer: a histogram OVER the maintained per-customer
    // order-count view — the second aggregate's input is the view's
    // output (group cardinality), so re-running it per refresh is
    // presentation-class work, not input-class
    sql("incremental_sql_cte_reagg",
      """WITH per_cust AS (
        | SELECT c_custkey, COUNT(*) AS n_orders
        | FROM customer, orders
        | WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
        |  AND o_orderkey % 10 <> 0
        | GROUP BY c_custkey)
        |SELECT n_orders, COUNT(*) AS n_customers
        |FROM per_cust GROUP BY n_orders""".stripMargin) {
      (s, dir) => SqlCompiler.runCte(s, dir,
        """WITH per_cust AS (
          | SELECT c_custkey, COUNT(*) AS n_orders
          | FROM customer, orders
          | WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
          | GROUP BY c_custkey)
          |SELECT n_orders, COUNT(*) AS n_customers
          |FROM per_cust GROUP BY n_orders""".stripMargin,
        deletes = Map("orders" -> (col("o_orderkey") % 10 === 0)))
    },

    // view ⋈ view outer: two independently maintained per-nation views
    // (customer balances, supplier balances) joined in the outer — the
    // dashboard idiom; each side refreshes from its own changelogs
    sql("incremental_sql_cte_join",
      """WITH cust AS (
        | SELECT n_nationkey AS nk, n_name,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS cust_bal_e2,
        |  COUNT(*) AS n_cust
        | FROM nation, customer
        | WHERE c_nationkey = n_nationkey AND c_custkey % 13 <> 0
        | GROUP BY n_nationkey, n_name),
        |supp AS (
        | SELECT n_nationkey AS nk,
        |  CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS supp_bal_e2,
        |  COUNT(*) AS n_supp
        | FROM nation, supplier
        | WHERE s_nationkey = n_nationkey AND s_suppkey % 7 <> 0
        | GROUP BY n_nationkey)
        |SELECT c.n_name, c.n_cust, s.n_supp,
        | c.cust_bal_e2 + s.supp_bal_e2 AS total_bal_e2
        |FROM cust c JOIN supp s ON c.nk = s.nk""".stripMargin) {
      (s, dir) => SqlCompiler.runCte(s, dir,
        """WITH cust AS (
          | SELECT n_nationkey AS nk, n_name,
          |  SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS cust_bal_e2,
          |  COUNT(*) AS n_cust
          | FROM nation, customer
          | WHERE c_nationkey = n_nationkey
          | GROUP BY n_nationkey, n_name),
          |supp AS (
          | SELECT n_nationkey AS nk,
          |  SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS supp_bal_e2,
          |  COUNT(*) AS n_supp
          | FROM nation, supplier
          | WHERE s_nationkey = n_nationkey
          | GROUP BY n_nationkey)
          |SELECT c.n_name, c.n_cust, s.n_supp,
          | c.cust_bal_e2 + s.supp_bal_e2 AS total_bal_e2
          |FROM cust c JOIN supp s ON c.nk = s.nk""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "supplier" -> (col("s_suppkey") % 7 === 0)))
    },

    // dimension-decorated outer: the maintained per-nation revenue view
    // joined to the nation/region dims with a window RANK — base
    // relations in the outer see the same deletes-applied state as the
    // views' changelogs
    sql("incremental_sql_cte_dim",
      """WITH rev AS (
        | SELECT c_nationkey AS nk,
        |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        | FROM customer, orders
        | WHERE o_custkey = c_custkey AND o_orderkey % 6 <> 0
        | GROUP BY c_nationkey)
        |SELECT r_name, n_name, rev_e2,
        | CAST(RANK() OVER (PARTITION BY r_name ORDER BY rev_e2 DESC, n_name) AS BIGINT) AS rnk
        |FROM rev JOIN nation ON n_nationkey = nk
        |JOIN region ON r_regionkey = n_regionkey""".stripMargin) {
      (s, dir) => SqlCompiler.runCte(s, dir,
        """WITH rev AS (
          | SELECT c_nationkey AS nk,
          |  SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_e2
          | FROM customer, orders
          | WHERE o_custkey = c_custkey
          | GROUP BY c_nationkey)
          |SELECT r_name, n_name, rev_e2,
          | CAST(RANK() OVER (PARTITION BY r_name ORDER BY rev_e2 DESC, n_name) AS BIGINT) AS rnk
          |FROM rev JOIN nation ON n_nationkey = nk
          |JOIN region ON r_regionkey = n_regionkey""".stripMargin,
        deletes = Map("orders" -> (col("o_orderkey") % 6 === 0)))
    },

    // … and each CTE shape through the CONTINUOUS engine: every view
    // replays as its own streaming query, the outer evaluates over the
    // final maintained states. Same oracles.
    sql("incremental_sql_cte_topn_stream",
      """WITH rev AS (
        | SELECT n_name, c_custkey,
        |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderstatus = 'F'
        |  AND c_custkey % 13 <> 0 AND o_orderkey % 10 <> 0
        | GROUP BY n_name, c_custkey)
        |SELECT n_name, c_custkey, rev_e2 FROM rev
        |WHERE rev_e2 > 20000000
        |ORDER BY rev_e2 DESC, c_custkey LIMIT 10""".stripMargin) {
      (s, dir) => runCteStreamed(s,
        """WITH rev AS (
          | SELECT n_name, c_custkey,
          |  SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_e2
          | FROM nation, customer, orders
          | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          |  AND o_orderstatus = 'F'
          | GROUP BY n_name, c_custkey)
          |SELECT n_name, c_custkey, rev_e2 FROM rev
          |WHERE rev_e2 > 20000000
          |ORDER BY rev_e2 DESC, c_custkey LIMIT 10""".stripMargin,
        dir, Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "orders" -> (col("o_orderkey") % 10 === 0)),
        "incremental_sql_cte_topn_stream")
    },

    sql("incremental_sql_cte_reagg_stream",
      """WITH per_cust AS (
        | SELECT c_custkey, COUNT(*) AS n_orders
        | FROM customer, orders
        | WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
        |  AND o_orderkey % 10 <> 0
        | GROUP BY c_custkey)
        |SELECT n_orders, COUNT(*) AS n_customers
        |FROM per_cust GROUP BY n_orders""".stripMargin) {
      (s, dir) => runCteStreamed(s,
        """WITH per_cust AS (
          | SELECT c_custkey, COUNT(*) AS n_orders
          | FROM customer, orders
          | WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
          | GROUP BY c_custkey)
          |SELECT n_orders, COUNT(*) AS n_customers
          |FROM per_cust GROUP BY n_orders""".stripMargin,
        dir, Map("orders" -> (col("o_orderkey") % 10 === 0)),
        "incremental_sql_cte_reagg_stream")
    },

    sql("incremental_sql_cte_join_stream",
      """WITH cust AS (
        | SELECT n_nationkey AS nk, n_name,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS cust_bal_e2,
        |  COUNT(*) AS n_cust
        | FROM nation, customer
        | WHERE c_nationkey = n_nationkey AND c_custkey % 13 <> 0
        | GROUP BY n_nationkey, n_name),
        |supp AS (
        | SELECT n_nationkey AS nk,
        |  CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS supp_bal_e2,
        |  COUNT(*) AS n_supp
        | FROM nation, supplier
        | WHERE s_nationkey = n_nationkey AND s_suppkey % 7 <> 0
        | GROUP BY n_nationkey)
        |SELECT c.n_name, c.n_cust, s.n_supp,
        | c.cust_bal_e2 + s.supp_bal_e2 AS total_bal_e2
        |FROM cust c JOIN supp s ON c.nk = s.nk""".stripMargin) {
      (s, dir) => runCteStreamed(s,
        """WITH cust AS (
          | SELECT n_nationkey AS nk, n_name,
          |  SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS cust_bal_e2,
          |  COUNT(*) AS n_cust
          | FROM nation, customer
          | WHERE c_nationkey = n_nationkey
          | GROUP BY n_nationkey, n_name),
          |supp AS (
          | SELECT n_nationkey AS nk,
          |  SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS supp_bal_e2,
          |  COUNT(*) AS n_supp
          | FROM nation, supplier
          | WHERE s_nationkey = n_nationkey
          | GROUP BY n_nationkey)
          |SELECT c.n_name, c.n_cust, s.n_supp,
          | c.cust_bal_e2 + s.supp_bal_e2 AS total_bal_e2
          |FROM cust c JOIN supp s ON c.nk = s.nk""".stripMargin,
        dir, Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "supplier" -> (col("s_suppkey") % 7 === 0)),
        "incremental_sql_cte_join_stream")
    },

    sql("incremental_sql_cte_dim_stream",
      """WITH rev AS (
        | SELECT c_nationkey AS nk,
        |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        | FROM customer, orders
        | WHERE o_custkey = c_custkey AND o_orderkey % 6 <> 0
        | GROUP BY c_nationkey)
        |SELECT r_name, n_name, rev_e2,
        | CAST(RANK() OVER (PARTITION BY r_name ORDER BY rev_e2 DESC, n_name) AS BIGINT) AS rnk
        |FROM rev JOIN nation ON n_nationkey = nk
        |JOIN region ON r_regionkey = n_regionkey""".stripMargin) {
      (s, dir) => runCteStreamed(s,
        """WITH rev AS (
          | SELECT c_nationkey AS nk,
          |  SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_e2
          | FROM customer, orders
          | WHERE o_custkey = c_custkey
          | GROUP BY c_nationkey)
          |SELECT r_name, n_name, rev_e2,
          | CAST(RANK() OVER (PARTITION BY r_name ORDER BY rev_e2 DESC, n_name) AS BIGINT) AS rnk
          |FROM rev JOIN nation ON n_nationkey = nk
          |JOIN region ON r_regionkey = n_regionkey""".stripMargin,
        dir, Map("orders" -> (col("o_orderkey") % 6 === 0)),
        "incremental_sql_cte_dim_stream")
    },

    // CTE COLUMN-ALIAS LIST — `WITH bal(a, b, c) AS (...)`: the alias
    // list renames the maintained view's output POSITIONALLY (ANSI),
    // and the outer query reads the aliased names. The inner SELECT's
    // own names differ on purpose: what's gated is the rename.
    sql("incremental_sql_cte_alias",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |bal(nation_name, total_bal_e2, n_cust) AS (
        | SELECT n_name, CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT),
        |  COUNT(*)
        | FROM nation JOIN c ON c_nationkey = n_nationkey
        | WHERE c_acctbal > 0
        | GROUP BY n_name)
        |SELECT nation_name, total_bal_e2, n_cust FROM bal
        |WHERE n_cust > 5""".stripMargin) {
      (s, dir) => SqlCompiler.runCte(s, dir,
        """WITH bal(nation_name, total_bal_e2, n_cust) AS (
          | SELECT n_name AS x1,
          |  SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS x2,
          |  COUNT(*) AS x3
          | FROM nation JOIN customer ON c_nationkey = n_nationkey
          | WHERE c_acctbal > 0
          | GROUP BY n_name)
          |SELECT nation_name, total_bal_e2, n_cust FROM bal
          |WHERE n_cust > 5""".stripMargin,
        deletes = Map("customer" -> (col("c_custkey") % 13 === 0)))
    },

    sql("incremental_sql_cte_alias_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |bal(nation_name, total_bal_e2, n_cust) AS (
        | SELECT n_name, CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT),
        |  COUNT(*)
        | FROM nation JOIN c ON c_nationkey = n_nationkey
        | WHERE c_acctbal > 0
        | GROUP BY n_name)
        |SELECT nation_name, total_bal_e2, n_cust FROM bal
        |WHERE n_cust > 5""".stripMargin) {
      (s, dir) => runCteStreamed(s,
        """WITH bal(nation_name, total_bal_e2, n_cust) AS (
          | SELECT n_name AS x1,
          |  SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS x2,
          |  COUNT(*) AS x3
          | FROM nation JOIN customer ON c_nationkey = n_nationkey
          | WHERE c_acctbal > 0
          | GROUP BY n_name)
          |SELECT nation_name, total_bal_e2, n_cust FROM bal
          |WHERE n_cust > 5""".stripMargin,
        dir, Map("customer" -> (col("c_custkey") % 13 === 0)),
        "incremental_sql_cte_alias_stream")
    },

    // SET-SEMANTICS UNION CTE BODY — the UNION (not ALL) body
    // maintains through the CompiledUnionDistinct netting node (a
    // nation leaves the view only when NO branch still produces it),
    // and the outer query re-aggregates over the set. Deletes flip
    // tuples in both branches.
    sql("incremental_sql_cte_union_distinct",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0),
        |nat AS (
        | SELECT n_name FROM nation JOIN c ON c_nationkey = n_nationkey
        | WHERE c_acctbal > 8000
        | UNION
        | SELECT n_name FROM nation JOIN s ON s_nationkey = n_nationkey
        | WHERE s_acctbal > 5000)
        |SELECT COUNT(*) AS n_nations FROM nat""".stripMargin) {
      (s, dir) => SqlCompiler.runCte(s, dir,
        """WITH nat AS (
          | SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
          | WHERE c_acctbal > 8000
          | UNION
          | SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
          | WHERE s_acctbal > 5000)
          |SELECT COUNT(*) AS n_nations FROM nat""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "supplier" -> (col("s_suppkey") % 7 === 0)))
    },

    sql("incremental_sql_cte_union_distinct_stream",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0),
        |nat AS (
        | SELECT n_name FROM nation JOIN c ON c_nationkey = n_nationkey
        | WHERE c_acctbal > 8000
        | UNION
        | SELECT n_name FROM nation JOIN s ON s_nationkey = n_nationkey
        | WHERE s_acctbal > 5000)
        |SELECT COUNT(*) AS n_nations FROM nat""".stripMargin) {
      (s, dir) => runCteStreamed(s,
        """WITH nat AS (
          | SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
          | WHERE c_acctbal > 8000
          | UNION
          | SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
          | WHERE s_acctbal > 5000)
          |SELECT COUNT(*) AS n_nations FROM nat""".stripMargin,
        dir, Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "supplier" -> (col("s_suppkey") % 7 === 0)),
        "incremental_sql_cte_union_distinct_stream")
    },

    // … and on the TWS drivers: the set-CTE's branch trees + netting
    // node replay through transformWithState, same oracle.
    sql("incremental_sql_cte_union_distinct_tws",
      """WITH c AS (SELECT * FROM customer WHERE c_custkey % 13 <> 0),
        |     s AS (SELECT * FROM supplier WHERE s_suppkey % 7 <> 0),
        |nat AS (
        | SELECT n_name FROM nation JOIN c ON c_nationkey = n_nationkey
        | WHERE c_acctbal > 8000
        | UNION
        | SELECT n_name FROM nation JOIN s ON s_nationkey = n_nationkey
        | WHERE s_acctbal > 5000)
        |SELECT COUNT(*) AS n_nations FROM nat""".stripMargin) {
      (s, dir) => runCteStreamed(s,
        """WITH nat AS (
          | SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
          | WHERE c_acctbal > 8000
          | UNION
          | SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
          | WHERE s_acctbal > 5000)
          |SELECT COUNT(*) AS n_nations FROM nat""".stripMargin,
        dir, Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "supplier" -> (col("s_suppkey") % 7 === 0)),
        "incremental_sql_cte_union_distinct_tws", tws = true)
    },

    // DERIVED TABLE spelling of the same composition: an aliased
    // FROM (SELECT ...) t lifts to an anonymous CTE named by its
    // alias (SqlCompiler.liftDerivedTables) — the subquery is the
    // maintained view, the outer re-aggregates it against a dim.
    // Subquery PREDICATES (IN/EXISTS/scalar) are untouched by the
    // lift and stay on the gate compilers.
    sql("incremental_sql_from_subquery",
      """SELECT n_name, COUNT(*) AS n_customers,
        | CAST(SUM(t.n_orders) AS BIGINT) AS sum_orders
        |FROM (SELECT c_custkey, c_nationkey, COUNT(*) AS n_orders
        |      FROM customer, orders
        |      WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
        |       AND o_orderkey % 8 <> 0
        |      GROUP BY c_custkey, c_nationkey) t
        |JOIN nation ON n_nationkey = t.c_nationkey
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => SqlCompiler.runCte(s, dir,
        """SELECT n_name, COUNT(*) AS n_customers,
          | SUM(t.n_orders) AS sum_orders
          |FROM (SELECT c_custkey, c_nationkey, COUNT(*) AS n_orders
          |      FROM customer, orders
          |      WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
          |      GROUP BY c_custkey, c_nationkey) t
          |JOIN nation ON n_nationkey = t.c_nationkey
          |GROUP BY n_name""".stripMargin,
        deletes = Map("orders" -> (col("o_orderkey") % 8 === 0)))
    },

    sql("incremental_sql_from_subquery_stream",
      """SELECT n_name, COUNT(*) AS n_customers,
        | CAST(SUM(t.n_orders) AS BIGINT) AS sum_orders
        |FROM (SELECT c_custkey, c_nationkey, COUNT(*) AS n_orders
        |      FROM customer, orders
        |      WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
        |       AND o_orderkey % 8 <> 0
        |      GROUP BY c_custkey, c_nationkey) t
        |JOIN nation ON n_nationkey = t.c_nationkey
        |GROUP BY n_name""".stripMargin) {
      (s, dir) => runCteStreamed(s,
        """SELECT n_name, COUNT(*) AS n_customers,
          | SUM(t.n_orders) AS sum_orders
          |FROM (SELECT c_custkey, c_nationkey, COUNT(*) AS n_orders
          |      FROM customer, orders
          |      WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
          |      GROUP BY c_custkey, c_nationkey) t
          |JOIN nation ON n_nationkey = t.c_nationkey
          |GROUP BY n_name""".stripMargin,
        dir, Map("orders" -> (col("o_orderkey") % 8 === 0)),
        "incremental_sql_from_subquery_stream")
    },

    // CHAINED CTEs — the staged-SQL idiom: stage 1 (rev) reads base
    // relations, so it is the MAINTAINED view; stage 2 (ranked) reads
    // stage 1, so it classifies as a PRESENTATION CTE and evaluates as
    // stock SQL over the refreshed view (group-cardinality input) —
    // only the stage touching base data is input-proportional.
    sql("incremental_sql_cte_chain",
      """WITH rev AS (
        | SELECT n_name, c_custkey,
        |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderstatus = 'F' AND o_orderkey % 9 <> 0
        | GROUP BY n_name, c_custkey),
        |ranked AS (
        | SELECT n_name, c_custkey, rev_e2,
        |  CAST(RANK() OVER (PARTITION BY n_name
        |    ORDER BY rev_e2 DESC, c_custkey) AS BIGINT) AS rk
        | FROM rev)
        |SELECT n_name, c_custkey, rev_e2, rk
        |FROM ranked WHERE rk <= 3""".stripMargin) {
      (s, dir) => SqlCompiler.runCte(s, dir,
        """WITH rev AS (
          | SELECT n_name, c_custkey,
          |  SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_e2
          | FROM nation, customer, orders
          | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          |  AND o_orderstatus = 'F'
          | GROUP BY n_name, c_custkey),
          |ranked AS (
          | SELECT n_name, c_custkey, rev_e2,
          |  CAST(RANK() OVER (PARTITION BY n_name
          |    ORDER BY rev_e2 DESC, c_custkey) AS BIGINT) AS rk
          | FROM rev)
          |SELECT n_name, c_custkey, rev_e2, rk
          |FROM ranked WHERE rk <= 3""".stripMargin,
        deletes = Map("orders" -> (col("o_orderkey") % 9 === 0)))
    },

    sql("incremental_sql_cte_chain_stream",
      """WITH rev AS (
        | SELECT n_name, c_custkey,
        |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderstatus = 'F' AND o_orderkey % 9 <> 0
        | GROUP BY n_name, c_custkey),
        |ranked AS (
        | SELECT n_name, c_custkey, rev_e2,
        |  CAST(RANK() OVER (PARTITION BY n_name
        |    ORDER BY rev_e2 DESC, c_custkey) AS BIGINT) AS rk
        | FROM rev)
        |SELECT n_name, c_custkey, rev_e2, rk
        |FROM ranked WHERE rk <= 3""".stripMargin) {
      (s, dir) => runCteStreamed(s,
        """WITH rev AS (
          | SELECT n_name, c_custkey,
          |  SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_e2
          | FROM nation, customer, orders
          | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          |  AND o_orderstatus = 'F'
          | GROUP BY n_name, c_custkey),
          |ranked AS (
          | SELECT n_name, c_custkey, rev_e2,
          |  CAST(RANK() OVER (PARTITION BY n_name
          |    ORDER BY rev_e2 DESC, c_custkey) AS BIGINT) AS rk
          | FROM rev)
          |SELECT n_name, c_custkey, rev_e2, rk
          |FROM ranked WHERE rk <= 3""".stripMargin,
        dir, Map("orders" -> (col("o_orderkey") % 9 === 0)),
        "incremental_sql_cte_chain_stream")
    },

    // … and the chained view's maintained stage on the
    // TRANSFORMWITHSTATE drivers (the supported arbitrary-state API),
    // presentation stage over the final state — same oracle.
    sql("incremental_sql_cte_chain_tws",
      """WITH rev AS (
        | SELECT n_name, c_custkey,
        |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_e2
        | FROM nation, customer, orders
        | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND o_orderstatus = 'F' AND o_orderkey % 9 <> 0
        | GROUP BY n_name, c_custkey),
        |ranked AS (
        | SELECT n_name, c_custkey, rev_e2,
        |  CAST(RANK() OVER (PARTITION BY n_name
        |    ORDER BY rev_e2 DESC, c_custkey) AS BIGINT) AS rk
        | FROM rev)
        |SELECT n_name, c_custkey, rev_e2, rk
        |FROM ranked WHERE rk <= 3""".stripMargin) {
      (s, dir) => runCteStreamed(s,
        """WITH rev AS (
          | SELECT n_name, c_custkey,
          |  SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_e2
          | FROM nation, customer, orders
          | WHERE c_nationkey = n_nationkey AND o_custkey = c_custkey
          |  AND o_orderstatus = 'F'
          | GROUP BY n_name, c_custkey),
          |ranked AS (
          | SELECT n_name, c_custkey, rev_e2,
          |  CAST(RANK() OVER (PARTITION BY n_name
          |    ORDER BY rev_e2 DESC, c_custkey) AS BIGINT) AS rk
          | FROM rev)
          |SELECT n_name, c_custkey, rev_e2, rk
          |FROM ranked WHERE rk <= 3""".stripMargin,
        dir, Map("orders" -> (col("o_orderkey") % 9 === 0)),
        "incremental_sql_cte_chain_tws", tws = true)
    },

    // UNION ALL as a CTE body: each arm is its own maintained tree
    // (customer balances / supplier balances per nation), unioned at
    // refresh under the CTE's name; the outer re-aggregates the two
    // sides into one per-nation report — per-branch deletes flow to
    // whichever arm owns the relation.
    sql("incremental_sql_cte_union",
      """WITH bal AS (
        | SELECT n_name,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS bal_e2,
        |  COUNT(*) AS n
        | FROM nation, customer
        | WHERE c_nationkey = n_nationkey AND c_custkey % 13 <> 0
        | GROUP BY n_name
        | UNION ALL
        | SELECT n_name,
        |  CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS bal_e2,
        |  COUNT(*) AS n
        | FROM nation, supplier
        | WHERE s_nationkey = n_nationkey AND s_suppkey % 7 <> 0
        | GROUP BY n_name)
        |SELECT n_name, CAST(SUM(bal_e2) AS BIGINT) AS total_bal_e2,
        | CAST(SUM(n) AS BIGINT) AS n_parties
        |FROM bal GROUP BY n_name""".stripMargin) {
      (s, dir) => SqlCompiler.runCte(s, dir,
        """WITH bal AS (
          | SELECT n_name,
          |  SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS bal_e2,
          |  COUNT(*) AS n
          | FROM nation, customer
          | WHERE c_nationkey = n_nationkey
          | GROUP BY n_name
          | UNION ALL
          | SELECT n_name,
          |  SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS bal_e2,
          |  COUNT(*) AS n
          | FROM nation, supplier
          | WHERE s_nationkey = n_nationkey
          | GROUP BY n_name)
          |SELECT n_name, SUM(bal_e2) AS total_bal_e2, SUM(n) AS n_parties
          |FROM bal GROUP BY n_name""".stripMargin,
        deletes = Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "supplier" -> (col("s_suppkey") % 7 === 0)))
    },

    sql("incremental_sql_cte_union_stream",
      """WITH bal AS (
        | SELECT n_name,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS bal_e2,
        |  COUNT(*) AS n
        | FROM nation, customer
        | WHERE c_nationkey = n_nationkey AND c_custkey % 13 <> 0
        | GROUP BY n_name
        | UNION ALL
        | SELECT n_name,
        |  CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS bal_e2,
        |  COUNT(*) AS n
        | FROM nation, supplier
        | WHERE s_nationkey = n_nationkey AND s_suppkey % 7 <> 0
        | GROUP BY n_name)
        |SELECT n_name, CAST(SUM(bal_e2) AS BIGINT) AS total_bal_e2,
        | CAST(SUM(n) AS BIGINT) AS n_parties
        |FROM bal GROUP BY n_name""".stripMargin) {
      (s, dir) => runCteStreamed(s,
        """WITH bal AS (
          | SELECT n_name,
          |  SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS bal_e2,
          |  COUNT(*) AS n
          | FROM nation, customer
          | WHERE c_nationkey = n_nationkey
          | GROUP BY n_name
          | UNION ALL
          | SELECT n_name,
          |  SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS bal_e2,
          |  COUNT(*) AS n
          | FROM nation, supplier
          | WHERE s_nationkey = n_nationkey
          | GROUP BY n_name)
          |SELECT n_name, SUM(bal_e2) AS total_bal_e2, SUM(n) AS n_parties
          |FROM bal GROUP BY n_name""".stripMargin,
        dir, Map(
          "customer" -> (col("c_custkey") % 13 === 0),
          "supplier" -> (col("s_suppkey") % 7 === 0)),
        "incremental_sql_cte_union_stream")
    },

    // UNALIASED aggregates in HAVING — the common SQL spelling: each
    // distinct aggregate fragment joins the incremental fold under a
    // hidden alias (a second maintained fold when it also appears in
    // SELECT), the condition rewrites to the alias, and the hidden
    // columns drop after the filter. One aggregate here (the SUM) is
    // in no SELECT item at all — the case the old fence rejected.
    sql("incremental_sql_having_agg",
      """SELECT c_nationkey, COUNT(*) AS n_cust
        |FROM nation, customer
        |WHERE c_nationkey = n_nationkey AND c_custkey % 12 <> 0
        |GROUP BY c_nationkey
        |HAVING COUNT(*) > 20
        | AND SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) > 0""".stripMargin) {
      (s, dir) => SqlCompiler.run(s, dir,
        """SELECT c_nationkey, COUNT(*) AS n_cust
          |FROM nation, customer
          |WHERE c_nationkey = n_nationkey
          |GROUP BY c_nationkey
          |HAVING COUNT(*) > 20
          | AND SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) > 0""".stripMargin,
        deletes = Map("customer" -> (col("c_custkey") % 12 === 0)))
    },

    sql("incremental_sql_having_agg_stream",
      """SELECT c_nationkey, COUNT(*) AS n_cust
        |FROM nation, customer
        |WHERE c_nationkey = n_nationkey AND c_custkey % 12 <> 0
        |GROUP BY c_nationkey
        |HAVING COUNT(*) > 20
        | AND SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) > 0""".stripMargin) {
      (s, dir) => runSqlStreamed(s, SqlCompiler.compile(s, dir,
          """SELECT c_nationkey, COUNT(*) AS n_cust
            |FROM nation, customer
            |WHERE c_nationkey = n_nationkey
            |GROUP BY c_nationkey
            |HAVING COUNT(*) > 20
            | AND SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) > 0""".stripMargin),
        dir, Map("customer" -> (col("c_custkey") % 12 === 0)),
        "incremental_sql_having_agg_stream_leaf")
    })
}
