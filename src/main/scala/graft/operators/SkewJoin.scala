package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.GraftQuery.sql

/** Salted equi-join for skewed key distributions.
  *
  * A hash-partitioned join sends every row of a hot key to ONE task;
  * at 100 TB a single key holding 1% of the fact table stalls the
  * stage on one straggler. Salting splits each key into `salts`
  * sub-keys: the big side gets a deterministic salt derived from its
  * whole row, the small side is replicated once per salt value, and
  * the join key becomes (key, salt) — the hot key's rows spread over
  * `salts` tasks at the cost of replicating the small side ×salts.
  *
  * AQE's skew-join handling covers sort-merge joins after the fact;
  * salting is the explicit fix when AQE can't help (stateful
  * aggregations over the join output, storage-partitioned layouts, or
  * skew known up front).
  *
  * The salt is `pmod(hash(monotonically_increasing_id, all big-side
  * columns), salts)`: the row-id term spreads hot keys even when their
  * rows are byte-identical (a pure content hash would send 1M copies
  * of the same row to one sub-key — the exact straggler this utility
  * exists to prevent), and it stays stable under task retries for
  * deterministic sources, unlike a `rand()` salt (a re-executed
  * partition would re-salt differently mid-shuffle).
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // pick a scratch column name no input actually uses
    val taken = (big.columns ++ small.columns).toSet
    val saltCol = LazyList.from(0).map(i => s"_graft_salt$i").find(!taken.contains(_)).get
    val saltedBig = big.withColumn(saltCol,
      pmod(hash(monotonically_increasing_id() +: big.columns.map(col): _*), lit(salts)))
    val replicatedSmall = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(replicatedSmall, Seq(key, saltCol))
      .drop(saltCol)
  }

  val defs: Seq[GraftQuery] = Seq(
    // The salted join behind the hash gate: brand-level rollup of the
    // lineitem⋈part join routed through the (key, salt) widened
    // exchange, gated against the PLAIN join's SQL — salting must be
    // answer-invariant, which is exactly what makes it deployable as
    // a mechanical de-skew. (The tree-engine flavors
    // incremental_*_salted gate the stateful path; this is the batch
    // operator.)
    sql("skew_salted_join",
      """SELECT p_brand, COUNT(*) AS n,
        | CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_e2
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |GROUP BY p_brand""".stripMargin) {
      (s, d) =>
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey").as("pk"), col("l_quantity"))
        val pt = Tables.part(s, d)
          .select(col("p_partkey").as("pk"), col("p_brand"))
        saltedJoin(li, pt, "pk", salts = 8)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("l_quantity") * 100 + lit(0.5)).cast("long")).as("qty_e2"))
    })
}
