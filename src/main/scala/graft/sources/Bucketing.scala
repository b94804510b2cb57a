package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.GraftQuery.sql

/** Bucketed-table sink + co-located join — the shuffle-elimination
  * path for repeated large-×-large joins on a stable key.
  *
  * At 100 TB, a fact-×-fact join (orders ⋈ lineitem on orderkey)
  * shuffles BOTH sides on every query. Writing each side
  * `bucketBy(n, key)` once makes the storage layout the partitioning:
  * every later join on that key reads bucket i of each side into the
  * same task — zero `Exchange` in the plan (asserted in
  * BucketingSpec). The bucket count is the write-time knob that must
  * be sized for the target scale (buckets ≈ cluster cores × small
  * factor; each bucket must fit a task's memory for the sort).
  *
  * This is the Spark-native analogue of the reference keeping its
  * join tree permanently partitioned by each hop's key (`keyBy`,
  * DataFlow.java:45-56): the partitioning lives in the table layout
  * instead of operator state.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two tables previously written with [[writeBucketed]] on
    * the same key and bucket count — planned with no shuffle. */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Write a DataFrame as a DIRECTORY-PARTITIONED parquet layout (one
    * directory per value of `partitionCol`) — the persisted form of an
    * IVF index: the coarse-quantizer cell id becomes the physical
    * layout, so a probe that filters on its nprobe cells reads ONLY
    * those directories (partition pruning, `PartitionFilters` in the
    * scan — asserted in SimilaritySpec). At 100 TB this is the
    * difference between a probe scanning the corpus and scanning
    * corpus/C × nprobe. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Read back a partitioned layout with a partition-value filter the
    * planner prunes against the directory structure. */
  def readPartition(spark: SparkSession, path: String, partitionCol: String,
                    values: Seq[Long]): DataFrame =
    spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col(partitionCol)
        .isin(values.map(Long.box): _*))

  val defs: Seq[GraftQuery] = Seq(
    // The co-located join behind the hash gate: both fact sides written
    // bucketed on the join key ONCE, the join planned with ZERO
    // shuffles (self-asserted — the only exchange in the whole plan is
    // the final rollup's), values gated against the plain SQL join.
    // Broadcast is disabled in the child session so the assert really
    // exercises the bucketed sort-merge path — at 100 TB neither side
    // broadcasts anyway, which is exactly when bucketing pays.
    sql("bucketed_join_revenue",
      """SELECT o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS rev_e4
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin) {
      (s, d) =>
        val ss = s.newSession()              // conf must not leak
        ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        writeBucketed(Tables.orders(ss, d).select("o_orderkey", "o_orderpriority"),
          "graft_bkt_orders", "o_orderkey", 8)
        writeBucketed(Tables.lineitem(ss, d)
            .select(col("l_orderkey").as("o_orderkey"),
              floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000
                + lit(0.5)).cast("long").as("rev")),
          "graft_bkt_lineitem", "o_orderkey", 8)
        try {
          val agg = bucketedJoin(ss, "graft_bkt_orders", "graft_bkt_lineitem", "o_orderkey")
            .groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("n"), sum(col("rev")).as("rev_e4"))
          val executed = agg.queryExecution.executedPlan match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              a.executedPlan
            case p => p
          }
          val shuffles = executed.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
          }
          require(shuffles.size <= 1,
            s"bucketed join bought a shuffle: ${shuffles.map(_.nodeName)}")
          // materialize before the table drop below invalidates the scan
          agg.localCheckpoint(eager = true)
        } finally {
          ss.sql("DROP TABLE IF EXISTS graft_bkt_orders")
          ss.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
        }
    })
}
