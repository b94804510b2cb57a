package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
