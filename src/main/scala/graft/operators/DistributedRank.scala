package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global ranking — the scale-safe replacement for
  * `Window.orderBy(...)` with no `partitionBy` (which funnels EVERY
  * row through one task: the classic single-partition-window
  * bottleneck; reference semantics per
  * Zxi-i/Flink-and-acyclic-schema's global-ordering aggregates are
  * preserved, the execution shape is not).
  *
  * Algorithm (the textbook two-phase sample sort ranking, cf. the
  * TeraSort pattern):
  *   1. `repartitionByRange` on the sort key — a sampled range
  *      exchange; every partition holds a contiguous key range and
  *      partition ids ascend with the global order.
  *   2. `localCheckpoint()` the partitioned frame so BOTH downstream
  *      jobs (the per-partition count job and the final plan) read
  *      the SAME materialized partitioning — range boundaries come
  *      from sampling, so re-executing the exchange could re-draw
  *      them; pinning the RDD makes pid↔offset consistent.
  *   3. One tiny job counts rows per partition (bounded by the
  *      shuffle-partition count, NOT data size) → cumulative offsets,
  *      shipped back as a broadcast-sized map literal.
  *   4. Per-partition `row_number` (a PARTITIONED window — parallel)
  *      plus the partition's offset = exact 1-based global rank.
  *
  * Requirements: the sort columns must form a TOTAL order (callers
  * append a unique key as the last tie-breaker) — with ties the
  * per-partition row_number would be nondeterministic across the
  * range boundary. Every stage is partitioned; driver-side state is
  * one (pid, count) pair per shuffle partition.
  */
object DistributedRank {

  /** Adds column `name` = exact 1-based global rank of each row under
    * `sortCols` (which must be a total order). Returns (frame, n)
    * where n is the total row count — callers that cut ranks into
    * tiles need it and the count job already computed it. */
  def withGlobalRank(df: DataFrame, name: String, sortCols: Column*): (DataFrame, Long) = {
    val parted = df
      .repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts: Array[(Int, Long)] = parted
      .groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .collect() // bounded: one row per shuffle partition (~parallelism), never per data row
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val total = counts.map(_._2).sum
    // offset(pid) = rows in all partitions before pid
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }.toMap
    }
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val ranked = parted
      .withColumn(name,
        row_number().over(w).cast("long") +
          coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L)))
      .drop("__pid")
    (ranked, total)
  }

  /** SQL-standard NTILE(k) bucket for a known 1-based rank out of n
    * total rows: the first `n % k` buckets get `n/k + 1` rows, the
    * rest `n/k` — identical to Spark's and DuckDB's NTILE. Pure
    * arithmetic on the global rank, so it composes with
    * [[withGlobalRank]] into a fully partitioned NTILE. */
  def ntileOfRank(rank: Column, n: Long, k: Int): Column = {
    require(k > 0, s"ntile k must be positive, got $k")
    val q = n / k
    val rem = (n % k).toInt
    val cut = rem * (q + 1) // rows covered by the wide (q+1-sized) buckets
    if (q == 0) rank.cast("int") // n < k: bucket i holds exactly row i
    else
      when(rank <= cut, ((rank - 1) / (q + 1) + 1))
        .otherwise(lit(rem) + (rank - cut - 1) / q + 1)
        .cast("int")
  }

  /** NTILE(k) over a total order, with no single-partition window:
    * global rank via [[withGlobalRank]], then the bucket arithmetic. */
  def withNtile(df: DataFrame, name: String, k: Int, sortCols: Column*): DataFrame = {
    val rankCol = "__rk_" + name
    val (ranked, n) = withGlobalRank(df, rankCol, sortCols: _*)
    ranked.withColumn(name, ntileOfRank(col(rankCol), n, k)).drop(rankCol)
  }
}
