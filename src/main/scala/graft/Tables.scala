package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central loader for the driver-generated parquet fixtures.
  *
  * All columns are read as-is (the parquet schemas carry proper types:
  * int64 keys, double measures, timestamp dates). Every query goes
  * through `select` early so Catalyst pushes column pruning and filter
  * predicates into the vectorized parquet scan — at 100 TB that pruning
  * is the difference between reading 2 columns and reading 11.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped in two fixture vintages: int64 nanoseconds
    * (which Spark's parquet reader rejects unless the legacy
    * `nanosAsLong` conf is set) and native `timestamp[us]`. This loader
    * adapts to whichever vintage is on disk by branching on the loaded
    * column's dataType:
    *
    *  - `TimestampType` → pass through unchanged.
    *  - `TimestampNTZType` (native `timestamp[us]` without a tz flag)
    *    → cast to `TimestampType`. Every session in this repo pins
    *    `spark.sql.session.timeZone=UTC`, so the cast is
    *    value-preserving and keeps one stable downstream type across
    *    vintages (window(), watermarks, and the oracle dumps all see
    *    the same micros-since-epoch either way).
    *  - `LongType` (raw nanos via the legacy conf) → truncate to
    *    microseconds with integer division, NOT double division:
    *    ns-since-epoch (~1.7e18) exceeds double's 53-bit mantissa.
    *
    * The first load is attempted WITHOUT touching session conf; only if
    * the reader rejects the nanos column (legacy fixture) do we set
    * `nanosAsLong` and retry — so a µs-native fixture never has its
    * session's parquet behavior silently altered. `nanosAsLong` has no
    * per-read DataFrameReader option (verified against ParquetOptions
    * in Spark 4.1.2), so the legacy branch must go through session
    * conf; that set is a documented, visible side effect of loading a
    * nanos-vintage `events`.
    */
  /** True iff `e` (or a cause) is specifically the reader's rejection
    * of an INT64 nanos timestamp column — the only failure for which
    * the `nanosAsLong` retry is the cure. Spark raises it under error
    * class `PARQUET_TYPE_ILLEGAL` / message "Illegal Parquet type";
    * anything else (missing dir, corrupt footer, permissions) must
    * propagate untouched, without the conf side effect.
    */
  private def isNanosRejection(e: Throwable): Boolean =
    e != null && (
      { val m = Option(e.getMessage).getOrElse("")
        m.contains("Illegal Parquet type") || m.contains("PARQUET_TYPE_ILLEGAL") } ||
      isNanosRejection(e.getCause))

  def events(s: SparkSession, d: String): DataFrame = {
    val raw =
      try load(s, d, "events")
      catch {
        case scala.util.control.NonFatal(e) if isNanosRejection(e) =>
          val k = "spark.sql.legacy.parquet.nanosAsLong"
          if (!s.conf.getOption(k).contains("true")) s.conf.set(k, "true")
          load(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
