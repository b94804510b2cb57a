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
  /** `events.ts` is written with nanosecond precision, which Spark's
    * parquet reader rejects by default. Read it as raw nanos (legacy
    * conf) and truncate to a microsecond `TimestampType` — integer
    * division, NOT double division: ns-since-epoch (~1.7e18) exceeds
    * double's 53-bit mantissa.
    *
    * NOTE: `nanosAsLong` has no per-read DataFrameReader option
    * (verified against ParquetOptions in Spark 4.1.2), so this loader
    * must go through the session conf. The set is guarded so repeat
    * calls don't churn the conf map, and it is a documented, visible
    * side effect of loading `events`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    if (!s.conf.getOption(k).contains("true")) s.conf.set(k, "true")
    val raw = load(s, d, "events")
    raw.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
