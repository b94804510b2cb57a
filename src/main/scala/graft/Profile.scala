package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time any registered queries at a given SF.
  * `sbt "runMain graft.Profile q10_flagship dedup_exact"` with
  * SPARK_GRAFT_SF_DIR selecting the fixture (default sf0.1). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/nation.parquet").count() // session warm-up
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      // queries that cache/checkpoint (CDC lines, connected components)
      // must not distort later measurements in a full sweep
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // toRdd.count() like Bench: runs the plan as written (df.count()
      // would let column pruning delete pure projections)
      val n = SparkEntry.queries(name)(spark, d).queryExecution.toRdd.count()
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
