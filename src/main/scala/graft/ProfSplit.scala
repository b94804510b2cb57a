package graft

import org.apache.spark.sql.SparkSession

/** Scratch: split a compiled-SQL entry's wall time into DataFrame
  * construction (driver-side compile + plan build) vs execution. */
object ProfSplit {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/nation.parquet").count()
    for (name <- args; _ <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, d)
      val t1 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t2 = System.nanoTime()
      println(f"[split] $name%-45s build ${(t1-t0)/1e9}%6.2f s  exec ${(t2-t1)/1e9}%6.2f s")
    }
    spark.stop()
  }
}
