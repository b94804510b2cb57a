package graft

import org.apache.spark.sql.SparkSession

/** Targeted per-query timing harness (dev tool, not the driver
  * surface): times the named queries N times each in one JVM and
  * prints every sample — the tool for isolating warm-floor questions
  * like the r12 `ancestor_del` discrepancy without a full Bench run. */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_MINI_RUNS", "4").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("incremental_sql_q10_fullouter_ancestor_del")
    names.foreach { name => // warm-up on tiny
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
      catch { case e: Throwable => System.err.println(s"warmup $name: ${e.getMessage}") }
    }
    (1 to n).foreach { r =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
        println(f"[mini] $name run$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
