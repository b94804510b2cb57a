package graft

import org.apache.spark.sql.SparkSession

/** Scratch: list every registered query whose physical plan contains a
  * nested-loop join (audit helper). */
object ProfPlans {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        val bad = Seq("BroadcastNestedLoopJoin", "CartesianProduct").filter(plan.contains)
        if (bad.nonEmpty) println(s"[plans] $name: ${bad.mkString(", ")}")
      } catch { case e: Throwable => println(s"[plans] $name ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
