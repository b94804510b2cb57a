package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev utility: dump the formatted physical plan of a registered
  * query. `sbt "runMain graft.Explain q10_flagship [sfDir]"`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.001"))
    println(df.queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
