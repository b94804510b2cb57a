package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev utility: dump `.explain("formatted")` for a set of registered
  * queries into one file per query — the before/after plan evidence an
  * optimization round commits under `plans/<round>/`.
  *
  * `sbt "runMain graft.PlanDump plans/r16 before [names…]"` — with no
  * names, dumps every Bench headliner. The session mirrors Bench's
  * config (local[$SPARK_GRAFT_CPUS], shuffle partitions = cpus, AQE on)
  * so the captured initial plan is the one the bench executes. Queries
  * whose entry REPLAYS work eagerly (changelog replays, fixpoint loops)
  * still dump the plan of the returned frame — the final leg — which is
  * the comparable artifact for those entries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [queryName…]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.benchNames
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, d)
        val txt = df.queryExecution.explainString(FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
          (s"-- $name @ $d (shuffle=$cpus, AQE initial plan)\n" + txt).getBytes("UTF-8"))
        println(s"[plandump] $name -> ${outDir.resolve(s"${name}_$suffix.txt")}")
      } catch { case e: Throwable =>
        println(s"[plandump] $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
