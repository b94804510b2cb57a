package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: phase timing of the recursive-paths BFS (dev tool).
  * Reproduces RecursiveSql.run's work step by step with timestamps so
  * the per-phase cost (helper materialize, anchor, each BFS round's
  * step/dedup/checkpoint) is visible without the Spark UI. */
object ProfRec {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark.newSession()
    Tables.names.foreach(t => Tables.load(s, d, t).createOrReplaceTempView(t))
    var t0 = System.nanoTime()
    def mark(what: String): Unit = {
      val t1 = System.nanoTime()
      println(f"[profrec] $what%-28s ${(t1 - t0) / 1e9}%7.3f s")
      t0 = t1
    }
    // passes 1-2: the current shape (pass1 pays codegen/JIT);
    // passes 3-4: count-driven broadcast hints on the frontier view and
    // the accumulator's anti side (we KNOW their exact row counts from
    // the checkpoint counts — the planner does not, so it starts at SMJ
    // and relies on AQE conversions every round)
    (1 to 4).foreach { pass =>
      val hinted = pass >= 3
      val edges = s.sql(
        """SELECT 'c' || CAST(o_custkey AS STRING) AS src,
          |       's' || CAST(l_suppkey AS STRING) AS dst
          |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          |UNION ALL
          |SELECT 's' || CAST(l_suppkey AS STRING) AS src,
          |       'c' || CAST(o_custkey AS STRING) AS dst
          |FROM orders JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin)
        .localCheckpoint(true)
      edges.createOrReplaceTempView("edges")
      mark(s"pass$pass edges checkpoint")
      val anchor = s.sql(
        "SELECT 's' || CAST(s_suppkey AS STRING) AS node FROM supplier WHERE s_nationkey = 1")
        .distinct()
      var acc = anchor.localCheckpoint(true)
      var n = acc.count()
      mark(s"pass$pass anchor ($n rows)")
      var frontier = acc
      var deltas = Seq(acc)
      var round = 0
      var live = true
      while (live && round < 20) {
        round += 1
        (if (hinted) frontier.hint("broadcast") else frontier)
          .createOrReplaceTempView("r")
        val step = s.sql("SELECT e.dst AS node FROM edges e JOIN r ON r.node = e.src")
        val accU = deltas.reduce(_ unionAll _)
        val fresh = step.distinct()
          .except(if (hinted) accU.hint("broadcast") else accU)
          .localCheckpoint(true)
        val m = fresh.count()
        mark(s"pass$pass round$round ($m new)")
        if (m == 0) live = false
        else { deltas = deltas :+ fresh; frontier = fresh }
      }
      val out = deltas.reduce(_ unionAll _)
      out.queryExecution.toRdd.count()
      mark(s"pass$pass outer read")
    }
    spark.stop()
  }
}
