package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: phase timing of the recursive-paths BFS (dev tool).
  * Reproduces RecursiveSql.run's work step by step with timestamps so
  * the per-phase cost (helper materialize, anchor, each BFS round's
  * step/dedup/checkpoint) is visible without the Spark UI.
  *
  * Passes 1-2: round 16's shape — eager localCheckpoint + separate
  * count per round, count-gated broadcast HINTS on the frontier view
  * and the accumulator's anti side.
  * Passes 3-4: round 17's shape — GraftBridge.localCheckpointCounted
  * fuses the materializing job with the count and stamps each frame
  * with exact statistics; NO hints (the planner broadcasts from the
  * real sizes under spark.sql.autoBroadcastJoinThreshold).
  * Same JVM, interleaved, so the comparison is noise-controlled. */
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
    import org.apache.spark.sql.{DataFrame, GraftBridge}
    // old: eager checkpoint then a SECOND count job; new: one fused job
    def ckptOld(df: DataFrame): (DataFrame, Long) = {
      val c = df.localCheckpoint(true); (c, c.count())
    }
    def ckptNew(df: DataFrame): (DataFrame, Long) =
      GraftBridge.localCheckpointCounted(df)
    (1 to 6).foreach { pass =>
      val fused = pass >= 4 || pass == 2
      val hinted = !fused // old shape used hints; new relies on stats
      val ckpt: DataFrame => (DataFrame, Long) =
        if (fused) ckptNew else ckptOld
      val edgesSql = s.sql(
        """SELECT 'c' || CAST(o_custkey AS STRING) AS src,
          |       's' || CAST(l_suppkey AS STRING) AS dst
          |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          |UNION ALL
          |SELECT 's' || CAST(l_suppkey AS STRING) AS src,
          |       'c' || CAST(o_custkey AS STRING) AS dst
          |FROM orders JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin)
      val edges =
        if (fused) GraftBridge.localCheckpointStats(edgesSql)
        else edgesSql.localCheckpoint(true)
      edges.createOrReplaceTempView("edges")
      mark(s"pass$pass edges checkpoint")
      val anchor = s.sql(
        "SELECT 's' || CAST(s_suppkey AS STRING) AS node FROM supplier WHERE s_nationkey = 1")
        .distinct()
      val (acc0, n0) = ckpt(anchor)
      mark(s"pass$pass anchor ($n0 rows)")
      var frontier = acc0
      var deltas = Seq(acc0)
      var round = 0
      var live = true
      while (live && round < 20) {
        round += 1
        (if (hinted) frontier.hint("broadcast") else frontier)
          .createOrReplaceTempView("r")
        val step = s.sql("SELECT e.dst AS node FROM edges e JOIN r ON r.node = e.src")
        val accU = deltas.reduce(_ unionAll _)
        val (fresh, m) = ckpt(step.distinct()
          .except(if (hinted) accU.hint("broadcast") else accU))
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
