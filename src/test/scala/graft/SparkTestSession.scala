package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (Spark re-uses the
  * active session across suites; tearing it down per-suite thrashes). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    // local[16]: every suite shares this ONE context, and with the
    // suites (and the heavy suites' tests) running in parallel,
    // 4 executor threads were the whole run's throughput ceiling —
    // the 20-minute wall was scheduler starvation, not test work
    val s = SparkSession.builder()
      .master("local[16]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfTiny = "/root/testdata/sf0.001"
}
