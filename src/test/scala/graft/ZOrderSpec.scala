package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.ZOrder

class ZOrderSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfTiny}
  import spark.implicits._

  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zkey is the bit-interleave (checked against a per-bit reference)") {
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L), (65536L + 3L, 2L)) // wraps past 16 bits
    val got = samples.toDF("a", "b")
      .select(ZOrder.zkey(col("a"), col("b")).as("z")).as[Long].collect()
    samples.map { case (a, b) => mortonRef(a & 65535L, b & 65535L) }
      .zip(got).foreach { case (want, z) => assert(z == want) }
  }

  test("z-ordered layout clusters 2-D box queries into few partitions, both dims") {
    // dimensions SCALED to the 16-bit key width (see writeZOrdered's
    // scaladoc) — deterministic pseudo-uniform grid
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val rows = (0 until 20000)
      .map(i => (i.toLong, (i.toLong * 37) % 65536, (i.toLong * 101) % 65536))
      .toDF("id", "a", "b")
    ZOrder.writeZOrdered(rows, dir, col("a"), col("b"), buckets = 16)
    val table = spark.read.parquet(dir)
    val nBuckets = table.select("zbucket").distinct().count()
    assert(nBuckets == 16, s"uniform dims must fill all buckets: $nBuckets")

    // a box query selective in BOTH dims touches few z-buckets…
    val box = col("a") < 16384 && col("b") < 16384
    val boxBuckets = table.filter(box).select("zbucket").distinct().count()
    assert(boxBuckets * 4 <= nBuckets,
      s"box touches $boxBuckets of $nBuckets buckets — no locality")
    // …and reading ONLY those partitions returns exactly the box rows
    val bucketIds = table.filter(box).select("zbucket").distinct()
      .as[Long].collect().sorted.toSeq
    val pruned = spark.read.parquet(dir)
      .filter(col("zbucket").isin(bucketIds.map(Long.box): _*))
      .filter(box)
    val full = table.filter(box)
    assert(pruned.count() == full.count() && full.count() > 0)
    // the zbucket restriction lands in PartitionFilters (directory
    // pruning), not a data filter
    val scan = pruned.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("zbucket"), scan.take(800))

    // a SINGLE-dim half-range also prunes (the z-curve's point): low-b
    // rows can never reach the buckets whose b-top-bit is set
    val oneDim = table.filter(col("b") < 16384).select("zbucket").distinct().count()
    assert(oneDim * 2 <= nBuckets, s"b range touches $oneDim of $nBuckets")
  }
}
