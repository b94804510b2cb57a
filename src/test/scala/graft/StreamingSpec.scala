package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.DeltaEngine._

/** End-to-end Structured Streaming run of the AJU chain: two stateful
  * nodes chained as flatMapGroupsWithState stages, inserts in
  * micro-batch 1, deletes in micro-batch 2, state carried across
  * batches by the state store. Net leaf deltas must cancel to the
  * surviving view.
  */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val parentSpec = NodeSpec("P", "pk", "pk", isRoot = true, setSemantics = true)
  private val childSpec = NodeSpec("C", "fk", "fk",
    predicate = _.getOrElse("v", "").toInt >= 10)

  test("chained flatMapGroupsWithState maintains the join across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val pStream = MemoryStream[Evt]
    val cStream = MemoryStream[Evt]
    val leaf = runStream(Seq(parentSpec, childSpec),
      Map("P" -> pStream.toDS(), "C" -> cStream.toDS()))
    val query = leaf.writeStream
      .format("memory").queryName("aju_leaf").outputMode("append").start()
    try {
      // batch 1: parent 1 alive, three children (one failing the predicate)
      pStream.addData(Evt(0, false, 1, 1, "1", Map("pk" -> "1", "pname" -> "p1")))
      cStream.addData(
        Evt(1, false, 1, 1, "1", Map("fk" -> "1", "cid" -> "a", "v" -> "12")),
        Evt(2, false, 1, 1, "1", Map("fk" -> "1", "cid" -> "b", "v" -> "11")),
        Evt(3, false, 1, 1, "1", Map("fk" -> "1", "cid" -> "c", "v" -> "5")))
      query.processAllAvailable()
      val afterInsert = spark.table("aju_leaf").collect()
      assert(afterInsert.length == 2, "two qualifying children joined")

      // batch 2: delete child b, then kill the parent → full retraction
      cStream.addData(Evt(4, false, -1, 1, "1", Map("fk" -> "1", "cid" -> "b", "v" -> "11")))
      pStream.addData(Evt(5, false, -1, 1, "1", Map("pk" -> "1", "pname" -> "p1")))
      query.processAllAvailable()
      val all = spark.table("aju_leaf").as[Evt].collect()
      val net = all.map(e => e.tag * e.mult).sum
      assert(net == 0, s"view empty after parent death, got net=$net")
      // per-tuple cancellation
      val byTuple = all.groupBy(_.cols("cid")).view.mapValues(_.map(e => e.tag * e.mult).sum)
      assert(byTuple.forall(_._2 == 0))
    } finally query.stop()
  }

  test("streaming Q10 tree over micro-batches equals the batch run (sf0.001)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.IncrementalQueries
    val dir = SparkTestSession.sfTiny

    val logs = IncrementalQueries.q10Changelogs(spark, dir)
      .view.mapValues(_.collect().toSeq).toMap
    // micro-batch plan: 1 = first half of the inserts, 2 = the rest of
    // the inserts, 3 = all deletes (seq=1) — state must carry across
    // batches and parent deaths must fan out to children inserted in
    // EARLIER batches.
    val streams = logs.map { case (rel, _) => rel -> MemoryStream[Evt] }
    val out = runStream(IncrementalQueries.q10Tree, streams.map { case (r, ms) => r -> ms.toDS() })
    val query = out.writeStream
      .format("memory").queryName("q10_leaf").outputMode("append").start()
    try {
      def half(evs: Seq[Evt], first: Boolean): Seq[Evt] =
        evs.filter(e => (e.key.hashCode & 1) == (if (first) 0 else 1))
      streams.foreach { case (rel, ms) =>
        val ins = logs(rel).filter(_.seq == 0L)
        if (half(ins, first = true).nonEmpty) ms.addData(half(ins, first = true))
      }
      query.processAllAvailable()
      streams.foreach { case (rel, ms) =>
        val ins = logs(rel).filter(_.seq == 0L)
        if (half(ins, first = false).nonEmpty) ms.addData(half(ins, first = false))
      }
      query.processAllAvailable()
      streams.foreach { case (rel, ms) =>
        val dels = logs(rel).filter(_.seq == 1L)
        if (dels.nonEmpty) ms.addData(dels)
      }
      query.processAllAvailable()

      def fold(evts: Seq[Evt]): Map[String, Int] =
        evts.groupBy(_.row).view.mapValues(_.map(e => e.tag * e.mult).sum)
          .filter(_._2 != 0).toMap

      val streamed = fold(spark.table("q10_leaf").as[Evt].collect().toSeq)
      val batched = fold(
        runBatch(IncrementalQueries.q10Tree,
          IncrementalQueries.q10Changelogs(spark, dir)).collect().toSeq)
      assert(batched.nonEmpty, "batch leaf view must be non-trivial")
      assert(streamed == batched)
    } finally query.stop()
  }
}
