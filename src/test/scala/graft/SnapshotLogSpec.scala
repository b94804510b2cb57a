package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog

class SnapshotLogSpec extends AnyFunSuite with org.scalatest.ParallelTestExecution {
  import SparkTestSession.{spark, sfTiny}
  import spark.implicits._

  test("time travel: v0 reads back the original snapshot after the v1 commit") {
    val root = SnapshotLog.ordersTableRoot(spark, sfTiny)
    val orders = Tables.orders(spark, sfTiny)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val v0 = SnapshotLog.readVersion(spark, root, 0).drop("b")
    assert(v0.exceptAll(orders).isEmpty && orders.exceptAll(v0).isEmpty &&
      v0.count() == orders.count())
    // v1 differs from v0 exactly on the three pinned buckets' rows
    val v1 = SnapshotLog.readVersion(spark, root, 1).drop("b")
    assert(v1.count() ==
      orders.count() -
        orders.filter(col("o_orderkey") % 160 === 0).count() +
        orders.filter(col("o_orderkey") % 160 === 2).count())
    // physical copy-on-write: the v1 attempt dir holds ONLY the
    // touched buckets (resolved by name prefix — one attempt ran)
    val v1Dirs = new java.io.File(root).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("v1-"))
    assert(v1Dirs.length == 1, v1Dirs.map(_.getName).toSeq)
    val v1Buckets = v1Dirs.head.listFiles()
      .filter(_.getName.startsWith("b=")).map(_.getName).toSet
    assert(v1Buckets == Set("b=0", "b=1", "b=2"), v1Buckets)
  }

  test("CHECK constraints: one-pass counting, NULL=violation, D rows exempt, reject leaves no trace") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_check").toString
    val t = (0L until 32L).map(k => (k, k * 10.0)).toDF("k", "price")
    SnapshotLog.commitInitial(t, dir, "k")
    SnapshotLog.setConstraints(dir, Map("pos" -> "price > 0", "cap" -> "price < 1e6"))
    assert(SnapshotLog.constraints(dir) == Map("pos" -> "price > 0", "cap" -> "price < 1e6"))
    // NULL predicate result counts as a violation (CHECK admits only proven-TRUE)
    val probe = Seq(Some(5.0), None, Some(-1.0)).toDF("price")
    val v = SnapshotLog.constraintViolations(probe, Map("pos" -> "price > 0"))
    assert(v == Map("pos" -> 2L))
    // a D row carrying a violating payload must NOT block the delete
    val del = Seq((3L, "D", -99.0)).toDF("k", "op", "price")
    SnapshotLog.commitMergeChecked(spark, dir, 1, "k", Seq("price"), del)
    assert(SnapshotLog.readVersion(spark, dir, 1).count() == 31)
    // a violating U aborts naming BOTH failed constraints; no v2 artifacts
    val bad = Seq((4L, "U", -1.0), (5L, "U", 2e6)).toDF("k", "op", "price")
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.commitMergeChecked(spark, dir, 2, "k", Seq("price"), bad)
    }
    assert(e.getMessage.contains("pos") && e.getMessage.contains("cap"))
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(!files.exists(_.startsWith("_manifest_v2")), files.toSeq)
    assert(!files.exists(_.startsWith("v2-")), files.toSeq)
  }

  test("preImages: bucket-pruned lookup of exactly the asked keys") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_pre").toString
    // keys 0..31 → buckets 0..15, two rows each
    val t = (0L until 32L).map(k => (k, k * 10.0)).toDF("k", "price")
    SnapshotLog.commitInitial(t, dir, "k")
    // keys 0 and 16 share bucket 0; 99 is absent (bucket 3)
    val asked = Seq(0L, 16L, 99L).toDF("k")
    val pre = SnapshotLog.preImages(spark, dir, 0, "k", asked)
    assert(pre.select("k", "price").orderBy("k").as[(Long, Double)]
      .collect().toSeq == Seq((0L, 0.0), (16L, 160.0)))
    // pruning reached the scan: every file read lives under b=0 or b=3
    val files = pre.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty &&
      files.forall(f => f.contains("/b=0/") || f.contains("/b=3/")), files.toSeq)
    assert(!files.exists(_.contains("/b=1/")))
    // empty key set: typed empty result, no manifest requirement tripped
    assert(SnapshotLog.preImages(spark, dir, 0, "k", Seq.empty[Long].toDF("k")).isEmpty)
    // a bucket fully EMPTIED by deletes: pre-image read of its keys is
    // empty, not a crash (the dir exists but has no b=<i> subdir)
    val wipe = Seq((3L, "D", 0.0), (19L, "D", 0.0)).toDF("k", "op", "price")
    SnapshotLog.commitMerge(spark, dir, 1, "k", Seq("price"), wipe)
    assert(SnapshotLog.preImages(spark, dir, 1, "k", Seq(3L, 19L).toDF("k")).isEmpty)
  }

  test("auditDelta: fold equals rescan across mixed U/D/I commits incl. matched-I and unmatched-U") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_audit").toString
    val cs = Map("pos" -> "price > 0", "cap" -> "price < 100")
    // v0: keys 0..9, prices -5,5,15,...,85 → pos fails on key 0, cap on none
    val t = (0L until 10L).map(k => (k, k * 10.0 - 5.0)).toDF("k", "price")
    SnapshotLog.commitInitial(t, dir, "k")
    var audit = SnapshotLog.constraintViolations(
      SnapshotLog.readVersion(spark, dir, 0), cs)
    def commitAndFold(v: Int, changes: org.apache.spark.sql.DataFrame): Unit = {
      val d = SnapshotLog.auditDelta(spark, dir, v, "k", Seq("price"), cs, changes)
      SnapshotLog.commitMerge(spark, dir, v, "k", Seq("price"), changes)
      audit = audit.map { case (n, c) => n -> (c + d(n)) }
      assert(audit == SnapshotLog.constraintViolations(
        SnapshotLog.readVersion(spark, dir, v), cs),
        s"fold diverged from rescan at v$v")
    }
    // v1: U fixes key 0 (pos violation leaves), U breaks key 1 (cap enters),
    //     D removes key 2, I adds a NULL price (violates BOTH — NULL=violation)
    commitAndFold(1, Seq(
      (0L, "U", Some(5.0)), (1L, "U", Some(500.0)),
      (2L, "D", Some(0.0)), (100L, "I", Option.empty[Double])
    ).toDF("k", "op", "price"))
    assert(audit == Map("pos" -> 1L, "cap" -> 2L))
    // v2: matched I (resolves as update — pre-image must leave),
    //     unmatched U (resolves as insert — nothing leaves)
    commitAndFold(2, Seq(
      (100L, "I", Some(50.0)), (200L, "U", Some(-1.0))
    ).toDF("k", "op", "price"))
    assert(audit == Map("pos" -> 1L, "cap" -> 1L))
  }

  test("history: manifest-only audit rows, rewritten counted vs the previous RETAINED version") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_hist_spec").toString
    val t = (0L until 32L).map(k => (k, k * 10.0)).toDF("k", "price")
    SnapshotLog.commitInitial(t, dir, "k")
    // v1 touches buckets 1 and 2; v2 is a DV delete (no rewrite)
    SnapshotLog.commitMerge(spark, dir, 1, "k", Seq("price"),
      Seq((1L, "U", 11.0), (2L, "U", 22.0)).toDF("k", "op", "price"))
    // ONE DV commit spanning two buckets is ONE tombstone dir
    SnapshotLog.commitDeleteVector(spark, dir, 2, "k", Seq(5L, 6L).toDF("k"))
    assert(SnapshotLog.history(dir) ==
      Seq((0, 1, 16, 0), (1, 2, 2, 0), (2, 2, 0, 1)))
    // vacuum away v0+v1: v2 becomes the baseline row (its full footprint)
    SnapshotLog.vacuum(dir, 2)
    assert(SnapshotLog.history(dir) == Seq((2, 2, 16, 1)))
  }

  test("a bucket emptied by deletes disappears from the later snapshot only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_spec").toString
    // keys 0..31 → buckets 0..15 with two rows each
    val t = (0L until 32L).map(k => (k, s"row$k")).toDF("k", "payload")
    SnapshotLog.commitInitial(t, dir, "k")
    // delete BOTH rows of bucket 3 (keys 3 and 19)
    val changes = Seq((3L, "D", "x"), (19L, "D", "x")).toDF("k", "op", "payload")
    SnapshotLog.commitMerge(spark, dir, 1, "k", Seq("payload"), changes)
    val v0 = SnapshotLog.readVersion(spark, dir, 0)
    val v1 = SnapshotLog.readVersion(spark, dir, 1)
    assert(v0.count() == 32)
    assert(v1.count() == 30)
    assert(v1.filter(col("k") % 16 === 3).count() == 0)
    // diff recovers exactly the two deletes
    val diff = SnapshotLog.tableDiff(v0, v1, "k", Seq("payload")).collect()
    assert(diff.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((3L, "D"), (19L, "D")))
  }

  test("re-committing the same version is idempotent (the foreachBatch retry contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_retry").toString
    val t = (0L until 32L).map(k => (k, s"row$k")).toDF("k", "payload")
    SnapshotLog.commitInitial(t, dir, "k")
    val changes = Seq((5L, "U", "updated5")).toDF("k", "op", "payload")
    SnapshotLog.commitMerge(spark, dir, 1, "k", Seq("payload"), changes)
    val first = SnapshotLog.readVersion(spark, dir, 1).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // a streaming retry re-runs the SAME batch with the same version id
    SnapshotLog.commitMerge(spark, dir, 1, "k", Seq("payload"), changes)
    val second = SnapshotLog.readVersion(spark, dir, 1).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(first == second && first.contains((5L, "updated5")) && first.size == 32)
  }

  test("compaction preserves content, shrinks to one file per bucket, keeps time travel") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_compact").toString
    val t = (0L until 64L).map(k => (k, s"row$k")).toDF("k", "payload")
      .repartition(8) // several files per bucket at v0
    SnapshotLog.commitInitial(t, dir, "k")
    val changes = Seq((5L, "U", "updated5"), (64L, "I", "row64")).toDF("k", "op", "payload")
    SnapshotLog.commitMerge(spark, dir, 1, "k", Seq("payload"), changes)
    val v1 = SnapshotLog.readVersion(spark, dir, 1).drop("b")
    SnapshotLog.compactVersion(spark, dir, 1, 2)
    val v2 = SnapshotLog.readVersion(spark, dir, 2).drop("b")
    // content identical
    assert(v2.exceptAll(v1).isEmpty && v1.exceptAll(v2).isEmpty && v2.count() == 65)
    // one file per bucket in the compact dir
    val compactDir = new java.io.File(dir).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("compact_v1-")).head
    val files = compactDir.listFiles()
      .filter(_.isDirectory)
      .map(b => b.listFiles().count(_.getName.endsWith(".parquet")))
    assert(files.length == SnapshotLog.Buckets && files.forall(_ == 1))
    // prior versions untouched: v0 still reads the original snapshot
    val v0 = SnapshotLog.readVersion(spark, dir, 0).drop("b")
    assert(v0.count() == 64 &&
      v0.filter(col("payload") === "updated5").isEmpty)
  }

  test("a concurrent writer racing the same version with different content loses loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_race").toString
    val t = (0L until 32L).map(k => (k, s"row$k")).toDF("k", "payload")
    SnapshotLog.commitInitial(t, dir, "k")
    SnapshotLog.commitMerge(spark, dir, 1, "k", Seq("payload"),
      Seq((5L, "U", "writerA")).toDF("k", "op", "payload"))
    // writer B lost the race for v1: its touched set differs, so the
    // CAS must surface the conflict instead of silently clobbering
    val ex = intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.commitMerge(spark, dir, 1, "k", Seq("payload"),
        Seq((7L, "U", "writerB")).toDF("k", "op", "payload"))
    }
    assert(ex.getMessage.contains("version 1"))
    // the winner's commit is intact
    val v1 = SnapshotLog.readVersion(spark, dir, 1).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v1.contains((5L, "writerA")) && !v1.contains((7L, "writerB")))
  }

  test("a racing writer with the SAME touched buckets but different content loses loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_race2").toString
    val t = (0L until 32L).map(k => (k, s"row$k")).toDF("k", "payload")
    SnapshotLog.commitInitial(t, dir, "k")
    // keys 5 and 21 both land in bucket 5: writer B's manifest is
    // STRUCTURALLY identical to writer A's (same touched set over the
    // same base), so only the content digest can tell them apart —
    // without it B's different data would be silently discarded as a
    // "replay"
    SnapshotLog.commitMerge(spark, dir, 1, "k", Seq("payload"),
      Seq((5L, "U", "writerA")).toDF("k", "op", "payload"))
    intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.commitMerge(spark, dir, 1, "k", Seq("payload"),
        Seq((21L, "U", "writerB")).toDF("k", "op", "payload"))
    }
    val v1 = SnapshotLog.readVersion(spark, dir, 1).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v1.contains((5L, "writerA")) && !v1.contains((21L, "writerB")))
  }

  test("commitInitial: replay no-ops, a DIFFERENT initial dataset losing the race throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_init").toString
    val a = (0L until 32L).map(k => (k, s"row$k")).toDF("k", "payload")
    SnapshotLog.commitInitial(a, dir, "k")
    // replay (same content, e.g. a retried creation batch): benign no-op
    SnapshotLog.commitInitial(a, dir, "k")
    // a different dataset losing the creation CAS must NOT silently
    // adopt the winner's table — every v0 manifest is structurally
    // identical (all buckets -> one dir), the digest is the only check
    val b = (0L until 32L).map(k => (k, s"OTHER$k")).toDF("k", "payload")
    intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.commitInitial(b, dir, "k")
    }
    val v0 = SnapshotLog.readVersion(spark, dir, 0).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v0.contains((0L, "row0")) && !v0.exists(_._2.startsWith("OTHER")))
  }


  test("branchAt: replay no-ops, a different-source race to the same branch root throws") {
    val srcA = java.nio.file.Files.createTempDirectory("graft_snap_bra").toString
    val srcB = java.nio.file.Files.createTempDirectory("graft_snap_brb").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_snap_brd").toString
    val a = (0L until 32L).map(k => (k, s"row$k")).toDF("k", "payload")
    val b = (0L until 32L).map(k => (k, s"OTHER$k")).toDF("k", "payload")
    SnapshotLog.commitInitial(a, srcA, "k")
    SnapshotLog.commitInitial(b, srcB, "k")
    SnapshotLog.branchAt(srcA, 0, dst)
    // replaying the SAME branch creation is a benign no-op
    SnapshotLog.branchAt(srcA, 0, dst)
    // branching a DIFFERENT source onto the taken root is loud
    intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.branchAt(srcB, 0, dst)
    }
    // and the branch still reads source A, zero-copy
    val v0 = SnapshotLog.readVersion(spark, dst, 0).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v0.contains((0L, "row0")) && !v0.exists(_._2.startsWith("OTHER")))
  }

  test("source vacuum retains branch-pinned versions; dropBranch releases them") {
    val src = java.nio.file.Files.createTempDirectory("graft_snap_bvs").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_snap_bvd").toString + "/branch"
    val t = (0L until 32L).map(k => (k, s"row$k")).toDF("k", "payload")
    SnapshotLog.commitInitial(t, src, "k")
    // v1 and v2 both touch key 5's bucket, so v1's attempt dir is
    // referenced by NO retained manifest once retainFrom = 2 — exactly
    // the shape an unpinned vacuum would reclaim out from under a branch
    SnapshotLog.commitMerge(spark, src, 1, "k", Seq("payload"),
      Seq((5L, "U", "updated5")).toDF("k", "op", "payload"))
    SnapshotLog.commitMerge(spark, src, 2, "k", Seq("payload"),
      Seq((5L, "U", "again5")).toDF("k", "op", "payload"))
    SnapshotLog.branchAt(src, 1, dst)
    SnapshotLog.branchAt(src, 1, dst) // replay: still exactly one pin
    assert(SnapshotLog.branchPins(src).map(_._2) == Seq(1))
    val before = SnapshotLog.readVersion(spark, dst, 0).drop("b").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(before.contains((5L, "updated5")) && before.size == 32)
    // vacuum the SOURCE past the pinned version, grace 0 so only the
    // pin can protect anything
    SnapshotLog.vacuum(src, retainFrom = 2, attemptGraceMs = 0)
    assert(!new java.io.File(s"$src/_manifest_v0.json").exists(), "v0 expired")
    assert(new java.io.File(s"$src/_manifest_v1.json").exists(), "pinned v1 manifest survives")
    val after = SnapshotLog.readVersion(spark, dst, 0).drop("b").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before, "branch reads bit-identically after source vacuum")
    // release the pin: the next vacuum reclaims v1's exclusive dir
    assert(SnapshotLog.dropBranch(src, dst))
    assert(SnapshotLog.branchPins(src).isEmpty)
    val deleted = SnapshotLog.vacuum(src, retainFrom = 2, attemptGraceMs = 0)
    assert(deleted.exists(_.startsWith("v1-")), s"v1 attempt dir reclaimed, got $deleted")
    assert(!new java.io.File(s"$src/_manifest_v1.json").exists())
    // the surviving head version is untouched
    val v2 = SnapshotLog.readVersion(spark, src, 2).drop("b").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v2.contains((5L, "again5")) && v2.size == 32)
  }

  test("point lookup prunes to derivable buckets; empty-bucket-set lookups are loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_pt").toString
    val t = (0L until 64L).map(k => (k, s"row$k")).toDF("k", "payload")
    SnapshotLog.commitInitial(t, dir, "k")
    val got = SnapshotLog.readKeys(spark, dir, 0, "k", Seq(3L, 19L, 40L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((3L, "row3"), (19L, "row19"), (40L, "row40")), got)
    // a key with no live row in its bucket returns nothing, not an error
    assert(SnapshotLog.readKeys(spark, dir, 0, "k", Seq(1000L)).count() == 0)
  }

  test("vacuum grace: a fresh unpublished attempt dir survives; aged orphans are reclaimed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_grace").toString
    val t = (0L until 64L).map(k => (k, s"row$k")).toDF("k", "payload")
    SnapshotLog.commitInitial(t, dir, "k")
    SnapshotLog.commitMerge(spark, dir, 1, "k", Seq("payload"),
      Seq((5L, "U", "u5")).toDF("k", "op", "payload"))
    SnapshotLog.compactVersion(spark, dir, 1, 2)
    // simulate an in-flight commit: data written, manifest CAS not yet
    // published — referenced by NO manifest, exactly what a concurrent
    // writer's attempt looks like mid-commit
    val inflight = new java.io.File(dir, "v3-inflight")
    assert(new java.io.File(inflight, "b=0").mkdirs())
    java.nio.file.Files.writeString(inflight.toPath.resolve("b=0/part-0.parquet"), "x")
    val deleted = SnapshotLog.vacuum(dir, retainFrom = 2)
    // provably-dead dirs (published then expired) go; the fresh
    // unreferenced attempt survives the grace window
    assert(deleted.map(_.takeWhile(_ != '-')).sorted == Seq("v0", "v1"), deleted)
    assert(inflight.exists(), "vacuum deleted an in-flight attempt inside the grace window")
    // age the orphan past the grace window (dir AND children — vacuum
    // takes the max mtime): the next vacuum reclaims it
    val old = System.currentTimeMillis() - 2 * SnapshotLog.VacuumAttemptGraceMs
    def age(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(age)); assert(f.setLastModified(old))
    }
    age(inflight)
    val deleted2 = SnapshotLog.vacuum(dir, retainFrom = 2)
    assert(deleted2 == Seq("v3-inflight") && !inflight.exists(), deleted2)
  }

  test("manifests round-trip table roots containing JSON-hostile characters") {
    // the r8 hand-rolled parse split on ',' then ':' — this root
    // contains both, plus a quote
    val weird = java.nio.file.Files.createTempDirectory("graft,snap:v\"1").toString
    val t = (0L until 32L).map(k => (k, s"row$k")).toDF("k", "payload")
    SnapshotLog.commitInitial(t, weird, "k")
    SnapshotLog.commitMerge(spark, weird, 1, "k", Seq("payload"),
      Seq((5L, "U", "updated5")).toDF("k", "op", "payload"))
    val v1 = SnapshotLog.readVersion(spark, weird, 1).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v1.contains((5L, "updated5")) && v1.size == 32)
  }

  test("vacuum reclaims unreferenced dirs, keeps retained reads identical, breaks older reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_vacspec").toString
    val t = (0L until 64L).map(k => (k, s"row$k")).toDF("k", "payload")
    SnapshotLog.commitInitial(t, dir, "k")
    SnapshotLog.commitMerge(spark, dir, 1, "k", Seq("payload"),
      Seq((5L, "U", "updated5")).toDF("k", "op", "payload"))
    SnapshotLog.compactVersion(spark, dir, 1, 2)
    val before = SnapshotLog.readVersion(spark, dir, 2).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val deleted = SnapshotLog.vacuum(dir, retainFrom = 2)
    assert(deleted.map(_.takeWhile(_ != '-')).sorted == Seq("v0", "v1"), deleted)
    val after = SnapshotLog.readVersion(spark, dir, 2).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before)
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("v0-")))
    intercept[Exception] { SnapshotLog.readVersion(spark, dir, 0).collect() }
    // vacuuming everything is refused
    intercept[IllegalArgumentException] { SnapshotLog.vacuum(dir, retainFrom = 99) }
  }

  test("PROPERTY: random merge chains with interleaved compaction equal a scalar fold") {
    val rnd = new scala.util.Random(99L)
    for (trial <- 0 until 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_snap_prop$trial").toString
      val model = scala.collection.mutable.Map[Long, String]()
      (0L until 40L).foreach(k => model(k) = s"r$k")
      SnapshotLog.commitInitial(
        model.toSeq.map { case (k, p) => (k, p) }.toDF("k", "payload"), dir, "k")
      var v = 0
      for (round <- 1 to 5) {
        // random change set: deletes of live keys, upserts, fresh inserts
        val dels = model.keys.toSeq.sorted.filter(_ => rnd.nextBoolean() && rnd.nextBoolean())
          .take(5)
        val ups = model.keys.toSeq.sorted.filterNot(dels.contains)
          .filter(_ => rnd.nextBoolean()).take(5).map(k => (k, s"u$round-$k"))
        val ins = (0 until 1 + rnd.nextInt(4)).map(i => (1000L * round + i, s"i$round-$i"))
        val changes =
          dels.map(k => (k, "D", model(k))) ++ ups.map { case (k, p) => (k, "U", p) } ++
            ins.map { case (k, p) => (k, "I", p) }
        if (changes.nonEmpty) {
          SnapshotLog.commitMerge(spark, dir, v + 1, "k", Seq("payload"),
            changes.toDF("k", "op", "payload"))
          v += 1
          dels.foreach(model.remove)
          (ups ++ ins).foreach { case (k, p) => model(k) = p }
        }
        if (rnd.nextBoolean()) { SnapshotLog.compactVersion(spark, dir, v, v + 1); v += 1 }
        val got = SnapshotLog.readVersion(spark, dir, v).collect()
          .map(r => r.getLong(r.fieldIndex("k")) -> r.getString(r.fieldIndex("payload")))
          .toMap
        assert(got == model.toMap, s"trial $trial round $round v$v diverged")
      }
    }
  }

  test("time-based vacuum keeps post-horizon versions plus the newest pre-horizon anchor") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_tvac").toString
    val t = (0L until 64L).map(k => (k, s"row$k")).toDF("k", "payload")
    SnapshotLog.commitInitial(t, dir, "k")
    SnapshotLog.commitMerge(spark, dir, 1, "k", Seq("payload"),
      Seq((5L, "U", "u5")).toDF("k", "op", "payload"))
    SnapshotLog.compactVersion(spark, dir, 1, 2)
    SnapshotLog.commitMerge(spark, dir, 3, "k", Seq("payload"),
      Seq((6L, "U", "u6")).toDF("k", "op", "payload"))
    // age manifests deterministically: v0/v1 far past, v2 at the
    // horizon (anchor), v3 fresh
    def m(v: Int) = new java.io.File(s"$dir/_manifest_v$v.json")
    val now = m(3).lastModified()
    assert(m(0).setLastModified(now - 10000) && m(1).setLastModified(now - 9000) &&
      m(2).setLastModified(now - 5000))
    val deleted = SnapshotLog.vacuumOlderThan(dir, horizonMs = now - 2000)
    // v2 is the newest pre-horizon version: it anchors, v0/v1 go
    assert(deleted.map(_.takeWhile(_ != '-')).sorted == Seq("v0", "v1"), deleted)
    val v2 = SnapshotLog.readVersion(spark, dir, 2).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val v3 = SnapshotLog.readVersion(spark, dir, 3).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v2.contains((5L, "u5")) && v3.contains((6L, "u6")))
    intercept[Exception] { SnapshotLog.readVersion(spark, dir, 0).collect() }
    // nothing below the horizon left -> second call no-ops
    assert(SnapshotLog.vacuumOlderThan(dir, horizonMs = now - 2000).isEmpty)
  }

  test("deletion vectors: stack, materialize on rewrite, compact, vacuum, branch") {
    val root = java.nio.file.Files.createTempDirectory("graft_dv_spec").toString
    // 64 keys, 4 per bucket (pmod(k, 16))
    val base = (1L to 64L).map(k => (k, s"p$k")).toDF("k", "p")
    SnapshotLog.commitInitial(base, root, "k")
    def live(v: Int) = SnapshotLog.readVersion(spark, root, v).drop("b")

    // v1: tombstone multiples of 4 (16 keys) — merge-on-read
    val dead1 = base.filter(col("k") % 4 === 0).select("k")
    SnapshotLog.commitDeleteVector(spark, root, 1, "k", dead1)
    assert(live(0).count() == 64 && live(1).count() == 48)
    assert(live(1).filter(col("k") % 4 === 0).isEmpty)
    // replay (the foreachBatch retry contract): same delete set no-ops
    SnapshotLog.commitDeleteVector(spark, root, 1, "k", dead1)
    assert(live(1).count() == 48)
    // a DIFFERENT delete set racing version 1 loses loudly
    intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.commitDeleteVector(spark, root, 1, "k",
        base.filter(col("k") % 4 === 1).select("k"))
    }

    // v2: a SECOND vector stacks (k % 16 == 1: keys 1,17,33,49)
    SnapshotLog.commitDeleteVector(spark, root, 2, "k",
      base.filter(col("k") % 16 === 1).select("k"))
    assert(live(2).count() == 44)

    // v3: MERGE re-inserts tombstoned keys 4 and 8 with new payloads —
    // buckets 4 and 8 rewrite and MATERIALIZE their tombstones: the
    // re-inserted keys live, sibling tombstoned keys (20, 24) stay
    // dead, untouched buckets (12) keep their vectors
    SnapshotLog.commitMerge(spark, root, 3, "k", Seq("p"),
      Seq((4L, "I", "new4"), (8L, "I", "new8")).toDF("k", "op", "p"))
    val v3 = live(3)
    assert(v3.count() == 46, v3.count())
    assert(v3.filter(col("k") === 4).select("p").head().getString(0) == "new4")
    assert(v3.filter(col("k").isin(20L, 24L, 12L)).isEmpty)
    // point lookups prune tombstones by bucket too
    assert(SnapshotLog.readKeys(spark, root, 3, "k", Seq(12L)).isEmpty)
    assert(SnapshotLog.readKeys(spark, root, 3, "k", Seq(4L)).count() == 1)

    // a BRANCH at the tombstoned version carries the vectors
    val branch = root + "_br"
    SnapshotLog.branchAt(root, 3, branch)
    val br = SnapshotLog.readVersion(spark, branch, 0).drop("b")
    assert(br.exceptAll(v3).isEmpty && v3.exceptAll(br).isEmpty)
    assert(SnapshotLog.dropBranch(root, branch))

    // COMPACTION materializes every vector; vacuum past the DV
    // versions reclaims the now-unreferenced tombstone dirs and the
    // compacted read survives complete
    SnapshotLog.compactVersion(spark, root, 3, 4)
    val v4 = live(4)
    assert(v4.exceptAll(v3).isEmpty && v3.exceptAll(v4).isEmpty)
    val reclaimed = SnapshotLog.vacuum(root, retainFrom = 4)
    assert(reclaimed.exists(_.contains("dv")), reclaimed)
    assert(live(4).count() == 46)
    intercept[Exception] { live(1).collect() }
  }

  test("commitDeleteAuto pins the policy boundary: stack budget, ratio, phantom keys") {
    // keys 0..47 → 3 rows per bucket (pmod 16)
    def base48 = (0L until 48L).map(k => (k, k * 1.0, s"r$k")).toDF("k", "price", "tag")
    def freshRoot(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString
    val root = freshRoot("graft_dvpol_stack")
    SnapshotLog.commitInitial(base48, root, "k")
    // stacking budget 1: first bucket-0 delete stacks, second rewrites
    def del(r: String, v: Int, keys: Seq[Long], maxStacked: Int = 1,
            ratio: Double = 0.9): String =
      SnapshotLog.commitDeleteAuto(spark, r, v, "k", Seq("price", "tag"),
        keys.toDF("k"), maxStackedDvs = maxStacked, maxTombstoneRatio = ratio)
    assert(del(root, 1, Seq(16L)) == "stack")
    assert(del(root, 2, Seq(32L)) == "rewrite")
    assert(SnapshotLog.readVersion(spark, root, 2)
      .filter(col("k").isin(16L, 32L)).isEmpty)
    assert(!new java.io.File(root).listFiles().map(_.getName)
      .exists(_.startsWith("v2dv")))
    // ratio boundary: deleting 2 of a bucket's 3 rows exceeds 0.5 even
    // with zero stacked vectors → immediate rewrite
    val root2 = freshRoot("graft_dvpol_ratio")
    SnapshotLog.commitInitial(base48, root2, "k")
    assert(del(root2, 1, Seq(0L, 16L), maxStacked = 5, ratio = 0.5) == "rewrite")
    // …while the same delete under a lax ratio stacks
    val root3 = freshRoot("graft_dvpol_lax")
    SnapshotLog.commitInitial(base48, root3, "k")
    assert(del(root3, 1, Seq(0L, 16L), maxStacked = 5, ratio = 0.9) == "stack")
    // phantom keys past the stacking budget cannot rewrite (no
    // pre-images) — they fall back to a tombstone no-op commit
    assert(del(root3, 2, Seq(999L), maxStacked = 5) == "stack")
    assert(del(root3, 3, Seq(998L), maxStacked = 1) == "stack")
    assert(SnapshotLog.readVersion(spark, root3, 3).count() == 46)
  }

  test("maintained FK audit: parent-delete and child-change deltas fold to the rescan") {
    val pRoot = java.nio.file.Files.createTempDirectory("graft_fk_p").toString
    val cRoot = java.nio.file.Files.createTempDirectory("graft_fk_c").toString
    // parents 0..9; children reference parent k%10 (clean at v0)
    val parents = (0L until 10L).map(k => (k, s"p$k")).toDF("pk", "pname")
    val children = (0L until 40L).map(k => (k, k % 10, k * 1.0)).toDF("ck", "fk", "m")
    SnapshotLog.commitInitial(parents, pRoot, "pk")
    SnapshotLog.commitInitial(children, cRoot, "ck")
    assert(SnapshotLog.fkViolations(
      SnapshotLog.readVersion(spark, cRoot, 0), "fk",
      SnapshotLog.readVersion(spark, pRoot, 0), "pk") == 0L)
    // parent delete of pk ∈ {3, 7}: 8 children dangle
    val del = Seq(3L, 7L).toDF("pk")
    SnapshotLog.commitDeleteVector(spark, pRoot, 1, "pk", del)
    val dP = SnapshotLog.fkDeltaParentDelete(
      SnapshotLog.readVersion(spark, cRoot, 0), "fk", del, "pk")
    assert(dP == 8L)
    // child change set: delete ck=3 (was dangling → −1), update ck=5's
    // fk to 3 (dangling → +1, leaving row was clean), insert ck=100
    // with fk=99 (dangling → +1), insert ck=101 with fk=0 (clean → 0)
    val changes = Seq(
      (3L, "D", 3L, 0.0), (5L, "U", 3L, 5.0),
      (100L, "I", 99L, 1.0), (101L, "I", 0L, 1.0)).toDF("ck", "op", "fk", "m")
    SnapshotLog.commitMerge(spark, cRoot, 1, "ck", Seq("fk", "m"), changes)
    val dC = SnapshotLog.fkDeltaChild(spark, cRoot, 1, "ck", "fk", changes,
      pRoot, 1, "pk")
    assert(dC == 1L, dC) // −1 (del ck=3) + 1 (ck=5 re-ref) + 1 (ck=100) + 0
    val rescan = SnapshotLog.fkViolations(
      SnapshotLog.readVersion(spark, cRoot, 1), "fk",
      SnapshotLog.readVersion(spark, pRoot, 1), "pk")
    assert(0L + dP + dC == rescan, s"fold ${dP + dC} vs rescan $rescan")
  }
}
