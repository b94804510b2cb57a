package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorOps.toDoubleVec
import graft.sources.{Bucketing, IvfIndex}

/** Incremental IVF maintenance: a changelog replay (inserts, deletes,
  * a cell-moving update) must leave the index EQUAL to a fresh
  * assignment of the net corpus under the SAME frozen quantizer, must
  * rewrite ONLY the affected cells' partitions, and must clear a cell
  * whose rows all net away. */
class IvfIndexSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfTiny}

  private def corpus() = Tables.embeddings(spark, sfTiny)
    .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))

  private def listFiles(path: String): Map[String, Set[String]] = {
    val root = new java.io.File(path)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cent_id="))
      .map(d => d.getName -> d.listFiles().map(_.getName)
        .filterNot(_.startsWith("_")).toSet)
      .toMap
  }

  private def indexRows(path: String): Set[(Long, Long, Seq[Double])] =
    IvfIndex.read(spark, path).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")), r.getLong(r.fieldIndex("cent_id")),
        r.getSeq[Double](r.fieldIndex("v")).toSeq)).toSet

  test("changelog upsert equals fresh assignment; untouched cells' files survive") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val base = corpus()
    IvfIndex.build(base, dir, cells = 8)
    val before = listFiles(dir)
    assert(before.nonEmpty && IvfIndex.centroids(spark, dir).count() == 8)

    // the changelog is built FROM three chosen cells so the other five
    // stay untouched: deletes (before-image on the wire), inserts
    // (copies of surviving chosen-cell vectors under fresh ids — they
    // route back into the chosen cells), and one UPDATE that replaces
    // a vector's value with another chosen-cell vector's value
    // (delete old v + insert new v — may cross cells, both chosen)
    import spark.implicits._
    val idx0 = IvfIndex.read(spark, dir)
    val topCells = idx0.groupBy("cent_id").count()
      .orderBy(col("count").desc, col("cent_id"))
      .limit(3).collect().map(_.getLong(0)).toSeq
    // localCheckpoint, NOT cache: these frames are read back AFTER the
    // upsert rewrites the path, and recacheByPath would silently
    // recompute a cached frame over the new files
    val inCells = idx0.filter(col("cent_id").isin(topCells.map(Long.box): _*))
      .select("vec_id", "v").localCheckpoint(true)
    val dels = inCells.filter(col("vec_id") % 3 === 0).withColumn("tag", lit(-1))
    val ins = inCells.filter(col("vec_id") % 3 === 1).orderBy("vec_id").limit(20)
      .select((col("vec_id") + 100000).as("vec_id"), col("v"))
      .withColumn("tag", lit(1))
    val picked = inCells.filter(col("vec_id") % 3 === 2).orderBy("vec_id").limit(2)
      .collect()
    val aId = picked(0).getLong(0)
    val bV = picked(1).getSeq[Double](1).toSeq
    val updDel = inCells.filter(col("vec_id") === aId).withColumn("tag", lit(-1))
    val updIns = Seq((aId, bV)).toDF("vec_id", "v").withColumn("tag", lit(1))
    val changelog = dels.unionByName(ins).unionByName(updDel).unionByName(updIns)

    IvfIndex.upsert(spark, dir, changelog)

    // expected = net corpus (base minus deletes minus the updated row,
    // plus inserts and the updated row's new value) assigned under the
    // SAME frozen centroids
    val netCorpus = base
      .join(dels.select("vec_id"), Seq("vec_id"), "left_anti")
      .filter(col("vec_id") =!= aId)
      .unionByName(ins.drop("tag"))
      .unionByName(updIns.drop("tag"))
    val cents = IvfIndex.centroids(spark, dir)
    val expected = IvfIndex.route(netCorpus.withColumn("tag", lit(1)), cents)
      .select(col("vec_id"), col("cent_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toSeq)).toSet
    assert(indexRows(dir) == expected,
      "upserted index must equal fresh assignment of the net corpus under the frozen quantizer")

    // only affected cells rewrote: every untouched cell kept its exact files
    val after = listFiles(dir)
    val affected = IvfIndex.route(changelog, cents)
      .select("cent_id").distinct().collect().map(r => s"cent_id=${r.getLong(0)}").toSet
    val untouched = before.keySet -- affected
    assert(untouched.nonEmpty, "fixture must leave some cells untouched")
    untouched.foreach { cell =>
      assert(after(cell) == before(cell), s"untouched $cell must keep its files")
    }
    affected.foreach { cell =>
      assert(!after.get(cell).contains(before(cell)), s"affected $cell must rewrite")
    }
  }

  test("a cell whose rows all net away is cleared, not left stale") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_empty").toString
    val base = corpus().limit(60).cache()
    IvfIndex.build(base, dir, cells = 4)
    val cents = IvfIndex.centroids(spark, dir)
    // pick one populated cell and delete EVERY vector in it
    val someCell = IvfIndex.read(spark, dir)
      .groupBy("cent_id").count().orderBy(col("count"), col("cent_id"))
      .collect().head.getLong(0)
    val victims = IvfIndex.read(spark, dir).filter(col("cent_id") === someCell)
      .select(col("vec_id"), col("v")).withColumn("tag", lit(-1))
    assert(victims.count() > 0)
    IvfIndex.upsert(spark, dir, victims)
    val left = IvfIndex.read(spark, dir).filter(col("cent_id") === someCell).count()
    assert(left == 0, s"cell $someCell must be empty after deleting all its rows")
    assert(!new java.io.File(s"$dir/cent_id=$someCell").exists(),
      "the emptied cell's directory is removed")
  }

  test("a STREAMING changelog maintains the index via foreachBatch upserts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_stream").toString
    val base = corpus().limit(200).localCheckpoint(true)
    IvfIndex.build(base, dir, cells = 4)
    val cents = IvfIndex.centroids(spark, dir).localCheckpoint(true)
    // batch 1: delete every vec_id % 5 == 0 (before-image on the wire);
    // batch 2: insert copies of vec_id % 5 == 1 under fresh ids —
    // each micro-batch upserts only its own cells, state is the INDEX
    val dels = base.filter(col("vec_id") % 5 === 0)
      .as[(Long, Seq[Double])].collect().map { case (id, v) => (id, v, -1) }
    val ins = base.filter(col("vec_id") % 5 === 1)
      .as[(Long, Seq[Double])].collect().map { case (id, v) => (id + 50000L, v, 1) }
    val src = MemoryStream[(Long, Seq[Double], Int)]
    val query = src.toDF().toDF("vec_id", "v", "tag").writeStream
      .foreachBatch((batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IvfIndex.upsert(spark, dir, batch))
      .start()
    try {
      src.addData(dels.toSeq)
      query.processAllAvailable()
      src.addData(ins.toSeq)
      query.processAllAvailable()
    } finally query.stop()
    val net = base.filter(col("vec_id") % 5 =!= 0)
      .unionByName(base.filter(col("vec_id") % 5 === 1)
        .select((col("vec_id") + 50000L).as("vec_id"), col("v")))
    val expected = IvfIndex.route(net.withColumn("tag", lit(1)), cents)
      .select(col("vec_id"), col("cent_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toSeq)).toSet
    assert(indexRows(dir) == expected,
      "streamed upserts must equal fresh assignment of the net corpus")
  }

  test("probe of the maintained index prunes to its cells") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_probe").toString
    IvfIndex.build(corpus(), dir, cells = 8)
    val cells = IvfIndex.read(spark, dir).select("cent_id").distinct()
      .collect().map(_.getLong(0)).sorted.take(2).toSeq
    val probe = Bucketing.readPartition(spark, dir, "cent_id", cells)
    val scan = probe.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.isDefined)
    assert(scan.get.partitionFilters.nonEmpty, "probe must carry PartitionFilters")
    assert(probe.count() ==
      IvfIndex.read(spark, dir).filter(col("cent_id").isin(cells.map(Long.box): _*)).count())
  }

  test("resplit divides hot cells locally: exact partition kept, frozen cells untouched, recall holds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_resplit").toString
    // 3 tight clusters of 20 vectors around orthogonal axes (+ small
    // deterministic jitter on a second coordinate) — clustered data,
    // so a LOCAL split separates real structure
    val vecs = (0 until 60).map { i =>
      val axis = i % 3
      val base = Array.fill(6)(0.0)
      base(axis) = 1.0
      base((axis + 3) % 6) = 0.01 * (i / 3 % 5)
      (i.toLong, base.toSeq)
    }
    val df = vecs.toDF("vec_id", "v")
    IvfIndex.build(df, dir, cells = 1)
    assert(IvfIndex.centroids(spark, dir).count() == 1)
    val split = IvfIndex.resplit(spark, dir, maxRows = 30, subCells = 3)
    assert(split.size == 1)
    val cents = IvfIndex.centroids(spark, dir).collect()
    assert(cents.length == 3, s"1 hot cell -> 3 sub-cells, got ${cents.length}")
    val idx = IvfIndex.read(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")), r.getLong(r.fieldIndex("cent_id"))))
    // exact partition: every vector exactly once
    assert(idx.map(_._1).toSet == (0L until 60L).toSet && idx.length == 60)
    // no cell above the threshold anymore on this fixture
    val sizes = idx.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.values.forall(_ <= 30), sizes)
    // assignment = nearest sub-centroid (local re-route is a true route)
    val centVecs = cents.map(r => r.getLong(r.fieldIndex("cent_id")) ->
      r.getSeq[Double](r.fieldIndex("cv")).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    vecs.foreach { case (id, v) =>
      val va = v.toArray
      val best = centVecs.toSeq
        .map { case (cid, cv) => (cid, math.floor(cos(va, cv) * 1e7 + 0.5)) }
        .maxBy { case (cid, s) => (s, -cid) }._1
      assert(idx.toMap.apply(id) == best, s"vec $id routed to ${idx.toMap.apply(id)}, nearest $best")
    }
    // RECALL vs brute force: nprobe=1 top-5 per query — on clustered
    // data the nearest centroid's cell holds the true neighborhood
    val queries = Seq(0L, 1L, 2L)
    val byId = vecs.toMap
    val recalls = queries.map { q =>
      val qv = byId(q).toArray
      val brute = vecs.filter(_._1 != q)
        .map { case (id, v) => (id, math.floor(cos(qv, v.toArray) * 1e7 + 0.5)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
      val probeCell = centVecs.toSeq
        .map { case (cid, cv) => (cid, math.floor(cos(qv, cv) * 1e7 + 0.5)) }
        .maxBy { case (cid, s) => (s, -cid) }._1
      val got = idx.filter { case (id, cid) => cid == probeCell && id != q }
        .map { case (id, _) => (id, math.floor(cos(qv, byId(id).toArray) * 1e7 + 0.5)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
      got.intersect(brute).size.toDouble / brute.size
    }
    assert(recalls.sum / recalls.size >= 0.8,
      s"post-split nprobe=1 recall degraded: $recalls")
  }

  test("maintained path auto-resplits past the relative bound; recall holds on the maintained index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_maintain").toString
    // the same 3-cluster fixture as the resplit test, arriving as a
    // CHANGELOG: 40 vectors build the (single-cell) index, 20 more
    // upsert in — then the post-upsert maintenance check fires because
    // the cell holds all 60 > total/2 = 30, and splits it locally
    val vecs = (0 until 60).map { i =>
      val axis = i % 3
      val base = Array.fill(6)(0.0)
      base(axis) = 1.0
      base((axis + 3) % 6) = 0.01 * (i / 3 % 5)
      (i.toLong, base.toSeq)
    }
    val (initial, arriving) = vecs.partition(_._1 < 40)
    IvfIndex.build(initial.toDF("vec_id", "v"), dir, cells = 1)
    IvfIndex.upsert(spark, dir,
      arriving.toDF("vec_id", "v").withColumn("tag", org.apache.spark.sql.functions.lit(1)))
    // below-bound maintenance is a no-op (60 <= 60/1)
    assert(IvfIndex.maintain(spark, dir, denom = 1, subCells = 3).isEmpty)
    val split = IvfIndex.maintain(spark, dir, denom = 2, subCells = 3)
    assert(split.size == 1)
    val cents = IvfIndex.centroids(spark, dir).collect()
    assert(cents.length == 3, s"1 hot cell -> 3 sub-cells, got ${cents.length}")
    val idx = IvfIndex.read(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")), r.getLong(r.fieldIndex("cent_id"))))
    assert(idx.map(_._1).toSet == (0L until 60L).toSet && idx.length == 60)
    // recall vs brute force on the MAINTAINED index — same contract as
    // the one-shot resplit: nprobe=1 finds the true neighborhood
    val centVecs = cents.map(r => r.getLong(r.fieldIndex("cent_id")) ->
      r.getSeq[Double](r.fieldIndex("cv")).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val byId = vecs.map { case (id, v) => id -> v.toArray }.toMap
    val recalls = Seq(0L, 1L, 2L).map { q =>
      val qv = byId(q)
      val brute = vecs.filter(_._1 != q)
        .map { case (id, v) => (id, math.floor(cos(qv, v.toArray) * 1e7 + 0.5)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
      val probeCell = centVecs.toSeq
        .map { case (cid, cv) => (cid, math.floor(cos(qv, cv) * 1e7 + 0.5)) }
        .maxBy { case (cid, s) => (s, -cid) }._1
      val got = idx.filter { case (id, cid) => cid == probeCell && id != q }
        .map { case (id, _) => (id, math.floor(cos(qv, byId(id)) * 1e7 + 0.5)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
      got.intersect(brute).size.toDouble / brute.size
    }
    assert(recalls.sum / recalls.size >= 0.8,
      s"maintained-index nprobe=1 recall degraded: $recalls")
  }
}
