package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class DedupSpec extends AnyFunSuite with org.scalatest.ParallelTestExecution {
  import SparkTestSession.{spark, sfTiny}

  test("dedup_exact groups cover all docs exactly once (no dups in corpus)") {
    val df = SparkEntry.queries("dedup_exact")(spark, sfTiny)
    val total = df.agg(sum("dup_count")).collect()(0).getLong(0)
    val docs = Tables.documents(spark, sfTiny).count()
    assert(total == docs)
  }

  test("minhash signature has NumHashes columns and is deterministic") {
    val a = SparkEntry.queries("minhash_signature")(spark, sfTiny)
    assert(a.columns.toSeq == ("doc_id" +: (0 until 8).map(j => s"h$j")))
    val r1 = a.orderBy("doc_id").limit(5).collect().map(_.toSeq)
    val r2 = SparkEntry.queries("minhash_signature")(spark, sfTiny)
      .orderBy("doc_id").limit(5).collect().map(_.toSeq)
    assert(r1.toSeq == r2.toSeq)
  }

  test("minhash LSH candidates are a superset of high-jaccard pairs") {
    // Every emitted pair shares at least one minhash by construction;
    // check the jaccard values are in (0, 1] and pairs are ordered.
    val pairs = SparkEntry.queries("dedup_minhash_pairs")(spark, sfTiny).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(2)
      assert(j >= 0.01 && j <= 1.0)
    }
  }

  test("split_leakage_safe: every doc assigned once; no cluster straddles splits") {
    val df = SparkEntry.queries("split_leakage_safe")(spark, sfTiny)
    val docs = Tables.documents(spark, sfTiny).count()
    assert(df.count() == docs)
    assert(df.select("doc_id").distinct().count() == docs)
    // the leakage invariant: a cluster maps to exactly one split
    val straddlers = df.groupBy("cluster_id")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(straddlers == 0L)
    // all three splits non-degenerate names
    val splits = df.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "valid", "test")) && splits.contains("train"))
  }

  test("large-star/small-star CC equals brute components on adversarial graphs") {
    val s = SparkTestSession.spark
    import s.implicits._
    // shapes that stress different failure modes: a LONG CHAIN (linear
    // diameter — the case propagation CC is slow on and star CC must
    // still get right), a clique, a star centered at the LARGEST id
    // (forces relabeling through small-star), isolated pairs, and
    // seeded random graphs
    val chain = (0L until 60L).sliding(2).map(p => (p(0), p(1))).toSeq
    val clique = for (i <- 100L to 106L; j <- (i + 1) to 106L) yield (i, j)
    val bigStar = (200L until 210L).map(i => (299L, i))
    val pairs = Seq((400L, 401L), (402L, 403L))
    val rnd = new scala.util.Random(11)
    val randoms = (0 until 3).map { g =>
      val base = 1000L * (g + 1)
      (0 until 40).map(_ => (base + rnd.nextInt(30), base + rnd.nextInt(30)))
        .filter(p => p._1 != p._2)
    }
    val allEdges = (chain ++ clique ++ bigStar ++ pairs ++ randoms.flatten)
    // brute oracle: union-find in plain Scala
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    allEdges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    val got = graft.operators.Dedup.ccLargeSmallStar(
        allEdges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.values.toSet.size > 5) // several distinct components
  }

  test("containment dominates jaccard, dedupes pairs, and flags true subsets") {
    val cont = SparkEntry.queries("dedup_containment")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // each candidate pair appears exactly once despite the 5-bucket ×
    // 16-salt probe fan-out
    assert(cont.nonEmpty)
    // containment >= jaccard pointwise: |A∩B|/min >= |A∩B|/|A∪B|
    val jacc = SparkEntry.queries("dedup_ngram_jaccard")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    jacc.foreach { case (pair, j) =>
      cont.get(pair).foreach(c => assert(c >= j, s"$pair: cont $c < jacc $j"))
    }
    // a synthetic strict subset scores exactly 1.0 under the same
    // trigram-set containment definition
    val a = "the quick brown fox jumps over the lazy dog"
    val ss = spark
    import ss.implicits._
    val grams = Seq(("a", a), ("b", s"PREFIX $a SUFFIX")).toDF("id", "text")
      .select(col("id"), array_sort(graft.functions.CharNgrams.char_ngrams(col("text"), 3)).as("g"))
    val both = grams.as("x").join(grams.as("y"),
        col("x.id") === "a" && col("y.id") === "b")
      .select((size(array_intersect(col("x.g"), col("y.g"))).cast("double") /
        least(size(col("x.g")), size(col("y.g")))).as("c"))
      .collect()(0).getDouble(0)
    assert(both == 1.0, s"subset containment $both != 1.0")
  }

  test("simhash of identical texts is identical, different texts differ") {
    val sh = SparkEntry.queries("dedup_simhash")(spark, sfTiny)
      .limit(50).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sh.values.forall(_.length == 16))
    // 500 distinct random docs: expect (near-)all distinct signatures
    assert(sh.values.toSet.size > 40)
  }

  test("embedding cosine pairs are symmetric-free and above threshold") {
    val rows = graft.operators.Dedup.bruteCosinePairs(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3 - 1e-6 && r.getDouble(2) <= 1.0)
    }
  }

  test("embedding LSH near-dup: subset of brute force, >=85% recall, no cartesian") {
    val lsh = SparkEntry.queries("dedup_embedding_lsh")(spark, sfTiny)
    // the plan must have NO cartesian/nested-loop join anywhere — the
    // whole point of the bucketed path
    val physical = lsh.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"), physical)
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)

    val brute = graft.operators.Dedup.bruteCosinePairs(spark, sfTiny)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = lsh.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every LSH pair passed the exact-cosine confirm → subset of brute
    assert(found.subsetOf(brute))
    // banding is 16 bands × 4 bits: 92% recall measured on this fixture
    // (near-orthogonal Gaussian — LSH's hard case); assert a margin below
    val recall = found.size.toDouble / brute.size
    assert(recall >= 0.85, s"recall $recall (${found.size}/${brute.size})")
  }

  test("semantic kmeans dedup: pairs share a cluster, no cartesian, subset of brute") {
    val km = SparkEntry.queries("dedup_semantic_kmeans")(spark, sfTiny)
    // centroid assignment is corpus × broadcast(k centroids) — a
    // BroadcastNestedLoopJoin with a tiny broadcast side is the
    // intended shape (same as IVF); what must never appear is a
    // large×large CartesianProduct (the pair join must stay an
    // equi-join on the cluster id)
    val physical = km.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"), physical)
    val rows = km.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(2))
      assert(r.getDouble(3) >= 0.3 - 1e-6 && r.getDouble(3) <= 1.0)
    }
    // in-cluster pairing only confirms pairs brute force also finds
    val brute = graft.operators.Dedup.bruteCosinePairs(spark, sfTiny)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = rows.map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(found.subsetOf(brute))
  }

  test("maintained minhash pairs converge to the batch pair set; ghosts fully retract") {
    def keyed(name: String) =
      SparkEntry.queries(name)(spark, sfTiny).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9))
        .toMap
    val batch = keyed("dedup_minhash_pairs")
    val maintained = keyed("dedup_minhash_maintained")
    assert(maintained == batch)
    // the ghost docs (ids shifted by 1e9) were inserted mid-changelog
    // and deleted later — no pair touching them may survive
    assert(maintained.keys.forall { case (a, b) =>
      a < 1000000000L && b < 1000000000L })
  }

  test("maintained embedding-LSH pairs converge to the batch pair set; ghosts retract") {
    def keyed(name: String) =
      SparkEntry.queries(name)(spark, sfTiny).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9))
        .toMap
    val batch = keyed("dedup_embedding_lsh")
    val maintained = keyed("dedup_embedding_lsh_maintained")
    assert(maintained == batch)
    assert(maintained.keys.forall { case (a, b) =>
      a < 1000000000L && b < 1000000000L })
  }

  test("maintained CC: inserts merge component-locally, a cut-vertex delete SPLITS") {
    val ss = spark
    import ss.implicits._
    def edges(ps: (Long, Long)*) = ps.toDF("doc_a", "doc_b")
    def ids(xs: Long*) = xs.toDF("doc_id")
    def snapshot(cc: graft.operators.Dedup.MaintainedCc): Map[Long, Long] =
      cc.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val cc = new graft.operators.Dedup.MaintainedCc
    // batch 1: two separate clusters {1,2,4} (1-2, 2-4) and {10,11}
    cc.insertEdges(edges((1L, 2L), (2L, 4L), (10L, 11L)))
    assert(snapshot(cc) == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    // batch 2: bridge 4-10 MERGES them (star edges ∪ Δ, not full edges)
    cc.insertEdges(edges((4L, 10L)))
    assert(snapshot(cc) ==
      Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 10L -> 1L, 11L -> 1L))
    // delete the cut vertex 4: the component must SPLIT back into
    // {1,2} and {10,11} — re-clustering over star edges would keep
    // them merged (the collapsed star hides which paths died)
    cc.deleteDocs(ids(4L))
    assert(snapshot(cc) == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
    // delete 11: {10,11} dissolves — 10 is edgeless and must DROP its
    // label (the oracle labels only edge endpoints); {1,2} untouched
    cc.deleteDocs(ids(11L))
    assert(snapshot(cc) == Map(1L -> 1L, 2L -> 1L))
    // re-insert a bridge through NEW node 3: merge again, min label 1
    cc.insertEdges(edges((2L, 3L), (3L, 10L), (10L, 11L)))
    assert(snapshot(cc) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L))
  }

  test("persisted CC: same semantics through the snapshot log, across a session restart") {
    val ss = spark
    import ss.implicits._
    def edges(ps: (Long, Long)*) = ps.toDF("doc_a", "doc_b")
    def ids(xs: Long*) = xs.toDF("doc_id")
    val cc = new graft.operators.Dedup.PersistedCc
    def snap(s: org.apache.spark.sql.SparkSession): Map[Long, Long] =
      cc.labelState(s).map(_.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
        .getOrElse(Map.empty)

    cc.insertEdges(spark, edges((1L, 2L), (2L, 4L), (10L, 11L)))
    cc.insertEdges(spark, edges((4L, 10L)))
    assert(snap(spark) ==
      Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 10L -> 1L, 11L -> 1L))
    // RESTART: a fresh session sees only the committed log — and the
    // cut-vertex delete (the hardest maintenance case: the component
    // must SPLIT from surviving real edges) runs entirely on the
    // reopened state
    val s2 = spark.newSession()
    cc.deleteDocs(s2, ids(4L))
    assert(snap(s2) == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
    // edgeless member drops its label row (a DV commit, not a rewrite)
    cc.deleteDocs(s2, ids(11L))
    assert(snap(s2) == Map(1L -> 1L, 2L -> 1L))
    // resumed ingest merges again through a new bridge node
    cc.insertEdges(s2, edges((2L, 3L), (3L, 10L), (10L, 11L)))
    assert(snap(s2) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L))
    // the edge table tracked the deletes: only surviving pairs remain
    val pairs = cc.edgeState(s2).get
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L), (3L, 10L), (10L, 11L)))
  }
}
