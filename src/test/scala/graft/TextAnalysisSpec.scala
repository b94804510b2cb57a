package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite with org.scalatest.ParallelTestExecution {
  import SparkTestSession.{spark, sfTiny}

  test("winnowing GUARANTEE: docs sharing a substring >= k+w-1 share a fingerprint") {
    // The Schleimer/Wilkerson/Aiken theorem: any match of length at
    // least k + w - 1 (= 11 here) is caught by at least one shared
    // selected hash. Plant one 20-char substring inside different
    // random contexts and assert the fingerprint sets intersect —
    // across several random placements.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def junk(n: Int): String = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    (1 to 5).foreach { trial =>
      val shared = junk(20)
      val docs = Seq(
        (1L, junk(rnd.nextInt(30)) + shared + junk(rnd.nextInt(30))),
        (2L, junk(rnd.nextInt(30)) + shared + junk(rnd.nextInt(30))))
        .toDF("doc_id", "text")
      val fps = TextAnalysis.winnow(docs)
        .select("doc_id", "fp").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      assert(fps(1L).intersect(fps(2L)).nonEmpty,
        s"trial $trial: no shared fingerprint for shared substring '$shared'")
    }
  }

  test("winnowing density is ~2/(w+1) of the k-gram count on the fixture") {
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "text")
    val nGrams = docs
      .select((length(trim(regexp_replace(lower(col("text")), "\\s+", " "))) -
        lit(TextAnalysis.WinnowK - 1)).as("g"))
      .filter(col("g") > 0).agg(sum("g")).collect()(0).getLong(0)
    val nFps = TextAnalysis.winnow(docs).count()
    val density = nFps.toDouble / nGrams
    val expected = 2.0 / (TextAnalysis.WinnowW + 1)
    assert(density > expected * 0.6 && density < expected * 1.4,
      s"density $density vs theoretical $expected")
  }

  test("winnowing selects a subset of each document's own k-gram hashes") {
    import spark.implicits._
    val doc = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(doc).collect()
    assert(fps.nonEmpty)
    // every selected pos is a valid k-gram start of the normalized text
    val norm = "the quick brown fox jumps over the lazy dog"
    fps.foreach { r =>
      val pos = r.getAs[Long]("pos")
      assert(pos >= 1 && pos <= norm.length - TextAnalysis.WinnowK + 1)
    }
  }

  test("boilerplate ngram scores are consistent per-document invariants") {
    val df = SparkEntry.queries("text_boilerplate_ngrams")(spark, sfTiny)
    val rows = df.collect()
    assert(rows.length == Tables.documents(spark, sfTiny).count())
    rows.foreach { r =>
      val (n, c, ratio) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_common"),
        r.getAs[Double]("common_ratio"))
      assert(n > 0 && c >= 0 && c <= n)
      assert(math.abs(ratio - c.toDouble / n) < 1e-15)
    }
    // the fixture's small vocabulary makes many bigrams corpus-common —
    // the signal must actually fire somewhere
    assert(rows.exists(_.getAs[Long]("n_common") > 0))
  }

  test("cms heavy hitters: estimates dominate exact counts and the sketch is tight on the fixture") {
    val rows = SparkEntry.queries("text_cms_heavy_hitters")(spark, sfTiny).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (exact, est) = (r.getAs[Long]("exact_n"), r.getAs[Long]("cms_est"))
      // the CMS one-sided error bound: never an underestimate
      assert(est >= exact, r.toString)
      // 4x256 cells vs the fixture's small vocabulary: collisions add
      // at most a few smaller words' mass — a loose 3x sanity ceiling
      assert(est <= exact * 3 + 1000, r.toString)
    }
  }

  test("bpe pairs: weighted counts equal a driver-side fold over the corpus") {
    val got = SparkEntry.queries("text_bpe_pairs")(spark, sfTiny).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.length == 50 && got.forall(_._1.length == 2))
    // descending, ties by pair string
    assert(got.sliding(2).forall { case Array((p1, n1), (p2, n2)) =>
      n1 > n2 || (n1 == n2 && p1 < p2) })
    // independent recompute: count every adjacent char pair over all
    // word INSTANCES (= distinct-word counts × word frequency)
    val counts = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    Tables.documents(spark, sfTiny).select("text").collect().foreach { r =>
      "[a-z]+".r.findAllIn(r.getString(0).toLowerCase).foreach { w =>
        (0 until w.length - 1).foreach(i => counts(w.substring(i, i + 2)) += 1L)
      }
    }
    got.foreach { case (p, n) => assert(counts(p) == n, s"$p: ${counts(p)} vs $n") }
    // nothing outside the returned 50 may beat the 50th
    val floor = got.last._2
    val missed = counts.filterNot(kv => got.exists(_._1 == kv._1)).values
    assert(missed.forall(_ <= floor))
  }

  test("BPE encode: bracket-replace tokenization equals a reference greedy merge fold") {
    import SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the text_bpe_encode fixture merge list, pinned here too — a
    // change to either side must be deliberate
    val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
      "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e")
    // independent reference: greedy left-to-right single-rule merge,
    // rules applied in order, on symbol LISTS (no string tricks)
    def encodeRef(word: String): Seq[String] =
      merges.foldLeft(word.map(_.toString): Seq[String]) { case (syms, (a, b)) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        syms.foreach { s =>
          if (out.nonEmpty && out.last == a && s == b)
            out(out.length - 1) = a + b
          else out += s
        }
        out.toSeq
      }
    // hand-checked anchors (chained merges + greedy non-overlap)
    assert(encodeRef("the") == Seq("the"))
    assert(encodeRef("other") == Seq("o", "the", "r"))
    assert(encodeRef("and") == Seq("and"))
    assert(encodeRef("thth") == Seq("th", "th"))
    val words = Seq("the", "then", "other", "and", "din", "inner", "a",
      "rere", "thth", "xyzzy", "intercontinental", "thethe", "onion")
    val enc = merges.foldLeft(
      regexp_replace(col("word"), lit("(.)"), lit("<$1>"))) { case (c, (a, b)) =>
      replace(c, lit(s"<$a><$b>"), lit(s"<$a$b>"))
    }
    val got = words.toDF("word")
      .select(col("word"), split(btrim(enc, lit("<>")), "><").as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(got(w) == encodeRef(w), s"word '$w': ${got(w)} vs ${encodeRef(w)}")
    }
  }

  test("lmPerplexity quality gate is parameterized; default preserves the oracle constant") {
    // scoring columns are threshold-independent; only the flag moves
    val byDefault = TextAnalysis.lmPerplexity(spark, sfTiny)
      .select("doc_id", "ppl_proxy", "low_quality").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    // default 295 (= 29.5) must equal the gated entry's hardwired
    // 2n·1e6 > 59·Σq cross-multiply
    byDefault.foreach { case (_, (proxy, flag)) =>
      assert(flag == (proxy > 29.5) || proxy == 29.5)
    }
    // a stricter gate (threshold 10 = proxy > 1.0) must flag a strict
    // superset, and a looser one (10x the default) a strict subset
    val strict = TextAnalysis.lmPerplexity(spark, sfTiny, thresholdE1 = 10L)
      .filter(col("low_quality")).select("doc_id").collect().map(_.getLong(0)).toSet
    val loose = TextAnalysis.lmPerplexity(spark, sfTiny, thresholdE1 = 2950L)
      .filter(col("low_quality")).select("doc_id").collect().map(_.getLong(0)).toSet
    val default = byDefault.collect { case (id, (_, true)) => id }.toSet
    assert(default.subsetOf(strict), "default-flagged docs must stay flagged under a stricter gate")
    assert(loose.subsetOf(default), "loose-flagged docs must be a subset of the default's")
    assert(strict.size > default.size, "the stricter gate should flag more docs on the fixture")
  }
}
