package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.RollingHash

class FunctionsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfTiny}
  import spark.implicits._

  test("rolling_hash matches the reference implementation (codegen path)") {
    val inputs = Seq("", "a", "hello world", "ünïcödé ✓", "x" * 10000)
    val got = inputs.toDF("s")
      .select(RollingHash.rolling_hash(col("s")).as("h"))
      .collect().map(_.getLong(0))
    val expected = inputs.map(s => RollingHash.hashBytes(s.getBytes("UTF-8")))
    assert(got.toSeq == expected)
  }

  test("rolling_hash is null-safe") {
    val got = Seq(Option("abc"), None).toDF("s")
      .select(RollingHash.rolling_hash(col("s")).as("h"))
      .collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
  }

  test("rolling_hash distinguishes all documents at sf0.001 (no collisions)") {
    val docs = Tables.documents(spark, sfTiny)
    val n = docs.count()
    val distinctHashes = docs
      .select(RollingHash.rolling_hash(col("text")).as("h")).distinct().count()
    assert(distinctHashes == n)
  }

  test("rolling_kgram_hashes matches a direct per-window reference (incl. non-ASCII)") {
    import graft.functions.RollingKgramHashes
    // reference: hash each k-window of code points independently (no
    // rolling update) — catches any subtract-multiply drift in the
    // rolling recurrence, on ASCII, CJK, emoji (surrogate pairs), and
    // boundary lengths around k
    def ref(s: String, k: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      if (cps.length < k) Seq.empty
      else (0 to cps.length - k).map { i =>
        var h = 0L
        (0 until k).foreach(j => h = h * RollingKgramHashes.Prime + cps(i + j))
        h
      }
    }
    val inputs = Seq("", "abcdefg", "abcdefgh", "the quick brown fox",
      "héllo wörld ünïcödé", "汉字漢字測試文本字符串", "a😀b😀c😀d😀e😀f😀", "x" * 5000)
    for (k <- Seq(1, 3, 8)) {
      val got = inputs.toDF("s")
        .select(RollingKgramHashes.rolling_kgram_hashes(col("s"), k).as("h"))
        .collect().map(_.getSeq[Long](0).toSeq)
      assert(got.toSeq == inputs.map(ref(_, k)), s"k=$k")
    }
  }

  test("rolling_kgram_hashes is null-safe and empty below k") {
    import graft.functions.RollingKgramHashes
    val got = Seq(Option("abc"), None).toDF("s")
      .select(RollingKgramHashes.rolling_kgram_hashes(col("s"), 8).as("h"))
      .collect()
    assert(!got(0).isNullAt(0) && got(0).getSeq[Long](0).isEmpty)
    assert(got(1).isNullAt(0))
  }

  test("word_shingles equals the composed HOF formulation") {
    import graft.functions.WordShingles.word_shingles
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b a b a b",      // duplicate shingles → dedup
      "one two",          // < n tokens → single joined shingle
      "solo", "")
      .toDF("text")
    val t = col("t")
    val got = docs
      .select(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)).as("t"))
      .select(word_shingles(t, 3).as("s"), t)
      .select(col("s"),
        when(size(t) >= 3,
          array_distinct(transform(sequence(lit(1), size(t) - 2),
            i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))))
          .otherwise(array(concat_ws(" ", t))).as("expected"))
      .collect()
    got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("word_shingles is null-safe") {
    val got = Seq(Option(Seq("a", "b", "c", "d")), None).toDF("t")
      .select(graft.functions.WordShingles.word_shingles(col("t"), 3).as("s"))
      .collect()
    assert(got(0).getSeq[String](0) == Seq("a b c", "b c d") && got(1).isNullAt(0))
  }

  test("char_ngrams equals the composed substr formulation (incl. non-ASCII)") {
    import graft.functions.CharNgrams.char_ngrams
    val docs = Seq("abcdef", "aaaa", "ab", "", "ünïcödé ✓ tëst").toDF("text")
    val got = docs
      .select(char_ngrams(col("text"), 3).as("s"),
        expr("""CASE WHEN length(text) >= 3
               | THEN array_distinct(transform(sequence(1, length(text)-2), i -> substr(text, i, 3)))
               | ELSE cast(array() AS array<string>) END""".stripMargin)
          .as("expected"))
      .collect()
    got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("vector kernels null-poison like the HOF fold; jaccard of empty sets is NULL") {
    val r = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x) AS hof,
        |       a, b FROM VALUES (array(1.0d, cast(null AS double)), array(1.0d, 1.0d)) t(a, b)""".stripMargin)
      .select(graft.functions.VectorOps.dot(col("a"), col("b")).as("d"),
        graft.functions.VectorOps.normSq(col("a")).as("n"), col("hof"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    val j = Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
      .select(graft.functions.JaccardSim.jaccard_sim(col("a"), col("b")).as("j"))
      .collect()(0)
    assert(j.isNullAt(0), "0/0 jaccard is NULL, like Divide")
  }

  test("jaccard_sim equals the composed intersect/union formulation") {
    import graft.functions.JaccardSim.jaccard_sim
    val pairs = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq("a", "a", "b"), Seq("b", "b", "a")), // dup elements → set semantics
      (Seq.empty[String], Seq("x")))
      .toDF("a", "b")
    val got = pairs.select(
        jaccard_sim(col("a"), col("b")).as("j"),
        (size(array_intersect(col("a"), col("b"))).cast("double") /
          size(array_distinct(concat(col("a"), col("b"))))).as("expected"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("jaccard_sim_presorted merge path equals hash path on real trigram sets") {
    import graft.functions.JaccardSim.{jaccard_sim, jaccard_sim_presorted}
    val g = Tables.documents(spark, sfTiny).limit(60)
      .select(col("doc_id"),
        array_sort(graft.functions.CharNgrams.char_ngrams(col("text"), 3)).as("grams"))
    val got = g.as("x").join(g.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(
        jaccard_sim_presorted(col("x.grams"), col("y.grams")).as("merge"),
        jaccard_sim(col("x.grams"), col("y.grams")).as("hash"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vec_dot / vec_norm_sq are bit-identical to the HOF fold") {
    val vecs = Tables.embeddings(spark, sfTiny).limit(200)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val got = vecs.select(
        graft.functions.VectorOps.dot(col("v"), col("v")).as("d"),
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("d_hof"),
        graft.functions.VectorOps.normSq(col("v")).as("n"),
        aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x).as("n_hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) == java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) == java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("native functions are callable from SQL text after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT word_shingles(array('a','b','c','d'), 3) AS s,
        |       char_ngrams('abcd', 3) AS g,
        |       jaccard_sim(array('x','y'), array('y','z')) AS j,
        |       vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       vec_norm_sq(array(3.0d, 4.0d)) AS n,
        |       rolling_hash('abc') AS h""".stripMargin).collect()(0)
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getSeq[String](1) == Seq("abc", "bcd"))
    assert(r.getDouble(2) == 1.0 / 3)
    assert(r.getDouble(3) == 11.0 && r.getDouble(4) == 25.0)
    assert(r.getLong(5) == graft.functions.RollingHash.hashBytes("abc".getBytes("UTF-8")))
    val r2 = spark.sql(
      "SELECT word_ngrams(array('a','b','a','b'), 2) AS g").collect()(0)
    assert(r2.getSeq[String](0) == Seq("a b", "b a", "a b"))
    // the aggregate registers too: one group, one token hash
    val r3 = spark.sql(
      "SELECT simhash_agg(h) AS sh FROM (SELECT md5('tok') AS h)").collect()(0)
    assert(r3.getString(0) == java.security.MessageDigest.getInstance("MD5")
      .digest("tok".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16))
    // top-k aggregates from SQL text: rank order, then a merge rollup
    val r4 = spark.sql(
      """SELECT topk_pairs(s, i, 2) AS top FROM (VALUES (5L, 10L), (9L, 7L), (5L, 3L))
        | AS t(s, i)""".stripMargin).collect()(0)
    val pairs = r4.getSeq[org.apache.spark.sql.Row](0).map(p => (p.getLong(0), p.getLong(1)))
    assert(pairs == Seq((9L, 7L), (5L, 3L)), pairs)
    val r5 = spark.sql(
      """SELECT topk_merge(top, 2) AS m FROM (
        | SELECT topk_pairs(s, i, 2) AS top FROM (VALUES (5L, 10L), (9L, 7L)) AS a(s, i)
        | UNION ALL
        | SELECT topk_pairs(s, i, 2) FROM (VALUES (7L, 1L), (5L, 3L)) AS b(s, i))""".stripMargin)
      .collect()(0)
    val merged = r5.getSeq[org.apache.spark.sql.Row](0).map(p => (p.getLong(0), p.getLong(1)))
    assert(merged == Seq((9L, 7L), (7L, 1L)), merged)
  }

  test("GraftExtensions injections land in a function registry") {
    // apply the injector exactly the way session construction does with
    // spark.sql.extensions, against a cloned builtin registry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    val registry = org.apache.spark.sql.GraftBridge.applyInjectedFunctions(
      ext, org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
    graft.functions.GraftFunctions.all.foreach { case (name, _, _) =>
      assert(registry.functionExists(FunctionIdentifier(name)), s"$name registered")
    }
  }

  test("registered SQL functions reject wrong arity with a named error") {
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT rolling_hash('a', 'b')").collect())
    assert(e.getMessage.contains("rolling_hash"), s"got: ${e.getMessage}")
  }

  test("simhash_agg equals the composed 64-column SUM(CASE) vote form") {
    import graft.functions.SimHashAgg.simhash_agg
    def voteExpr(b: Int): String = {
      val pos = b / 4 + 1
      val shift = 3 - b % 4
      s"SUM(CASE WHEN ((instr('0123456789abcdef', substr(h, $pos, 1)) - 1) >> $shift) & 1 = 1 THEN 1 ELSE -1 END) AS v$b"
    }
    val hexAssembly = {
      val digits = (0 until 16).map { dIdx =>
        val terms = (0 until 4).map { k =>
          val b = dIdx * 4 + k
          s"CASE WHEN v$b > 0 THEN ${8 >> k} ELSE 0 END"
        }.mkString(" + ")
        s"substr('0123456789abcdef', ($terms) + 1, 1)"
      }
      s"concat(${digits.mkString(", ")})"
    }
    val th = Tables.documents(spark, sfTiny).limit(100)
      .select(col("doc_id"),
        explode(array_distinct(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))).as("t"))
      .selectExpr("doc_id", "md5(t) AS h")
    val native = th.groupBy("doc_id").agg(simhash_agg(col("h")).as("sh"))
    val composed = th.groupBy(col("doc_id"))
      .agg(expr(voteExpr(0)).as("v0"), (1 until 64).map(b => expr(voteExpr(b)).as(s"v$b")): _*)
      .selectExpr("doc_id", s"$hexAssembly AS sh")
    val got = native.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = composed.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("kmv_distinct: exact below k, within 20% above k, merge-invariant") {
    import graft.functions.KmvDistinctAgg.kmv_distinct
    val h = conv(substring(md5(to_binary(col("v").cast("string"), lit("utf-8"))), 1, 15),
      16, 10).cast("long")
    // below k: the sketch IS the exact distinct count
    val small = (1 to 40).map(i => ("g", i)).toDF("g", "v")
      .groupBy("g").agg(kmv_distinct(h, 64).as("est"))
      .collect()(0).getDouble(1)
    assert(small == 40.0)
    // duplicates never inflate the estimate
    val dup = ((1 to 40) ++ (1 to 40)).map(i => ("g", i)).toDF("g", "v")
      .groupBy("g").agg(kmv_distinct(h, 64).as("est"))
      .collect()(0).getDouble(1)
    assert(dup == 40.0)
    // above k: estimator within 20% of truth at k=64 (expected rel.
    // error ~ 1/sqrt(k-2) ≈ 13%)
    val big = (1 to 5000).map(i => ("g", i)).toDF("g", "v")
      .groupBy("g").agg(kmv_distinct(h, 64).as("est"))
      .collect()(0).getDouble(1)
    assert(math.abs(big - 5000) / 5000.0 < 0.2, s"estimate $big too far from 5000")
    // merge-invariance: 1 partition and 8 partitions agree exactly
    // (bottom-k of a set is partition-independent)
    val df = (1 to 5000).map(i => ("g", i)).toDF("g", "v")
    val p1 = df.repartition(1).groupBy("g").agg(kmv_distinct(h, 64)).collect()(0).getDouble(1)
    val p8 = df.repartition(8).groupBy("g").agg(kmv_distinct(h, 64)).collect()(0).getDouble(1)
    assert(p1 == p8 && p1 == big)
  }

  test("kmv sketch rollup: merged partial sketches estimate exactly like a direct sketch") {
    import graft.functions.KmvDistinctAgg.{kmv_distinct, kmv_merge_estimate, kmv_sketch}
    val h = conv(substring(md5(to_binary(col("v").cast("string"), lit("utf-8"))), 1, 15),
      16, 10).cast("long")
    // 3000 values spread over 10 'day' partials with heavy cross-day
    // overlap (v mod 3000): rollup must dedup ACROSS partials
    val df = (0 until 10).flatMap(day => (0 until 1200).map(i => (day, (day * 700 + i) % 3000)))
      .toDF("day", "v")
    val direct = df.groupBy(lit(1).as("g")).agg(kmv_distinct(h, 64).as("est"))
      .collect()(0).getDouble(1)
    val rolled = df.groupBy("day").agg(kmv_sketch(h, 64).as("sk"))
      .groupBy(lit(1).as("g")).agg(kmv_merge_estimate(col("sk"), 64).as("est"))
      .collect()(0).getDouble(1)
    assert(rolled == direct, s"rollup $rolled != direct $direct")
    // sketch arrays are the sorted bottom-k: bounded and ordered
    val sk = df.groupBy("day").agg(kmv_sketch(h, 64).as("sk"))
      .collect().map(_.getSeq[Long](1))
    sk.foreach { a =>
      assert(a.length <= 64 && a == a.sorted && a.distinct.length == a.length)
    }
  }

  test("kmv_distinct is SQL-registered and matches the Column form") {
    graft.functions.GraftFunctions.register(spark)
    val df = (1 to 300).map(i => (i % 3, i)).toDF("g", "v")
    df.createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      """SELECT g, kmv_distinct(CAST(conv(substring(md5(to_binary(CAST(v AS STRING), 'utf-8')), 1, 15), 16, 10) AS BIGINT), 64) AS est
        |FROM kmv_in GROUP BY g""".stripMargin)
      .orderBy("g").collect().map(r => (r.getInt(0), r.getDouble(1)))
    val h = conv(substring(md5(to_binary(col("v").cast("string"), lit("utf-8"))), 1, 15),
      16, 10).cast("long")
    val viaCol = df.groupBy("g")
      .agg(graft.functions.KmvDistinctAgg.kmv_distinct(h, 64).as("est"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(viaSql.toSeq == viaCol.toSeq && viaSql.nonEmpty)
  }

  test("kmv_distinct rejects non-BIGINT input at analysis with a named error") {
    graft.functions.GraftFunctions.register(spark)
    val ss = spark
    import ss.implicits._
    Seq(("g", "x")).toDF("g", "v").createOrReplaceTempView("kmv_bad")
    // md5(v) is a STRING — the natural slip; must fail analysis, not
    // die per-task with a ClassCastException
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT g, kmv_distinct(md5(v), 64) FROM kmv_bad GROUP BY g").collect())
    assert(e.getMessage.contains("BIGINT"), e.getMessage)
  }

  test("PLAN AUDIT: kmv_distinct aggregates partially map-side (sketches merge)") {
    val plan = SparkEntry.queries("agg_kmv_distinct")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate in two
    // stages — partial before the exchange, final after — so the
    // shuffle carries k-long sketch buffers, not raw rows
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2, plan)
    assert(plan.contains("partial_kmv_distinct"), plan)
  }

  test("q_sketch rollup: exact integer ranks, partition-invariant, rollup == direct") {
    import graft.functions.QuantileSketchAgg.{q_merge_quantile, q_merge_sketch, q_sketch}
    val ss = spark
    import ss.implicits._
    // values 1..10000 over 10 'day' partials, shift 4 (buckets of 16)
    val df = (1 to 10000).map(i => (i % 10, i.toLong)).toDF("day", "v")
    // scalar reference: quantile at rank ceil(p*N/1000) over v >> 4,
    // reported as bucket lower bound << 4
    def refQ(p: Int): Long = {
      val bs = (1 to 10000).map(i => (i.toLong >> 4)).sorted
      val rank = (bs.size.toLong * p + 999) / 1000
      bs(rank.toInt - 1) << 4
    }
    val direct = df.groupBy(lit(1).as("g"))
      .agg(q_sketch(col("v"), 4).as("sk"))
      .agg(q_merge_quantile(col("sk"), 500, 4).as("p50"),
        q_merge_quantile(col("sk"), 990, 4).as("p99"))
      .collect()(0)
    assert(direct.getLong(0) == refQ(500) && direct.getLong(1) == refQ(990),
      s"direct (${direct.getLong(0)}, ${direct.getLong(1)}) vs ref (${refQ(500)}, ${refQ(990)})")
    // two-level rollup (day sketches -> merged sketch -> quantile)
    // must equal the direct pass: count addition is associative
    val rolled = df.groupBy("day").agg(q_sketch(col("v"), 4).as("sk"))
      .groupBy(lit(1).as("g")).agg(q_merge_sketch(col("sk")).as("sk"))
      .agg(q_merge_quantile(col("sk"), 500, 4).as("p50"),
        q_merge_quantile(col("sk"), 990, 4).as("p99"))
      .collect()(0)
    assert(rolled.getLong(0) == direct.getLong(0) && rolled.getLong(1) == direct.getLong(1))
    // partition invariance (serde + merge path): 1 vs 8 partitions
    val p8 = df.repartition(8).groupBy(lit(1).as("g"))
      .agg(q_sketch(col("v"), 4).as("sk"))
      .agg(q_merge_quantile(col("sk"), 500, 4).as("p50"))
      .collect()(0).getLong(0)
    assert(p8 == direct.getLong(0))
    // sketch arrays are interleaved (bucket, count) in ascending order
    val sk = df.groupBy("day").agg(q_sketch(col("v"), 4).as("sk"))
      .collect().map(_.getSeq[Long](1))
    sk.foreach { a =>
      assert(a.length % 2 == 0)
      val buckets = a.grouped(2).map(_.head).toSeq
      assert(buckets == buckets.sorted && buckets.distinct.length == buckets.length)
      assert(a.grouped(2).map(_(1)).sum == 1000L)  // each day holds 1000 rows
    }
  }

  test("q_* functions are SQL-registered and reject bad input at analysis") {
    graft.functions.GraftFunctions.register(spark)
    val ss = spark
    import ss.implicits._
    (1 to 100).map(i => (i % 2, i.toLong)).toDF("g", "v").createOrReplaceTempView("qs_in")
    val viaSql = spark.sql(
      """SELECT g, q_merge_quantile(sk, 500, 2) AS p50 FROM (
        |  SELECT g, q_sketch(v, 2) AS sk FROM qs_in GROUP BY g)
        |GROUP BY g""".stripMargin)
      .orderBy("g").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(viaSql.length == 2 && viaSql.forall(_._2 > 0))
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT q_sketch(CAST(v AS STRING), 2) FROM qs_in").collect())
    assert(e.getMessage.contains("BIGINT"), e.getMessage)
  }

  test("topk_pairs: partition-invariant, tie-deterministic, equals the window formulation") {
    import graft.functions.TopKAgg.topk_pairs
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // scores with deliberate ties; ids unique
    val rows = (0L until 500L).map(i => (s"g${i % 7}", (i * 37) % 50, i))
    def run(parts: Int) = rows.toDF("g", "s", "id").repartition(parts)
      .groupBy("g").agg(topk_pairs(col("s"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.score"), col("col.id"))
      .collect().map(_.toString).sorted.toSeq
    val one = run(1)
    assert(one == run(13) && one == run(32), "partitioning changed the top-k")
    // window-formulation equivalence, rank included
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id"))
    val want = rows.toDF("g", "s", "id")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("g"), (col("rn") - 1).cast("int").as("pos"), col("s"), col("id"))
      .collect().map(_.toString).sorted.toSeq
    assert(one == want)
  }

  test("topk_merge: any rollup shape equals the direct top-k (bounded-merge identity)") {
    import graft.functions.TopKAgg.{topk_pairs, topk_merge}
    import spark.implicits._
    val rows = (0L until 800L).map(i => (s"g${i % 5}", s"part${i % 13}", (i * 41) % 83, i))
      .toDF("g", "sub", "s", "id")
    // direct: top-4 per g in one aggregate
    val direct = rows.groupBy("g").agg(topk_pairs(col("s"), col("id"), 4).as("top"))
      .select(col("g"), posexplode(col("top")))
      .collect().map(_.toString).sorted.toSeq
    // rolled: per-(g, sub) partials, then merged — 13 partials per group
    val rolled = rows.groupBy("g", "sub")
      .agg(topk_pairs(col("s"), col("id"), 4).as("p"))
      .groupBy("g").agg(topk_merge(col("p"), 4).as("top"))
      .select(col("g"), posexplode(col("top")))
      .collect().map(_.toString).sorted.toSeq
    assert(direct == rolled && direct.nonEmpty)
  }

  test("text fingerprint md5 equals JVM md5 of normalized text") {
    val row = Tables.documents(spark, sfTiny).limit(1)
      .select(col("text"),
        md5(to_binary(trim(regexp_replace(lower(col("text")), "\\s+", " ")), lit("utf-8"))).as("fp"))
      .collect()(0)
    val norm = row.getString(0).toLowerCase.replaceAll("\\s+", " ").trim
    val jvm = java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getString(1) == jvm)
  }
}
