package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.GraftQuery.{rowsOnly, sql}
import graft.functions.RollingHash.rolling_hash

/** Text-analysis operators over the `documents` table — the pieces a
  * training-data pipeline runs before anything else: token counting,
  * quality scoring, language ID, and document fingerprinting.
  *
  * Everything here is built from codegen'd `functions._` expressions
  * (regexp_extract_all / higher-order array functions), so each query
  * is a single parquet scan with no shuffle — embarrassingly parallel
  * at any scale. The DuckDB oracles mirror the exact same expression
  * so the driver's value-hash compare is meaningful.
  *
  * Cross-engine determinism notes:
  *  - token sets come from `regexp_extract_all(lower(text), '[a-z0-9]+')`
  *    — same semantics in Java regex (Spark) and RE2 (DuckDB).
  *  - DuckDB `regexp_replace` needs the explicit 'g' flag; Spark is
  *    global by default.
  *  - ratios are plain IEEE divisions of exact integers → bit-identical
  *    in both engines, no rounding needed.
  */
object TextAnalysis {

  private val tokenPattern = "[a-z0-9]+"

  /** The pinned "learned" merge list for `text_bpe_encode` — eight
    * chained English merges in application order (training order from
    * a text_bpe_pairs-style run; chaining matters: `th`+`e` only
    * fires after `t`+`h`). Declared before `defs`, which folds over
    * it at object init. */
  private val BpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
    "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e")

  /** Language marker sets for the n-gram/stopword language-ID
    * heuristic. Checked in fixed priority order (en, fr, es, de) with
    * >= so ties resolve identically in both engines; CJK characters
    * short-circuit to zh.
    */
  private val enStops = Seq("the", "a", "of", "and", "is", "to", "in")
  private val frStops = Seq("le", "la", "les", "et", "de", "un", "est")
  private val esStops = Seq("el", "los", "y", "que", "en", "un", "es")
  private val deStops = Seq("der", "die", "das", "und", "ist", "ein")

  private def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit(tokenPattern), lit(0))

  private def countIn(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(set, t)))
  }

  private def sqlCountIn(words: Seq[String]): String =
    s"len(list_filter(regexp_extract_all(lower(text), '$tokenPattern'), t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** Winnowing fingerprints of `(doc_id, text)` rows (k-gram size
    * [[WinnowK]], window [[WinnowW]]) — see the `text_winnowing` entry
    * for the algorithm and packing convention. Exposed so callers (and
    * the guarantee spec) can winnow any document frame. */
  val WinnowK = 8
  val WinnowW = 4

  /** The winnowing pipeline as DuckDB CTEs (normalize → k-gram rolling
    * hashes → (hash, pos) packing → windowed min → distinct picks),
    * shared by every oracle that mirrors [[winnow]] — ONE definition
    * keeps the constants (k, w, the 2^44 mask, the 65536 packing) in
    * lockstep across gates. Ends with `sel(doc_id, mn)`; callers
    * unpack `mn // 65536 AS fp` / `mn % 65536 AS pos`. */
  def winnowOracleCtes: String =
    s"""n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
       |           FROM documents),
       |f AS (SELECT doc_id, s FROM n WHERE length(s) >= $WinnowK),
       |g AS (SELECT doc_id, unnest(generate_series(1, length(s) - ${WinnowK - 1})) AS pos, s FROM f),
       |h AS (SELECT doc_id, pos,
       |        list_reduce(list_prepend(0::HUGEINT,
       |          list_transform(generate_series(pos, pos + ${WinnowK - 1}),
       |            j -> unicode(substr(s, j, 1))::HUGEINT)),
       |          (acc, c) -> (acc * ${graft.functions.RollingKgramHashes.Prime}::HUGEINT + c)
       |            % 18446744073709551616::HUGEINT) AS hm
       |      FROM g),
       |p AS (SELECT doc_id, pos,
       |        CAST(hm % 17592186044416::HUGEINT AS BIGINT) * 65536 + pos % 65536 AS hp
       |      FROM h),
       |w AS (SELECT doc_id, pos,
       |        MIN(hp) OVER (PARTITION BY doc_id ORDER BY pos
       |          ROWS BETWEEN ${WinnowW - 1} PRECEDING AND CURRENT ROW) AS mn
       |      FROM p),
       |sel AS (SELECT DISTINCT doc_id, mn FROM w WHERE pos >= $WinnowW)""".stripMargin
  def winnow(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(WinnowW - 1), 0)
    docs
      .select(col("doc_id"), norm.as("s"))
      .filter(length(col("s")) >= WinnowK)
      // ONE linear pass produces every k-gram hash (native kernel);
      // posexplode is 0-based, the packing convention is 1-based
      .select(col("doc_id"), posexplode(
        graft.functions.RollingKgramHashes.rolling_kgram_hashes(col("s"), WinnowK))
        .as(Seq("pos0", "h")))
      // pack (44-bit hash, 16-bit position) into one BIGINT: pmod maps
      // the signed 64-bit rolling hash onto the oracle's unsigned
      // residue (2^44 divides 2^64, so the mod-2^44 classes agree)
      .select(col("doc_id"), (col("pos0") + 1).as("pos"),
        (pmod(col("h"), lit(1L << 44)) * lit(65536L) +
          pmod(col("pos0") + 1, lit(65536))).as("hp"))
      .select(col("doc_id"), col("pos"), min(col("hp")).over(win).as("mn"))
      .filter(col("pos") >= WinnowW)
      .select(col("doc_id"), col("mn")).distinct()
      .select(col("doc_id"),
        shiftright(col("mn"), 16).as("fp"),
        col("mn").bitwiseAND(lit(65535L)).as("pos"))
  }

  val defs: Seq[GraftQuery] = Seq(
    // TYPE-TOKEN RATIO — the vocabulary-richness quality axis the
    // length/stopword scores miss (template spam repeats few types
    // over many tokens; TTR exposes it): distinct tokens over total
    // tokens per document, exact ints + ONE IEEE division, one scan
    // + one hash aggregate over exploded tokens.
    sql("text_type_token_ratio",
      s"""SELECT doc_id,
         | CAST(COUNT(DISTINCT t) AS BIGINT) AS n_types,
         | COUNT(*) AS n_tokens,
         | CAST(COUNT(DISTINCT t) AS DOUBLE) / COUNT(*) AS ttr
         |FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '$tokenPattern')) AS t
         |      FROM documents)
         |GROUP BY doc_id""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(regexp_extract_all(lower(col("text")), lit(tokenPattern), lit(0))).as("t"))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("t")).as("n_types"), count(lit(1)).as("n_tokens"))
          .select(col("doc_id"), col("n_types"), col("n_tokens"),
            (col("n_types").cast("double") / col("n_tokens")).as("ttr"))
    },

    // VOCABULARY COVERAGE — the OOV-rate quality filter: what fraction
    // of a document's tokens fall inside the corpus's top-200
    // vocabulary (count DESC, token ASC — the tie can never straddle
    // the cut nondeterministically). Docs dominated by out-of-vocab
    // junk (mojibake, code spew, lorem noise) score low and get
    // filtered before tokenizer training. Shape at scale: one explode
    // scan feeds BOTH sides — the vocabulary is a token hash-aggregate
    // (map-side combine) cut via orderBy+limit (TakeOrdered — no
    // single-partition window) and broadcast back, the per-doc
    // coverage a second hash aggregate; exact integer counts + ONE
    // IEEE division.
    sql("text_vocab_coverage",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '$tokenPattern')) AS t
         |  FROM documents),
         |vocab AS (
         |  SELECT t AS vw FROM (
         |    SELECT t, COUNT(*) AS n FROM toks GROUP BY t
         |    ORDER BY n DESC, t LIMIT 200))
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |  COUNT(vw) AS n_in_vocab,
         |  CAST(COUNT(vw) AS DOUBLE) / COUNT(*) AS coverage
         |FROM toks LEFT JOIN vocab ON t = vw
         |GROUP BY doc_id""".stripMargin) {
      (s, d) =>
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
        val vocab = toks.groupBy(col("t")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("t")).limit(200)
          .select(col("t").as("vw"))
        toks.join(broadcast(vocab), col("t") === col("vw"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), count(col("vw")).as("n_in_vocab"))
          .select(col("doc_id"), col("n_tokens"), col("n_in_vocab"),
            (col("n_in_vocab").cast("double") / col("n_tokens")).as("coverage"))
    },

    // --- token counting ------------------------------------------------
    sql("text_token_count",
      s"""SELECT doc_id,
         | len(regexp_extract_all(text, '\\S+')) AS n_ws_tokens,
         | len(regexp_extract_all(lower(text), '$tokenPattern')) AS n_tokens,
         | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_pieces,
         | length(text) AS n_chars_measured
         |FROM documents""".stripMargin) {
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("n_ws_tokens"),
        size(tokens(col("text"))).as("n_tokens"),
        // BPE-ish pre-tokenization: letter runs | digit runs | single
        // punctuation — the shape GPT-style byte-pair encoders split on.
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("n_bpe_pieces"),
        length(col("text")).as("n_chars_measured"))
    },

    // --- quality scoring ----------------------------------------------
    sql("text_quality_score",
      s"""SELECT doc_id, length(text) AS n_chars,
         | len(regexp_extract_all(lower(text), '$tokenPattern')) AS n_tokens,
         | length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
         | CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
         |   / greatest(length(text), 1) AS punct_ratio,
         | CAST(${sqlCountIn(enStops)} AS DOUBLE)
         |   / greatest(len(regexp_extract_all(lower(text), '$tokenPattern')), 1) AS stop_ratio,
         | (length(text) >= 50 AND length(text) <= 10000
         |   AND len(regexp_extract_all(lower(text), '$tokenPattern')) >= 10
         |   AND CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
         |     / greatest(length(text), 1) < 0.1) AS quality_ok
         |FROM documents""".stripMargin) {
      (s, d) =>
        val base = Tables.documents(s, d).select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          size(tokens(col("text"))).as("n_tokens"),
          length(regexp_replace(col("text"), "[^.!?,;:]", "")).as("n_punct"),
          countIn(tokens(col("text")), enStops).as("n_stop"))
        base.select(
          col("doc_id"), col("n_chars"), col("n_tokens"), col("n_punct"),
          (col("n_punct").cast("double") / greatest(col("n_chars"), lit(1))).as("punct_ratio"),
          (col("n_stop").cast("double") / greatest(col("n_tokens"), lit(1))).as("stop_ratio"),
          (col("n_chars") >= 50 && col("n_chars") <= 10000 &&
            col("n_tokens") >= 10 &&
            col("n_punct").cast("double") / greatest(col("n_chars"), lit(1)) < 0.1).as("quality_ok"))
    },

    // TF-IDF KEYWORD EXTRACTION — top-3 characteristic terms per doc.
    // The idf stays EXACT: score = tf·N/df computed as an exact
    // integer cross-product (tf·N < 2^53) and ONE IEEE division — the
    // standard log-idf would put a libm ln() in the rank key (last-ulp
    // engine divergence, exactly what the hash gate exists to catch)
    // and is order-equivalent per doc anyway (ln is monotone; ties
    // under one weighting are ties under the other since both reduce
    // to the rational tf/df at fixed N). Shape: one explode feeds tf
    // (hash agg) and df (distinct agg); the term-keyed join shuffles
    // on the term; the per-doc top-3 is a partitioned row_number.
    sql("text_tfidf_top_terms",
      s"""WITH tok AS (SELECT doc_id,
         |  unnest(regexp_extract_all(lower(text), '$tokenPattern')) AS t FROM documents),
         |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |df AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
         |SELECT doc_id, t AS term, CAST(rk AS BIGINT) AS rk, score FROM (
         | SELECT tf.doc_id, tf.t, CAST(tf * n AS DOUBLE) / df AS score,
         |  ROW_NUMBER() OVER (PARTITION BY tf.doc_id
         |    ORDER BY CAST(tf * n AS DOUBLE) / df DESC, tf.t) AS rk
         | FROM tf JOIN df USING (t), n) s WHERE rk <= 3""".stripMargin) {
      (s, d) =>
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
        val tf = tok.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
        val df = tok.groupBy(col("t")).agg(countDistinct(col("doc_id")).as("df"))
        val n = Tables.documents(s, d).count() // one bounded scalar
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("t"))
        tf.join(df, "t")
          .select(col("doc_id"), col("t"),
            ((col("tf") * lit(n)).cast("double") / col("df")).as("score"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("t").as("term"),
            col("rk").cast("long").as("rk"), col("score"))
    },

    // FLESCH READING EASE — the curriculum/difficulty axis: 206.835 −
    // 1.015·(words/sentences) − 84.6·(syllables/words), with the
    // standard vowel-group syllable heuristic. All three counts are
    // exact integers off one codegen'd regex pass; the score is a
    // FIXED left-associated chain of correctly-rounded IEEE ops
    // spelled identically in both engines, so even a float formula
    // sits behind the value-hash gate.
    sql("text_reading_ease",
      s"""SELECT doc_id,
         | CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
         | CAST(greatest(len(regexp_extract_all(lower(text), '$tokenPattern')), 1) AS BIGINT) AS n_words,
         | CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables,
         | 206.835
         |  - 1.015 * (CAST(greatest(len(regexp_extract_all(lower(text), '$tokenPattern')), 1) AS DOUBLE)
         |             / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
         |  - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
         |            / greatest(len(regexp_extract_all(lower(text), '$tokenPattern')), 1))
         |  AS reading_ease
         |FROM documents""".stripMargin) {
      (s, d) =>
        val base = Tables.documents(s, d).select(
          col("doc_id"),
          greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))), lit(1))
            .cast("long").as("n_sentences"),
          greatest(size(tokens(col("text"))), lit(1)).cast("long").as("n_words"),
          size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
            .cast("long").as("n_syllables"))
        base.select(col("doc_id"), col("n_sentences"), col("n_words"), col("n_syllables"),
          (lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
            - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")))
            .as("reading_ease"))
    },

    // QUALITY DECILES — corpus-relative quality binning (keep the top
    // X% by stopword density — the fluency proxy — rather than an
    // absolute threshold): the global decile cut runs on
    // [[DistributedRank.withNtile]] (range repartition + per-partition
    // rank + broadcast offsets — every stage partitioned; the oracle
    // spells the same cut as NTILE, which at engine scale would be the
    // single-task window this repo bans). The ordering value is ONE
    // IEEE division over exact integer counts — deterministic, and
    // totalized by the doc_id tiebreak.
    sql("text_quality_deciles",
      s"""WITH q AS (
         | SELECT doc_id,
         |  CAST(${sqlCountIn(enStops)} AS DOUBLE)
         |    / greatest(len(regexp_extract_all(lower(text), '$tokenPattern')), 1) AS stop_ratio
         | FROM documents)
         |SELECT doc_id, stop_ratio,
         | NTILE(10) OVER (ORDER BY stop_ratio DESC, doc_id) AS decile
         |FROM q""".stripMargin) {
      (s, d) =>
        val q = Tables.documents(s, d).select(col("doc_id"),
          (countIn(tokens(col("text")), enStops).cast("double") /
            greatest(size(tokens(col("text"))), lit(1))).as("stop_ratio"))
        DistributedRank.withNtile(q, "decile", 10,
          col("stop_ratio").desc, col("doc_id"))
    },

    // --- language identification ---------------------------------------
    // Marker-word scoring with a CJK short-circuit; priority-ordered >=
    // comparisons keep tie-breaks identical across engines. (The
    // synthetic corpus is English-vocabulary, so the interesting part
    // the oracle checks is that both engines score identically, not
    // that the label matches the random `lang` column.)
    sql("text_langid",
      s"""SELECT doc_id, lang,
         | CASE
         |  WHEN len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) > 0 THEN 'zh'
         |  WHEN ${sqlCountIn(enStops)} >= ${sqlCountIn(frStops)}
         |   AND ${sqlCountIn(enStops)} >= ${sqlCountIn(esStops)}
         |   AND ${sqlCountIn(enStops)} >= ${sqlCountIn(deStops)} THEN 'en'
         |  WHEN ${sqlCountIn(frStops)} >= ${sqlCountIn(esStops)}
         |   AND ${sqlCountIn(frStops)} >= ${sqlCountIn(deStops)} THEN 'fr'
         |  WHEN ${sqlCountIn(esStops)} >= ${sqlCountIn(deStops)} THEN 'es'
         |  ELSE 'de'
         | END AS lang_pred
         |FROM documents""".stripMargin) {
      (s, d) =>
        val t = tokens(col("text"))
        val (en, fr, es, de) =
          (countIn(t, enStops), countIn(t, frStops), countIn(t, esStops), countIn(t, deStops))
        val cjk = size(regexp_extract_all(col("text"), lit("[\\u4e00-\\u9fff]"), lit(0)))
        Tables.documents(s, d).select(
          col("doc_id"), col("lang"),
          when(cjk > 0, "zh")
            .when(en >= fr && en >= es && en >= de, "en")
            .when(fr >= es && fr >= de, "fr")
            .when(es >= de, "es")
            .otherwise("de").as("lang_pred"))
    },

    // --- fingerprinting ------------------------------------------------
    // Whitespace-normalized md5 — the canonical exact-dedup key; checked
    // byte-for-byte against DuckDB.
    sql("text_fingerprint",
      """SELECT doc_id,
        | md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin) {
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        md5(to_binary(trim(regexp_replace(lower(col("text")), "\\s+", " ")), lit("utf-8"))).as("fp"))
    },

    // Engine-native 64-bit rolling-hash fingerprint (custom Catalyst
    // expression with codegen, graft.functions.RollingHash) — cheaper
    // than md5 by ~an order of magnitude. The oracle reproduces the
    // exact polynomial in DuckDB: normalized text → codepoints →
    // UTF-8 bytes (manual encode: unicode() gives codepoints, the CASE
    // re-derives the byte sequence) → list_reduce fold in HUGEINT with
    // mod 2^64 wraparound, reinterpreted as signed BIGINT at the end.
    // Verified bit-identical on ASCII, Latin-1, CJK and 4-byte emoji.
    sql("text_rolling_fingerprint",
      s"""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
         |           FROM documents),
         |h AS (
         | SELECT doc_id, list_reduce(
         |   list_prepend(${graft.functions.RollingHash.Seed}::HUGEINT,
         |     flatten(list_transform(
         |       list_transform(generate_series(1, length(s)), i -> unicode(substr(s, i, 1))),
         |       cp -> CASE
         |         WHEN cp < 128 THEN [cp::HUGEINT]
         |         WHEN cp < 2048 THEN [(192 + cp // 64)::HUGEINT, (128 + cp % 64)::HUGEINT]
         |         WHEN cp < 65536 THEN [(224 + cp // 4096)::HUGEINT,
         |           (128 + (cp // 64) % 64)::HUGEINT, (128 + cp % 64)::HUGEINT]
         |         ELSE [(240 + cp // 262144)::HUGEINT, (128 + (cp // 4096) % 64)::HUGEINT,
         |           (128 + (cp // 64) % 64)::HUGEINT, (128 + cp % 64)::HUGEINT]
         |       END))),
         |   (acc, b) -> (acc * ${graft.functions.RollingHash.Prime}::HUGEINT + b)
         |     % 18446744073709551616::HUGEINT) AS h
         | FROM n)
         |SELECT doc_id,
         | CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
         |   THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS fp64
         |FROM h""".stripMargin) {
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        rolling_hash(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp64"))
    },

    // WINNOWING document fingerprints (Schleimer/Wilkerson/Aiken, the
    // MOSS algorithm): hash every char 8-gram of the normalized text,
    // slide a window of 4 consecutive hashes, keep each window's
    // minimum — guarantees any shared substring of length ≥ 11 chars
    // between two documents shares a fingerprint, at ~2/(w+1) of the
    // k-gram density. Tie-break and selection are made deterministic
    // by packing (hash, position) into one BIGINT (44-bit rolling
    // hash · 2^16 + pos): the window MIN then prefers the lowest hash
    // and, among equals, the leftmost position — identical arithmetic
    // in both engines, so fingerprints hash-match exactly.
    //
    // The k-gram hashes come from ONE linear pass of the native
    // [[graft.functions.RollingKgramHashes]] kernel (a rolling
    // subtract-multiply-add per char — measured 3.6 s → 1.3 s at sf0.1
    // over the md5-per-position formulation); the oracle reproduces
    // the polynomial per k-gram in HUGEINT mod 2^64 over the same
    // code-point coefficients.
    //
    // Scale shape: one scan + linear kernel (map-side) → ONE shuffle
    // on doc_id for the ordered window pass (per-doc state is bounded
    // by document length) → per-doc distinct. Position rides `% 65536`
    // in the pack (documented wrap for >65k-char docs; the hash bits
    // above keep minima sound).
    sql("text_winnowing",
      s"""WITH $winnowOracleCtes
         |SELECT doc_id, mn // 65536 AS fp, mn % 65536 AS pos FROM sel""".stripMargin) {
      (s, d) => winnow(Tables.documents(s, d).select(col("doc_id"), col("text")))
    },

    // COUNT-MIN SKETCH heavy hitters — the third mergeable-sketch
    // class on the board (KMV: distinct counts; quantized histograms:
    // quantiles; CMS: frequencies). The sketch is a (4 × 256) counter
    // grid: every word increments one bucket per row (md5-derived
    // hashes), built by ONE map-side-combined aggregate whose state is
    // ≤ 1024 cells per partition regardless of corpus size; the
    // estimate for a key is the MIN over its 4 row counters —
    // deterministic integers, never below the true count. MERGE =
    // cell-wise addition, and the fn PROVES it: two half-corpus
    // sketches (split by doc_id parity) summed cell-wise must be
    // bit-identical to the whole-corpus sketch (an algebraic identity
    // of the construction — the same claim the KMV rollup tree gates,
    // in its exact form). Candidates are the 20 exact-top words so the
    // gate also exhibits the overestimate ordering est >= exact.
    sql("text_cms_heavy_hitters",
      """WITH w AS (
        | SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        | FROM documents),
        |cells AS (
        | SELECT r, ('0x' || substr(md5(CAST(r AS VARCHAR) || w), 1, 8))::BIGINT % 256 AS b,
        |  COUNT(*) AS n
        | FROM w, (SELECT unnest([0, 1, 2, 3]) AS r) rows
        | GROUP BY 1, 2),
        |cand AS (
        | SELECT w, COUNT(*) AS exact_n FROM w GROUP BY w
        | ORDER BY exact_n DESC, w LIMIT 20),
        |probes AS (
        | SELECT c.w, c.exact_n, r.r,
        |  ('0x' || substr(md5(CAST(r.r AS VARCHAR) || c.w), 1, 8))::BIGINT % 256 AS b
        | FROM cand c, (SELECT unnest([0, 1, 2, 3]) AS r) r)
        |SELECT p.w AS word, p.exact_n, MIN(cells.n) AS cms_est
        |FROM probes p JOIN cells ON cells.r = p.r AND cells.b = p.b
        |GROUP BY p.w, p.exact_n""".stripMargin) {
      (s, d) =>
        def bucket(row: Int, w: Column): Column =
          conv(substring(md5(to_binary(concat(lit(row.toString), w), lit("utf-8"))), 1, 8),
            16, 10).cast("long") % 256
        def sketch(words: DataFrame): DataFrame = words
          .select(explode(array((0 until 4).map(i =>
            struct(lit(i).as("r"), bucket(i, col("w")).as("b"))): _*)).as("rb"))
          .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
          .agg(count(lit(1)).as("n"))
        val docs = Tables.documents(s, d)
        // ONE tokenize+explode pass feeds four derivations (whole
        // sketch, two parity halves, exact candidates) — persist it or
        // the corpus is re-scanned per use
        val words = docs.select(col("doc_id"),
          explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("w"))
          .persist()
        val whole = sketch(words.select("w"))
        // MERGE IDENTITY: cell-wise sum of the two parity-half sketches
        // must equal the whole-corpus sketch exactly
        val merged = sketch(words.filter(col("doc_id") % 2 === 0).select("w"))
          .unionByName(sketch(words.filter(col("doc_id") % 2 === 1).select("w")))
          .groupBy("r", "b").agg(sum(col("n")).as("n"))
        require(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
          "CMS merge identity violated: summed half-sketches != whole sketch")
        // NO unpersist here: the returned frame is LAZY — the gated
        // evaluation happens after this closure returns, and dropping
        // the cache now would force two fresh corpus scans per run
        // (fixture-scale persist leak accepted, like the other cached
        // fixture frames)
        val cand = words.groupBy(col("w")).agg(count(lit(1)).as("exact_n"))
          .orderBy(col("exact_n").desc, col("w")).limit(20)
        cand
          .select(col("w"), col("exact_n"),
            explode(array((0 until 4).map(i =>
              struct(lit(i).as("r"), bucket(i, col("w")).as("b"))): _*)).as("rb"))
          .join(whole, col("rb.r") === col("r") && col("rb.b") === col("b"))
          .groupBy(col("w"), col("exact_n"))
          .agg(min(col("n")).as("cms_est"))
          .select(col("w").as("word"), col("exact_n"), col("cms_est"))
    },

    // BPE MERGE-PAIR COUNTING — the inner loop of byte-pair-encoding
    // vocabulary induction: corpus-wide counts of ADJACENT SYMBOL
    // PAIRS inside words, each occurrence weighted by its word's
    // corpus frequency; the top pair is the next merge. The scale
    // trick every real tokenizer trainer uses is here: pair expansion
    // runs over the DISTINCT-WORD frame (one row per distinct word ×
    // its count — thousands of rows), not over the corpus's word
    // instances (billions) — the word-frequency aggregate does the
    // 10^6× reduction first, so the quadratic-looking substr transform
    // touches almost nothing. Subsequent merge iterations re-segment
    // the same distinct-word frame with the merged symbol and rerun
    // this aggregate. Output capped to the 50 strongest pairs with a
    // total (count desc, pair) order, all integers.
    sql("text_bpe_pairs",
      """WITH w AS (
        | SELECT word, COUNT(*) AS freq FROM (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        |  FROM documents) t
        | GROUP BY word),
        |p AS (
        | SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, freq
        | FROM (SELECT word, freq, unnest(range(1, length(word))) AS i
        |       FROM w WHERE length(word) >= 2))
        |SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
        |FROM p GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 50""".stripMargin) {
      (s, d) =>
        val words = Tables.documents(s, d)
          .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
            .as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("freq"))
          .filter(length(col("word")) >= 2)
        words
          .select(explode(expr(
            "transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))")).as("pair"),
            col("freq"))
          .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
          .orderBy(col("n").desc, col("pair")).limit(50)
    },

    // BPE ENCODE — the tokenizer step a 100 TB pipeline actually runs
    // (text_bpe_pairs above is the TRAINING inner loop; this applies a
    // LEARNED merge list, pinned as a fixture, to tokenize the corpus
    // and produce the per-document token counts packing/budgeting
    // needs). Greedy left-to-right BPE via bracketed-symbol string
    // rewriting: a word becomes `<h><e><l><l><o>`, and applying merge
    // (a,b) is literally replace('<a><b>' → '<ab>') — plain string
    // replace scans left-to-right non-overlapping, which IS the BPE
    // merge order, and the brackets make symbol boundaries
    // unambiguous (the pair pattern cannot match inside a longer
    // symbol). Both engines run the identical nested-replace
    // expression (built from one Scala merge list), so the oracle is
    // exact by construction. Scale shape: the encode (the expensive
    // per-word transform) runs over the DISTINCT-WORD frame only —
    // the same 10^6× reduction as training — then joins back to
    // per-(doc, word) counts; one broadcastable vocab join, one
    // shuffle on doc_id.
    sql("text_bpe_encode", {
      val enc0 = """regexp_replace(word, '(.)', '<\1>', 'g')"""
      val encoded = BpeMerges.foldLeft(enc0) { case (s, (a, b)) =>
        s"replace($s, '<$a><$b>', '<$a$b>')"
      }
      s"""WITH dw AS (
         | SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
         | FROM documents),
         |pw AS (SELECT doc_id, word, COUNT(*) AS n FROM dw GROUP BY doc_id, word),
         |v AS (SELECT word, len(string_split(trim($encoded, '<>'), '><')) AS tok
         |      FROM (SELECT DISTINCT word FROM pw))
         |SELECT doc_id, CAST(SUM(n * tok) AS BIGINT) AS n_tokens
         |FROM pw JOIN v USING (word)
         |GROUP BY doc_id""".stripMargin
    }) {
      (s, d) =>
        val perDocWord = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("word"))
          .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("n"))
        val enc = BpeMerges.foldLeft(
          regexp_replace(col("word"), lit("(.)"), lit("<$1>"))) { case (c, (a, b)) =>
          org.apache.spark.sql.functions.replace(c, lit(s"<$a><$b>"), lit(s"<$a$b>"))
        }
        val vocab = perDocWord.select("word").distinct()
          .select(col("word"), size(split(btrim(enc, lit("<>")), "><")).as("tok"))
        perDocWord.join(broadcast(vocab), Seq("word"))
          .groupBy(col("doc_id"))
          .agg(sum(col("n") * col("tok")).as("n_tokens"))
    },

    // BPE TRAINING — the actual vocabulary-induction LOOP, end to end
    // in relational algebra (text_bpe_pairs is one iteration's count;
    // this runs FOUR: count adjacent symbol pairs over the
    // distinct-word frame, take the argmax as the next merge, apply
    // it by bracketed-symbol replace, repeat — each learned merge a
    // DATA-dependent value both engines must derive identically).
    // Argmax ties break on (count DESC, left, right), so the learned
    // merge TABLE itself sits behind the value-hash gate. Scale shape
    // per iteration: one pair aggregate over distinct words (the
    // usual 10^6× reduction), one 1-row broadcast, one re-encode
    // projection — the loop is genuinely iterative (merge i+1 depends
    // on the corpus AFTER merge i) yet never leaves the engine.
    sql("text_bpe_train", {
      def pairsSql(src: String): String =
        s"""SELECT syms[CAST(i AS INTEGER)] AS a, syms[CAST(i + 1 AS INTEGER)] AS b,
           |  CAST(SUM(freq) AS BIGINT) AS n
           |FROM (SELECT syms, freq, unnest(range(1, len(syms))) AS i
           |      FROM (SELECT string_split(trim(e, '<>'), '><') AS syms, freq
           |            FROM $src) s0)
           |GROUP BY a, b""".stripMargin
      def stepSql(i: Int): String =
        s"""p$i AS (${pairsSql(s"e$i")}),
           |m$i AS (SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1),
           |e${i + 1} AS (SELECT replace(e, '<' || m$i.a || '><' || m$i.b || '>',
           |  '<' || m$i.a || m$i.b || '>') AS e, freq FROM e$i, m$i)""".stripMargin
      s"""WITH w AS (
         | SELECT word, COUNT(*) AS freq FROM (
         |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
         |  FROM documents) t
         | GROUP BY word),
         |e0 AS (SELECT regexp_replace(word, '(.)', '<\\1>', 'g') AS e, freq FROM w),
         |${(0 until 4).map(stepSql).mkString(",\n")}
         |${(0 until 4).map(i =>
            s"SELECT $i AS step, a AS left_sym, b AS right_sym, n FROM m$i")
            .mkString("\nUNION ALL\n")}""".stripMargin
    }) {
      (s, d) =>
        def pairs(e: DataFrame): DataFrame = e
          .select(split(btrim(col("e"), lit("<>")), "><").as("syms"), col("freq"))
          .select(posexplode(expr("slice(syms, 1, size(syms) - 1)")).as(Seq("i", "a")),
            col("syms"), col("freq"))
          .select(col("a"), expr("syms[i + 1]").as("b"), col("freq"))
          .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("n"))
        val e0 = Tables.documents(s, d)
          .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
            .as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("freq"))
          .select(regexp_replace(col("word"), lit("(.)"), lit("<$1>")).as("e"), col("freq"))
        val (_, merges) = (0 until 4).foldLeft((e0, Seq.empty[DataFrame])) {
          case ((e, acc), i) =>
            val m = pairs(e).orderBy(col("n").desc, col("a"), col("b")).limit(1)
            val next = e.crossJoin(broadcast(m))
              .select(org.apache.spark.sql.functions.replace(col("e"),
                concat(lit("<"), col("a"), lit("><"), col("b"), lit(">")),
                concat(lit("<"), col("a"), col("b"), lit(">"))).as("e"), col("freq"))
            (next, acc :+ m.select(lit(i).as("step"), col("a").as("left_sym"),
              col("b").as("right_sym"), col("n")))
        }
        merges.reduce(_ unionAll _)
    },

    // TOKENIZER FIT per source — the go/no-go stat a pipeline reads
    // before committing a tokenizer to a corpus slice: characters per
    // token (compression) and tokens per word (fertility) by source,
    // from the same pinned merge list as text_bpe_encode. All exact
    // integers plus one IEEE division each; the encode again runs
    // over the distinct-word frame only.
    sql("text_bpe_compression", {
      val enc0 = """regexp_replace(word, '(.)', '<\1>', 'g')"""
      val encoded = BpeMerges.foldLeft(enc0) { case (s, (a, b)) =>
        s"replace($s, '<$a><$b>', '<$a$b>')"
      }
      s"""WITH dw AS (
         | SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
         | FROM documents),
         |pw AS (SELECT source, word, COUNT(*) AS n FROM dw GROUP BY source, word),
         |v AS (SELECT word, length(word) AS chars,
         |       len(string_split(trim($encoded, '<>'), '><')) AS tok
         |      FROM (SELECT DISTINCT word FROM pw))
         |SELECT source,
         | CAST(SUM(n * chars) AS BIGINT) AS n_chars,
         | CAST(SUM(n * tok) AS BIGINT) AS n_tokens,
         | CAST(SUM(n) AS BIGINT) AS n_words,
         | CAST(SUM(n * chars) AS DOUBLE) / SUM(n * tok) AS chars_per_token,
         | CAST(SUM(n * tok) AS DOUBLE) / SUM(n) AS fertility
         |FROM pw JOIN v USING (word)
         |GROUP BY source""".stripMargin
    }) {
      (s, d) =>
        val perSourceWord = Tables.documents(s, d)
          .select(col("source"),
            explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("word"))
          .groupBy(col("source"), col("word")).agg(count(lit(1)).as("n"))
        val enc = BpeMerges.foldLeft(
          regexp_replace(col("word"), lit("(.)"), lit("<$1>"))) { case (c, (a, b)) =>
          org.apache.spark.sql.functions.replace(c, lit(s"<$a><$b>"), lit(s"<$a$b>"))
        }
        val vocab = perSourceWord.select("word").distinct()
          .select(col("word"), length(col("word")).cast("long").as("chars"),
            size(split(btrim(enc, lit("<>")), "><")).cast("long").as("tok"))
        perSourceWord.join(broadcast(vocab), Seq("word"))
          .groupBy(col("source"))
          .agg(sum(col("n") * col("chars")).as("n_chars"),
            sum(col("n") * col("tok")).as("n_tokens"),
            sum(col("n")).as("n_words"),
            (sum(col("n") * col("chars")).cast("double") /
              sum(col("n") * col("tok"))).as("chars_per_token"),
            (sum(col("n") * col("tok")).cast("double") /
              sum(col("n"))).as("fertility"))
    },

    // N-GRAM LM PERPLEXITY quality filter — the classic LLM data-quality
    // scorer: a bigram language model with add-1 smoothing trained ON
    // the corpus itself scores every document; documents the model
    // finds surprising (high perplexity = improbable word transitions)
    // are flagged. Determinism: per-term probability
    // p = (c12+1)/(c1+V) is converted to FIXED-POINT e6 by exact
    // half-up integer division q = (num·2e6 + den) div (2·den) — no
    // per-term transcendentals to drift cross-engine (the same
    // no-ln trade as the TF-IDF entry) — summed exactly per doc, and
    // the reported perplexity proxy n·1e6/Σq (the harmonic-mean
    // inverse probability, a monotone perplexity stand-in) is ONE
    // IEEE division of exact integers. The low_quality flag is an
    // exact integer cross-multiply (proxy > 29.5 ⟺ 2n·1e6 > 59·Σq).
    // Shape at scale: one scan → bigram explode; counts and the
    // prefix rollup are hash aggregates; scoring re-joins on the
    // bigram key (hash-partitioned, never all-pairs); V is a
    // distinct-word reduce collected as a literal (the DSIR pattern).
    // 100 TB note: the e6 intermediate (c12+1)·2e6 overflows BIGINT
    // only past ~4.6e12 occurrences of one bigram — lift to
    // DECIMAL(38,0) (decSum's trick) if a corpus ever gets there.
    sql("text_lm_perplexity",
      """WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |           FROM documents),
        |d2 AS (SELECT doc_id, t FROM d WHERE len(t) >= 2),
        |bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |       FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM d2)),
        |bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
        |pc AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1),
        |vv AS (SELECT COUNT(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM d2)),
        |terms AS (SELECT doc_id,
        |   ((c12 + 1) * 2000000 + (c1 + v)) // (2 * (c1 + v)) AS q
        |  FROM bg JOIN bc USING (w1, w2) JOIN pc USING (w1), vv),
        |doc AS (SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(q) AS BIGINT) AS sum_p_e6
        |        FROM terms GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, sum_p_e6,
        | CAST(n_bigrams * 1000000 AS DOUBLE) / NULLIF(sum_p_e6, 0) AS ppl_proxy,
        | 2 * n_bigrams * 1000000 > 59 * sum_p_e6 AS low_quality
        |FROM doc""".stripMargin) {
      (s, d) => lmPerplexity(s, d)
    },

    // QUANTILE-DERIVED LM GATE — the threshold the fixed constant above
    // stands in for, derived FROM the corpus: flag the worst decile by
    // perplexity proxy (rank·10 ≤ n — the corpus tells you where "bad"
    // starts, no magic number survives a domain shift). Rank is the
    // scale-safe [[DistributedRank.withGlobalRank]] (range repartition
    // + per-partition row_number + broadcast offsets), never a
    // single-partition window; the order key is ONE IEEE division of
    // exact integers (bit-identical cross-engine) with doc_id
    // tie-break, so the decile boundary is deterministic.
    sql("text_lm_quantile_gate",
      """WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |           FROM documents),
        |d2 AS (SELECT doc_id, t FROM d WHERE len(t) >= 2),
        |bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |       FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM d2)),
        |bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
        |pc AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1),
        |vv AS (SELECT COUNT(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM d2)),
        |terms AS (SELECT doc_id,
        |   ((c12 + 1) * 2000000 + (c1 + v)) // (2 * (c1 + v)) AS q
        |  FROM bg JOIN bc USING (w1, w2) JOIN pc USING (w1), vv),
        |doc AS (SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(q) AS BIGINT) AS sum_p_e6
        |        FROM terms GROUP BY doc_id),
        |scored AS (SELECT doc_id,
        |   CAST(n_bigrams * 1000000 AS DOUBLE) / NULLIF(sum_p_e6, 0) AS ppl_proxy
        |  FROM doc)
        |SELECT doc_id, ppl_proxy,
        | CAST(ROW_NUMBER() OVER (ORDER BY ppl_proxy DESC, doc_id) AS BIGINT) AS ppl_rank,
        | ROW_NUMBER() OVER (ORDER BY ppl_proxy DESC, doc_id) * 10
        |   <= (SELECT COUNT(*) FROM scored) AS low_quality
        |FROM scored""".stripMargin) {
      (s, d) =>
        val scored = lmPerplexity(s, d)
          .select(col("doc_id"), col("ppl_proxy"))
        val (ranked, n) = DistributedRank.withGlobalRank(scored, "ppl_rank",
          col("ppl_proxy").desc, col("doc_id"))
        ranked.select(col("doc_id"), col("ppl_proxy"), col("ppl_rank"),
          (col("ppl_rank") * 10 <= n).as("low_quality"))
    })

  /** The bigram-LM scorer behind `text_lm_perplexity`, with the quality
    * gate PARAMETERIZED: `thresholdE1` is the proxy threshold ×10 as an
    * exact integer (default 295 = 29.5, the gated entry's oracle
    * constant), so the flag stays an exact integer cross-multiply —
    * proxy > thr/10 ⟺ 10·n·1e6 > thr·Σq — with no per-row floating
    * comparison to drift cross-engine. Callers tuning a real corpus
    * pass their own threshold (or derive one from a quantile of
    * ppl_proxy) without touching the scoring plan. */
  def lmPerplexity(s: org.apache.spark.sql.SparkSession, d: String,
                   thresholdE1: Long = 295L): org.apache.spark.sql.DataFrame = {
    require(thresholdE1 > 0, s"thresholdE1 must be positive, got $thresholdE1")
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 2)
    // ONE tokenize+explode pass: the bigram rows feed the model counts
    // (bc/pc), the vocab-size action AND the scoring probe — lazily
    // composed, the regex tokenizer ran three times per call (the v
    // count was its own action, and the probe side re-derived the
    // explode). Narrow (doc_id, w1, w2) string rows checkpoint cheaply
    // — the same exploded-rows-not-array-cells discipline as the
    // minhash shingle pipeline.
    val bg = docs
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
      .select(col("doc_id"),
        element_at(col("t"), col("i")).as("w1"),
        element_at(col("t"), col("i") + 1).as("w2"))
      .localCheckpoint()
    val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint() // feeds pc, the scoring join AND the v action
    val pc = bc.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    // vocab size: distinct-word reduce to ONE value, embedded as a
    // literal (no one-row cross join enters the plan). Every word of a
    // ≥2-token doc occurs in some bigram of that doc (as w1 if not
    // last, as w2 if not first), so the distinct-(w1,w2) frame covers
    // exactly the docs' vocabulary — counting it off the aggregated bc
    // rows skips a full re-tokenization of the corpus.
    val v = bc.select(col("w1").as("w")).unionAll(bc.select(col("w2")))
      .agg(countDistinct(col("w"))).collect()(0).getLong(0)
    bg.join(bc, Seq("w1", "w2")).join(pc, Seq("w1"))
      .select(col("doc_id"),
        expr(s"((c12 + 1) * 2000000 + (c1 + $v)) div (2 * (c1 + $v))").as("q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("sum_p_e6"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_p_e6"),
        ((col("n_bigrams") * 1000000L).cast("double") /
          nullif(col("sum_p_e6"), lit(0L))).as("ppl_proxy"),
        (lit(10L) * col("n_bigrams") * 1000000L >
          lit(thresholdE1) * col("sum_p_e6")).as("low_quality"))
  }
}
