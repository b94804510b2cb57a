package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every engine capability is registered as a [[GraftQuery]] in one of
  * the module objects below; this object just concatenates them. The
  * driver runs each `queries(name)(spark, sfDir)` and compares against
  * `oracleSql(name)` executed by DuckDB over the same parquet tables.
  */
object SparkEntry {

  /** All registered capabilities, in module order. */
  def all: Seq[GraftQuery] =
    operators.Relational.defs ++
    operators.BloomJoin.defs ++
    operators.TimeSeries.defs ++
    operators.TextAnalysis.defs ++
    operators.Curation.defs ++
    operators.Dedup.defs ++
    operators.SimilaritySearch.defs ++
    operators.Multimodal.defs ++
    operators.MergeOps.defs ++
    operators.MatViews.defs ++
    operators.SkewJoin.defs ++
    operators.GraphOps.defs ++
    operators.Profiling.defs ++
    sources.Formats.defs ++
    sources.Bucketing.defs ++
    sources.Partitioning.defs ++
    sources.SnapshotLog.defs ++
    sources.ZOrder.defs ++
    streaming.IncrementalQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q10(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val names = all.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty,
      s"duplicate GraftQuery registrations (a Map would silently keep the last): ${dups.mkString(", ")}")
    all.map(q => q.name -> q.fn).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline subset used by Bench (fast feedback; representative of
    * scan, join-tree, agg, window, and the extension surfaces). */
  def benchNames: Seq[String] = {
    val preferred = Seq(
      "q10_flagship", "join_tree_full", "agg_sum_groupby", "window_rank",
      "topk_orderby_limit", "dedup_exact", "dedup_minhash_pairs",
      "ann_bruteforce_topk", "text_quality_score", "incremental_q10",
      // round 3: the branching (multi-parent) incremental tree
      "incremental_part_revenue",
      // round 4: the shared-dimension (many-to-many pair) tree
      "incremental_shared_dim",
      // round 5: winnowing fingerprints on the rolling k-gram kernel;
      // the KMV sketch aggregate; the auto-banded theta join
      "text_winnowing", "agg_kmv_distinct", "events_range_join_auto",
      // round 6: the incremental ROLLUP (every grouping set maintained)
      // and the retention-cohort matrix
      "incremental_sql_rollup", "events_retention_cohorts",
      // round 7: the bloom-reduced incremental tree (vs incremental_q10
      // above — the delta IS the reduction), the windowed resample,
      // BM25 ranked retrieval, and the MERGE upsert rewrite
      "incremental_q10_bloom", "events_resample_window_agg",
      "text_bm25_topk", "merge_upsert_orders",
      // round 8: the two-nation flagship, the triangle enumeration
      // (the heaviest self-join shape on the board), and the MV
      // rewrite (its cost IS build + rewritten read — the honest
      // price of the summary path)
      "q7_like_volume_shipping", "graph_triangle_count", "mv_rewrite_revenue",
      // round 8 late additions: the double-correlated EXISTS/NOT-EXISTS
      // blame query (semi+anti over the same fact), the two-level
      // market-share ratio, strict-contiguity CEP via two LEADs, and
      // the BPE pair count (distinct-word reduce THEN pair expand)
      "q21_like_waiting_supplier", "q8_like_market_share",
      "events_pattern_match", "text_bpe_pairs",
      // the custom physical operator (partial-heap -> exchange ->
      // final-rank; the snapshot pins its zero-sort plan)
      "window_topk_rewrite",
      // round 9: the ties-aware rank() spelling through the same
      // operator, the FULL OUTER maintained view under ancestor
      // deletes (the tree-prefix orphan plan's cost is the entry),
      // and the iterative-peel k-core (checkpointed fixpoint loop)
      "window_rank_topk", "incremental_sql_q10_fullouter_ancestor_del",
      "graph_kcore",
      // round 10: the dense_rank mode of the custom top-k operator
      // (class-bounded keep-set) and the BPE tokenizer APPLY step
      // (distinct-word encode + broadcast vocab join) — the
      // fullouter-fusion win is already priced by the ancestor_del
      // headliner above
      "window_dense_topk", "text_bpe_encode",
      // round 10, session 2: the fixed-round LPA community loop (the
      // join-per-round Pregel shape, checkpoint-truncated) and the
      // windowed maintained view (the decoration must stay
      // group-cardinality work on top of the incremental fold)
      "graph_label_propagation", "incremental_sql_window_rank",
      // round 11: the nested double-FULL-OUTER maintained view (the
      // six-class preservation matrix — its cost IS the three extra
      // plans) and the corpus-trained bigram LM scorer (bigram-keyed
      // scoring join over one scan)
      "incremental_sql_q10_fullouter_two_boundary", "text_lm_perplexity",
      // round 12: the star double FULL OUTER maintained view (the
      // per-boundary-product factorization — its cost IS the pair
      // tree plus five gated plans in one entry)
      "incremental_sql_q10_fullouter_star",
      // round 13: bounded WITH RECURSIVE — the checkpointed BFS
      // fixpoint over the 2.4M-edge co-purchase graph (per-round
      // frontier join + distinct + lineage truncation priced
      // end-to-end; the pair-star entry stays OFF this list — its
      // cost is the quadratic pair product, gated at sf0.01)
      "incremental_sql_recursive_paths")
    val have = queries.keySet
    preferred.filter(have)
  }
}
