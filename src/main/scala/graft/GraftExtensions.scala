package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The library's `SparkSessionExtensions` entry point:
  * `--conf spark.sql.extensions=graft.GraftExtensions` makes every
  * native expression ([[graft.functions.GraftFunctions.all]])
  * available to SQL text in the session, and arms the banded
  * range-join optimizer rule ([[graft.plans.BandedRangeJoin]] —
  * inert until its bin-width conf is set). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.inject(ext)
    ext.injectOptimizerRule(_ => graft.plans.BandedRangeJoin)
    ext.injectOptimizerRule(_ => graft.plans.MaterializedViewRewrite)
    // the grouped top-k physical operator (rule + strategy, inert
    // until spark.graft.topk.rewrite=true)
    ext.injectOptimizerRule(_ => graft.plans.GroupedTopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
  }
}
