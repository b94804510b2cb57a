package graft.plans

import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf

/** Catalyst optimizer rule: answer an aggregate over a RAW fact table
  * from a registered MATERIALIZED VIEW (pre-aggregated partials) when
  * the query is subsumed by the view — the classic MV-rewrite that
  * turns a 100 TB fact scan into a scan of the (dims-cardinality)
  * summary, with NO change to the query text. The engine-level
  * capability every warehouse ships (Oracle QUERY REWRITE, BigQuery
  * materialized views, Calcite's SubstitutionVisitor); here it is the
  * optimizer-rule twin of the repo's sketch-rollup surface: partial
  * aggregates persisted as data, re-aggregated instead of re-derived.
  *
  * A view is registered per session conf (inert when [[ViewsConf]] is
  * unset — the BandedRangeJoin opt-in pattern):
  *
  *   spark.graft.mv.views                = v1[,v2,...]
  *   spark.graft.mv.<v>.source          = path of the raw fact parquet
  *   spark.graft.mv.<v>.path            = path of the MV parquet
  *   spark.graft.mv.<v>.dims            = comma-separated dim columns
  *   spark.graft.mv.<v>.agg.<mvCol>     = sum|<measure sql>
  *                                      | min|<measure sql>
  *                                      | max|<measure sql>
  *                                      | count|*
  *
  * The MV parquet must hold `dims ++ agg columns`, each agg column the
  * per-dims-group partial of its registered function over its measure
  * expression (built once by any aggregate job; see the gated entry).
  *
  * REWRITE SCOPE — `Aggregate → [Filter|attr-only Project]* → scan of
  * <source>` rewrites when:
  *  - every grouping expression is a plain column ⊆ dims;
  *  - every filter references only dims (a dims-filter selects whole
  *    MV groups, so it commutes with the pre-aggregation; a measure
  *    filter does NOT and blocks the rewrite);
  *  - every output is a grouping column or an un-DISTINCT, un-FILTERed
  *    SUM/MIN/MAX whose child is semantically equal
  *    (`Expression.semanticEquals` after resolving the registered
  *    measure sql against the scan) to a registered measure, or
  *    COUNT(<literal>) with a registered count column.
  * Mapping: SUM→SUM of partial sums, MIN→MIN of partial mins, MAX→MAX
  * of partial maxes, COUNT(*)→coalesce(SUM(cnt),0) — each exact
  * because the outer fold re-associates an associative integer/order
  * statistic. (SUM over floating measures re-associates rounding; the
  * repo's convention of integer-scaled money makes even SUM exact.)
  * Output attribute ids are preserved via aliases, so parent plans and
  * column lineage are untouched. Anything outside the scope leaves the
  * plan alone — correctness first, the raw scan is always a valid
  * answer.
  *
  * STALENESS is the caller's contract, as in every warehouse: the MV
  * answers queries as of its build; rebuild or MERGE-refresh it on
  * fact-table change (the repo's merge_upsert_orders is the refresh
  * primitive).
  */
object MaterializedViewRewrite extends Rule[LogicalPlan] {

  /** Comma-separated registered view names; unset/empty = rule off. */
  val ViewsConf = "spark.graft.mv.views"

  private case class AggDef(mvCol: String, fn: String, measureSql: String)
  private case class MvDef(name: String, source: String, path: String,
                           dims: Set[String], aggs: Seq[AggDef])

  /** (source path, measure sql) → analyzed measure expression with
    * attribute NAMES (rebased by name onto each scan at match time).
    * Cached because resolution reads the source schema. */
  private val measureCache = TrieMap.empty[(String, String), Option[Expression]]

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val views = registeredViews()
    if (views.isEmpty) return plan
    plan.transformDown {
      case agg: Aggregate =>
        tryRewrite(agg, views).getOrElse(agg)
    }
  }

  private def registeredViews(): Seq[MvDef] = {
    val conf = SQLConf.get
    val names = conf.getConfString(ViewsConf, "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    names.flatMap { n =>
      val pfx = s"spark.graft.mv.$n"
      try {
        val source = conf.getConfString(s"$pfx.source")
        val path = conf.getConfString(s"$pfx.path")
        val dims = conf.getConfString(s"$pfx.dims")
          .split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet
        val aggs = conf.getAllConfs.toSeq.collect {
          case (k, v) if k.startsWith(s"$pfx.agg.") =>
            val Array(fn, measure) = v.split("\\|", 2)
            AggDef(k.stripPrefix(s"$pfx.agg."), fn.trim.toLowerCase, measure.trim)
        }
        if (aggs.isEmpty) None else Some(MvDef(n, source, path, dims, aggs))
      } catch { case NonFatal(_) => None }
    }
  }

  private def normPath(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  private def scanPath(lr: LogicalRelation): Option[String] = lr.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.headOption.map(p => normPath(p.toUri.getPath))
    case _ => None
  }

  /** Unwrap Filter / attribute-only Project down to the fact scan. */
  private def unwrap(p: LogicalPlan,
                     filters: scala.collection.mutable.ArrayBuffer[Expression])
      : Option[LogicalRelation] = p match {
    case Filter(c, ch) => filters += c; unwrap(ch, filters)
    case Project(ps, ch) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(ch, filters)
    case lr: LogicalRelation => Some(lr)
    case _ => None
  }

  /** Match-time normalizer: by the time this rule runs, the USER plan
    * has been constant-folded (`cast(1.0 as double)` → `1.0`) and
    * no-op-cast-stripped by the standard batches, while the conf
    * template is analyzed-but-not-optimized — apply the same two
    * normalizations to BOTH sides before `semanticEquals`. */
  private def normalize(e: Expression): Expression = e.transformUp {
    case f if f.foldable && !f.isInstanceOf[Literal] =>
      try Literal.create(f.eval(null), f.dataType)
      catch { case NonFatal(_) => f }
    case c: org.apache.spark.sql.catalyst.expressions.Cast
        if c.child.dataType == c.dataType => c.child
  }

  /** Resolve a registered measure's SQL against the fact scan: analyze
    * it once over a fresh read of the source (full analysis inserts
    * the same implicit casts the user query got), then rebase its
    * attribute references onto `scanOut` by name. */
  private def resolvedMeasure(source: String, sql: String,
                              scanOut: Seq[AttributeReference]): Option[Expression] = {
    val template = measureCache.getOrElseUpdate((source, sql), {
      try {
        val df = SparkSession.active.read.parquet(source)
          .selectExpr(s"$sql AS __graft_measure")
        df.queryExecution.analyzed match {
          case Project(Seq(Alias(child, _)), _) => Some(child)
          case _ => None
        }
      } catch { case NonFatal(_) => None }
    })
    template.flatMap { t =>
      val byName = scanOut.map(a => a.name.toLowerCase -> a).toMap
      var ok = true
      val rebased = t.transformUp {
        case a: AttributeReference =>
          byName.get(a.name.toLowerCase) match {
            case Some(attr) => attr
            case None => ok = false; a
          }
      }
      if (ok) Some(rebased) else None
    }
  }

  private def tryRewrite(agg: Aggregate, views: Seq[MvDef]): Option[LogicalPlan] = {
    val filters = scala.collection.mutable.ArrayBuffer.empty[Expression]
    val lr = unwrap(agg.child, filters).getOrElse(return None)
    val path = scanPath(lr).getOrElse(return None)
    val mv = views.find(v => normPath(v.source) == path).getOrElse(return None)

    // grouping: plain columns, all dims
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if mv.dims(a.name.toLowerCase) => a
      case _ => return None
    }
    // filters: dims-only (they select whole MV groups)
    if (filters.exists(_.references.exists(a => !mv.dims(a.name.toLowerCase))))
      return None

    // the MV relation (fresh exprIds — no conflicts with the plan)
    val mvPlan =
      try SparkSession.active.read.parquet(mv.path).queryExecution.analyzed
      catch { case NonFatal(_) => return None }
    val mvOut = mvPlan.output.map(a => a.name.toLowerCase -> a).toMap
    if (!mv.dims.forall(mvOut.contains)) return None

    val scanOut = lr.output.collect { case a: AttributeReference => a }

    def mvAggFor(fn: String, child: Expression): Option[org.apache.spark.sql.catalyst.expressions.Attribute] =
      mv.aggs.collectFirst {
        case AggDef(col, f, measure) if f == fn &&
            mvOut.contains(col.toLowerCase) &&
            resolvedMeasure(mv.source, measure, scanOut)
              .exists(m => normalize(m).semanticEquals(normalize(child))) =>
          mvOut(col.toLowerCase)
      }
    def mvCountCol: Option[org.apache.spark.sql.catalyst.expressions.Attribute] =
      mv.aggs.collectFirst {
        case AggDef(col, "count", _) if mvOut.contains(col.toLowerCase) =>
          mvOut(col.toLowerCase)
      }
    def reAgg(f: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction) =
      AggregateExpression(f, Complete, isDistinct = false)

    val newOutputs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if mv.dims(a.name.toLowerCase) =>
        Alias(mvOut(a.name.toLowerCase), a.name)(exprId = a.exprId)
      case al @ Alias(ae: AggregateExpression, name)
          if !ae.isDistinct && ae.filter.isEmpty =>
        val mapped: Expression = ae.aggregateFunction match {
          case s: Sum =>
            reAgg(Sum(mvAggFor("sum", s.child).getOrElse(return None)))
          case m: Min =>
            reAgg(Min(mvAggFor("min", m.child).getOrElse(return None)))
          case m: Max =>
            reAgg(Max(mvAggFor("max", m.child).getOrElse(return None)))
          case c: Count if c.children.forall(_.isInstanceOf[Literal]) =>
            val cnt = mvCountCol.getOrElse(return None)
            Coalesce(Seq(reAgg(Sum(cnt)), Literal(0L)))
          case _ => return None
        }
        Alias(mapped, name)(exprId = al.exprId)
      case _ => return None
    }

    val mvByName = mvOut
    val newFilters = filters.map(_.transformUp {
      case a: AttributeReference => mvByName(a.name.toLowerCase)
    })
    val newChild = newFilters.foldRight(mvPlan: LogicalPlan)(Filter(_, _))
    val newGrouping = groupAttrs.map(a => mvByName(a.name.toLowerCase))
    Some(Aggregate(newGrouping, newOutputs, newChild))
  }

  /** Idempotently hook this rule into an existing session (new
    * sessions get it via `graft.GraftExtensions`). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(MaterializedViewRewrite))
      spark.experimental.extraOptimizations = cur :+ MaterializedViewRewrite
  }
}
