package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst optimizer rule: rewrite an INEQUALITY-ONLY inner join into
  * a banded equi-join.
  *
  * Spark plans an inner join whose condition has no equality conjunct
  * as BroadcastNestedLoopJoin (or a cartesian product) — O(|L|·|R|)
  * comparisons, the plan that dies first at scale. But the most common
  * such condition in analytics is a RANGE BAND — `r.ts > l.ts AND
  * r.ts <= l.ts + W` ("events within a window"), `x BETWEEN lo AND hi`
  * — and a banded join handles it with one hash shuffle
  * ([[graft.operators.RangeJoin]] is the manual form; this rule is the
  * optimizer form, so a user writing the naive theta join gets the
  * scalable plan automatically):
  *
  *  - the bounded side (`x`) carries its bin `floor(x / W)`;
  *  - the bounding side explodes to the bin range
  *    `sequence(floor(lo/W), floor(hi/W))` — each interval covers
  *    `(hi-lo)/W + 1` bins, so size W to the typical interval width;
  *  - an ordinary equi-join on the bin plus the ORIGINAL condition as
  *    a residual filter is exactly the theta join: `x`'s single bin
  *    lies in the covered range whenever `lo <= x <= hi` (IEEE
  *    division and floor are weakly monotone, so a true pair can never
  *    fall outside its bin window), and each true pair matches in
  *    exactly one bin (the x row has one bin; the sequence's bins are
  *    distinct), so no dedup is needed.
  *
  * Scope (everything else is left untouched):
  *  - inner joins with a condition and NO cross-side equality conjunct
  *    (with one, Spark already hash-joins; the rewritten join gains a
  *    bin-equality conjunct, which also makes the rule convergent
  *    under the optimizer's fixed-point batch);
  *  - some cross-side comparison pair bounds the same expression `x`
  *    from below and above; `x` is numeric or timestamp;
  *  - the bin width conf [[BandedRangeJoin.BinConf]] is set and
  *    positive (in `x`'s units; SECONDS for timestamps). Unset = rule
  *    off — opt-in, like AQE's advisory sizes.
  *
  * Null semantics are preserved: a null `x` yields a null bin (equi-
  * join drops it, as the null comparison would); a null bound yields a
  * null sequence (`Explode` emits nothing — inner join would drop the
  * row anyway).
  *
  * DOMAIN: a row's interval may span at most [[MaxBinsConf]] bins — a
  * wider (or ±Infinity) interval FAILS LOUDLY at runtime (assert_true
  * naming the knobs) rather than clamping: a clamp would silently
  * drop matches past the cap, and an unguarded ±Infinity bound would
  * saturate `Floor` to Long.MaxValue and make `Sequence` build a
  * giant per-row array. NaN bounds null out silently (the theta
  * join's NaN comparison matches nothing — exact). Every pair the
  * rewrite emits is correct (the original condition rides along as a
  * residual filter). Size W so real intervals span few bins; raise
  * maxBins if legitimate intervals exceed it, or unset [[BinConf]] to
  * keep the un-rewritten theta join.
  */
object BandedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** Bin width: units of the banded expression (seconds when it is a
    * timestamp). Unset or <= 0 disables the rule. */
  val BinConf = "spark.graft.rangeJoin.bin"

  /** Max bins one interval may cover (cap on the per-row explode and
    * on how far above `lo` a match can sit — see the DOMAIN note). */
  val MaxBinsConf = "spark.graft.rangeJoin.maxBins"
  val DefaultMaxBins = 1 << 16

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = SQLConf.get.getConfString(BinConf, "").trim match {
      case "" => return plan
      case s =>
        try s.toDouble catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(s"$BinConf must be numeric, got '$s'")
        }
    }
    if (w <= 0 || w.isNaN || w.isInfinite) return plan
    val maxBins = SQLConf.get.getConfString(MaxBinsConf, DefaultMaxBins.toString).toLong
    require(maxBins > 0, s"$MaxBinsConf must be positive, got $maxBins")
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) => rewrite(j, w, maxBins).getOrElse(j)
    }
  }

  /** Some(true) iff `e` references only `l`'s output, Some(false) iff
    * only `r`'s; None for literals (no side) or mixed references. */
  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  private def supported(e: Expression): Boolean = e.dataType match {
    case TimestampType => true
    case _: NumericType => true
    case _ => false
  }

  /** The expression's value on the binning axis: epoch micros for
    * timestamps, double for numerics. */
  private def axis(e: Expression): Expression = e.dataType match {
    case TimestampType => Cast(UnixMicros(e), DoubleType)
    case _ => Cast(e, DoubleType)
  }

  /** Bin width on the axis: seconds → micros for timestamps. */
  private def axisWidth(e: Expression, w: Double): Double = e.dataType match {
    case TimestampType => w * 1000000.0
    case _ => w
  }

  /** The x side's single bin. `Floor` over a double already yields a
    * LONG (NaN → 0, ±Infinity saturates) — never an error; a wrong
    * bin for a non-finite x at worst misses matches the residual
    * would have rejected anyway (NaN compares false). */
  private def bin(e: Expression, w: Double): Expression =
    Floor(Divide(axis(e), Literal(axisWidth(e, w), DoubleType)))

  /** The BOUND bins feed `Sequence`, so unlike the x bin they must be
    * guarded: `Floor` saturates ±Infinity to Long.MaxValue/MinValue
    * and maps NaN to 0, so an unguarded non-finite (or merely huge)
    * bound would span up to Long.MaxValue bins — a too-long-array
    * error or a giant per-row array, a crash regression versus the
    * theta join. Built in DOUBLE arithmetic (saturating, no ANSI
    * overflow): NaN → null bin (Explode emits nothing — theta-exact,
    * since NaN compares false in the original predicate), and a span
    * wider than maxBins bins FAILS LOUDLY (AssertTrue) instead of
    * clamping — a clamp would silently drop matches past the cap,
    * breaking the engine's never-a-silent-wrong-plan contract; the
    * error names the knobs (raise maxBins / widen the bin / disable
    * the rewrite). ±Infinity bounds hit the same assert: the rewrite
    * cannot express an unbounded interval, and the un-rewritten theta
    * join is one conf away. */
  private def boundBins(lo: Expression, hi: Expression, w: Double,
                        maxBins: Long): (Expression, Expression) = {
    val dLo = Divide(axis(lo), Literal(axisWidth(lo, w), DoubleType))
    val dHi = Divide(axis(hi), Literal(axisWidth(hi, w), DoubleType))
    val nullBin = Literal.create(null, LongType)
    val binLo = If(IsNaN(dLo), nullBin, Floor(dLo))
    val spanOk = LessThanOrEqual(Subtract(dHi, dLo), Literal(maxBins.toDouble, DoubleType))
    val guard = new org.apache.spark.sql.catalyst.expressions.AssertTrue(
      spanOk, Literal(UTF8String.fromString(
        s"banded range join: an interval spans more than $maxBins bins — raise " +
          s"$MaxBinsConf, widen $BinConf, or unset $BinConf to keep the " +
          "un-rewritten theta join"), StringType)).replacement
    // NaN on EITHER side nulls the hi bin (row emits nothing); finite
    // spans must pass the loud guard before Floor
    val binHi = If(Or(IsNaN(dHi), IsNaN(dLo)), nullBin,
      If(IsNull(guard), Floor(dHi), nullBin))
    (binLo, binHi)
  }

  private final case class Band(x: Expression, xOnLeft: Boolean,
                                lo: Expression, hi: Expression)

  private def findBand(j: Join): Option[Band] = {
    val conjs = splitConjunctivePredicates(j.condition.get)
    def cross(a: Expression, b: Expression): Option[Boolean] =
      (sideOf(a, j.left, j.right), sideOf(b, j.left, j.right)) match {
        case (Some(sa), Some(sb)) if sa != sb => Some(sa)
        case _ => None
      }
    val hasEqui = conjs.exists {
      case EqualTo(a, b) => cross(a, b).isDefined
      case _ => false
    }
    if (hasEqui) return None
    // each cross-side comparison bounds its two operands symmetrically:
    // a >= b lower-bounds x=a by b AND upper-bounds x=b by a
    final case class Bound(x: Expression, xOnLeft: Boolean,
                           bound: Expression, lower: Boolean)
    val bounds = conjs.flatMap {
      case cmp @ (_: GreaterThan | _: GreaterThanOrEqual) =>
        val c = cmp.asInstanceOf[BinaryComparison]
        cross(c.left, c.right).toSeq.flatMap { leftOnLeft =>
          Seq(Bound(c.left, leftOnLeft, c.right, lower = true),
            Bound(c.right, !leftOnLeft, c.left, lower = false))
        }
      case cmp @ (_: LessThan | _: LessThanOrEqual) =>
        val c = cmp.asInstanceOf[BinaryComparison]
        cross(c.left, c.right).toSeq.flatMap { leftOnLeft =>
          Seq(Bound(c.left, leftOnLeft, c.right, lower = false),
            Bound(c.right, !leftOnLeft, c.left, lower = true))
        }
      case _ => Nil
    }
    bounds.groupBy(b => (b.x.canonicalized, b.xOnLeft)).values.toSeq
      .sortBy(_.head.x.toString) // deterministic pick across runs
      .collectFirst {
        case bs if bs.exists(_.lower) && bs.exists(!_.lower) && supported(bs.head.x) =>
          Band(bs.head.x, bs.head.xOnLeft,
            bs.find(_.lower).get.bound, bs.find(!_.lower).get.bound)
      }
  }

  private def rewrite(j: Join, w: Double, maxBins: Long): Option[LogicalPlan] =
    findBand(j).map { band =>
      // x side: project the single bin alongside the original columns
      val xSide = if (band.xOnLeft) j.left else j.right
      val bSide = if (band.xOnLeft) j.right else j.left
      val xBin = Alias(bin(band.x, w), "__graft_band_bin")()
      val xProj = Project(xSide.output :+ xBin, xSide)
      // bounding side: explode the interval's covered bin range
      val probe = AttributeReference("__graft_band_probe", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // stays unresolved and the optimizer rejects the rewritten plan
      // (the bins themselves are plain longs; the zone is never used)
      val (binLo, binHi) = boundBins(band.lo, band.hi, w, maxBins)
      val seq = Sequence(binLo, binHi, Some(Literal(1L, LongType)),
        Some(SQLConf.get.sessionLocalTimeZone))
      // INVERTED bounds (lo > hi on some row — legal data; the theta
      // join just emits nothing for it) must yield an empty probe set,
      // not Sequence's 'illegal boundaries' error: a null sequence
      // makes the non-outer Explode emit zero rows for exactly that row
      val guarded = If(LessThanOrEqual(binLo, binHi), seq,
        Literal.create(null, seq.dataType))
      val gen = Generate(Explode(guarded), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(probe), child = bSide)
      val newCond = And(EqualTo(xBin.toAttribute, probe), j.condition.get)
      val (newL, newR) = if (band.xOnLeft) (xProj, gen) else (gen, xProj)
      Project(j.output, Join(newL, newR, Inner, Some(newCond), j.hint))
    }

  /** Idempotently hook this rule into a session's experimental
    * optimizations (the extension-free path for an EXISTING session;
    * new sessions get it via `graft.GraftExtensions`). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(BandedRangeJoin))
      spark.experimental.extraOptimizations = cur :+ BandedRangeJoin
  }
}
