package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: pairs of same-key rows with
  * `right.ts ∈ (left.ts, left.ts + window]` — "purchases within 6
  * hours after a click". Spark plans a raw inequality join as
  * BroadcastNestedLoop/cartesian-per-key — O(|L|·|R|) comparisons. The
  * scalable formulation BANDS time into window-sized bins:
  *
  *  - right rows carry their bin `floor(ts / W)`;
  *  - each left row's window `(ts, ts+W]` can only touch bins
  *    `floor(ts/W)` and `floor(ts/W)+1`, so the left side explodes to
  *    exactly those two (key, bin) probes;
  *  - an ordinary hash equi-join on (key, bin) + the exact interval
  *    filter gives the result. Each true pair matches in exactly one
  *    bin (the right row has one bin), so no dedup is needed.
  *
  * Cost: one 2× fan-out of the left side and one hash shuffle — vs the
  * per-key cross product of the naive theta join.
  */
object RangeJoin {

  /** @param windowSec right.ts must lie in (left.ts, left.ts + windowSec]
    * @param rightPrefix prefix for right's non-key output columns */
  def withinAfter(left: DataFrame, right: DataFrame, keyCols: Seq[String], ts: String,
                  windowSec: Long, rightPrefix: String = "r_"): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val w = windowSec * 1000000L // microseconds
    val rValCols = right.columns.filterNot(keyCols.contains).toSeq

    // scratch names no input actually uses (same pattern as SkewJoin)
    val taken = (left.columns ++ right.columns).toSet
    def fresh(base: String): String =
      LazyList.from(0).map(i => s"$base$i").find(!taken.contains(_)).get
    val binCol = fresh("_graft_bin")
    val rCol = fresh("_graft_r")

    val lBin = floor(unix_micros(col(ts)) / w).cast("long")
    val lExploded = left
      .withColumn(binCol, explode(array(lBin, lBin + 1)))
    val rBinned = right
      .select((keyCols.map(col) :+ floor(unix_micros(col(ts)) / w).cast("long").as(binCol) :+
        struct(rValCols.map(col): _*).as(rCol)): _*)

    lExploded
      .join(rBinned, keyCols :+ binCol)
      .filter(unix_micros(col(s"$rCol.$ts")) > unix_micros(col(ts)) &&
        unix_micros(col(s"$rCol.$ts")) <= unix_micros(col(ts)) + w)
      .select(left.columns.map(col).toSeq ++
        rValCols.map(c => col(s"$rCol.$c").as(s"$rightPrefix$c")): _*)
  }
}
