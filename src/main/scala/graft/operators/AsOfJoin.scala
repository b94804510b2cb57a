package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) left join: for each left row, the LATEST right row
  * of the same key with `right.ts <= left.ts` — DuckDB's
  * `ASOF LEFT JOIN`, kdb's `aj`. Spark has no native operator; the
  * scalable formulation is union + running `last(..., ignoreNulls)`
  * over ONE (key, ts) window:
  *
  *  - a per-left-row range join (`r.ts <= l.ts` theta join) explodes to
  *    O(|L|·|R|) per key before taking the max — a non-starter;
  *  - the union-window form is one hash shuffle on the key and one
  *    sort — the same cost as a regular join, independent of how many
  *    right rows precede each left row.
  *
  * Right rows sort BEFORE left rows at equal `ts` (side 0 < 1), giving
  * the inclusive `<=` match. Rows with no preceding right row keep
  * NULL right columns (left-join semantics). The right side must be
  * unique per (key, ts) for deterministic output — pre-aggregate it if
  * not (the registered query dedups with max).
  */
object AsOfJoin {

  /** @param rightPrefix prefix for the right side's non-key columns in
    *                    the output (avoids collisions with left names)
    * @param tolerance   optional staleness bound `(leftTs, rightTs) =>
    *                    keep` — a match older than the bound reverts to
    *                    the NULL extension (kdb's `aj` tolerance /
    *                    pandas `merge_asof(tolerance=...)`). Applied to
    *                    the already-selected latest match, so it adds
    *                    ZERO plan shape: same one shuffle + one sort,
    *                    one more codegen'd conditional. (Semantics
    *                    note: with a tolerance, "latest match within
    *                    the bound" and "latest match, nulled if out of
    *                    bound" coincide because the latest preceding
    *                    row is the nearest one.) */
  def asOfLeft(left: DataFrame, right: DataFrame, keyCols: Seq[String], ts: String,
               rightPrefix: String = "asof_",
               tolerance: Option[(Column, Column) => Column] = None): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rValCols = right.columns.filterNot(keyCols.contains).toSeq
    val rStruct = struct(rValCols.map(col): _*)
    val lType = StructType(left.columns.map(c => left.schema(c)))
    val rType = StructType(rValCols.map(c => right.schema(c)))

    // scratch names no input actually uses (same pattern as RangeJoin /
    // SkewJoin) — fixed names like "_ts" would collide with inputs that
    // already carry such a column and fail analysis as ambiguous
    val taken = (left.columns ++ right.columns).toSet
    def fresh(base: String): String =
      LazyList.from(0).map(i => s"$base$i").find(!taken.contains(_)).get
    val tsCol = fresh("_graft_ts"); val sideCol = fresh("_graft_side")
    val lCol = fresh("_graft_l"); val rCol = fresh("_graft_r")
    val matchCol = fresh("_graft_match")

    // Equality-join semantics: a NULL key or NULL ts on the right can
    // never legitimately match (NULL = NULL is not true), but
    // Window.partitionBy groups NULLs together and NULL ts sorts
    // first — drop them up front instead of fabricating matches.
    val rightClean = (keyCols :+ ts).foldLeft(right)((df, c) => df.filter(col(c).isNotNull))

    val lTagged = left.select(
      (keyCols.map(col) :+ col(ts).as(tsCol) :+ lit(1).as(sideCol) :+
        lStruct.as(lCol) :+ lit(null).cast(rType).as(rCol)): _*)
    val rTagged = rightClean.select(
      (keyCols.map(col) :+ col(ts).as(tsCol) :+ lit(0).as(sideCol) :+
        lit(null).cast(lType).as(lCol) :+ rStruct.as(rCol)): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(sideCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lTagged.unionByName(rTagged)
      .withColumn(matchCol, last(col(rCol), ignoreNulls = true).over(w))
      .filter(col(sideCol) === 1)
    val out = tolerance match {
      case Some(keep) => matched.withColumn(matchCol,
        when(keep(col(tsCol), col(s"$matchCol.$ts")), col(matchCol)))
      case None => matched
    }
    out.select(
      left.columns.map(c => col(s"$lCol.$c").as(c)).toSeq ++
        rValCols.map(c => col(s"$matchCol.$c").as(s"$rightPrefix$c")): _*)
  }
}
