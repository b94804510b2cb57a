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
    *                    the output (avoids collisions with left names) */
  def asOfLeft(left: DataFrame, right: DataFrame, keyCols: Seq[String], ts: String,
               rightPrefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rValCols = right.columns.filterNot(keyCols.contains).toSeq
    val rStruct = struct(rValCols.map(col): _*)
    val lType = StructType(left.columns.map(c => left.schema(c)))
    val rType = StructType(rValCols.map(c => right.schema(c)))

    // Equality-join semantics: a NULL key or NULL ts on the right can
    // never legitimately match (NULL = NULL is not true), but
    // Window.partitionBy groups NULLs together and NULL ts sorts
    // first — drop them up front instead of fabricating matches.
    val rightClean = (keyCols :+ ts).foldLeft(right)((df, c) => df.filter(col(c).isNotNull))

    val lTagged = left.select(
      (keyCols.map(col) :+ col(ts).as("_ts") :+ lit(1).as("_side") :+
        lStruct.as("_l") :+ lit(null).cast(rType).as("_r")): _*)
    val rTagged = rightClean.select(
      (keyCols.map(col) :+ col(ts).as("_ts") :+ lit(0).as("_side") :+
        lit(null).cast(lType).as("_l") :+ rStruct.as("_r")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val out = lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    out.select(
      left.columns.map(c => col(s"_l.$c").as(c)).toSeq ++
        rValCols.map(c => col(s"_match.$c").as(s"$rightPrefix$c")): _*)
  }
}
