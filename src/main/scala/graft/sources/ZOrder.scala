package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.GraftQuery.sql

/** Z-ORDER (Morton) layout — the multi-dimensional clustering key a
  * 100 TB table uses so range predicates on EITHER of two dimensions
  * prune most of the data (what Delta's OPTIMIZE ZORDER BY and
  * Iceberg's sort orders do): interleave the bits of two 16-bit
  * dimension values so rows close in (a, b) space land close on the
  * 1-D key, then partition/sort the table by that key. A 2-D box
  * query then touches only the partitions whose z-range overlaps the
  * box instead of the whole table.
  *
  * Everything is integer bit arithmetic (the classic
  * spread-by-magic-numbers Morton encoding), so the key is exact and
  * cross-engine reproducible — the oracle computes the identical
  * expression. No UDF: the whole encoding is codegen'd
  * shift/and/or columns.
  *
  * Reference: beyond-reference storage-layout surface (the reference
  * engine has no storage layer at all); the technique is public —
  * Morton, "A computer oriented geodetic data base" (1966), and every
  * lakehouse table format since.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions 0,2,…,30. */
  def spread16(c: Column): Column = {
    val v0 = c.bitwiseAND(lit(65535L))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(16711935L))    // 0x00FF00FF
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(252645135L))   // 0x0F0F0F0F
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(858993459L))   // 0x33333333
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(1431655765L))           // 0x55555555
  }

  /** 32-bit Morton key: a's bits on even positions, b's on odd. */
  def zkey(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** The DuckDB mirror of [[spread16]]/[[zkey]] (same op tree). */
  private def spread16Sql(e: String): String = {
    val v0 = s"(($e) & 65535)"
    val v1 = s"(($v0 | ($v0 << 8)) & 16711935)"
    val v2 = s"(($v1 | ($v1 << 4)) & 252645135)"
    val v3 = s"(($v2 | ($v2 << 2)) & 858993459)"
    s"(($v3 | ($v3 << 1)) & 1431655765)"
  }
  def zkeySql(a: String, b: String): String =
    s"(${spread16Sql(a)} | (${spread16Sql(b)} << 1))"

  /** Write `df` clustered by the z-key of (`a`, `b`): Hive-partitioned
    * on the top `log2(buckets)` bits of the 32-bit key (a contiguous
    * z-range per directory), rows sorted by full key within each. A
    * 2-D box query reads only the overlapping z-range partitions.
    *
    * The caller must SCALE each dimension to use the 16-bit key width
    * (e.g. `(x - min) * 65535 div (max - min)` or a rank/quantile
    * bucket): a dimension whose values only occupy low bits leaves the
    * key's top bits constant and collapses every row into one
    * partition — clustering needs entropy in the bits the bucketing
    * reads, exactly like choosing Z-order columns in a lakehouse
    * OPTIMIZE. */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
                    buckets: Int = 16): Unit = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0, s"buckets must be a power of 2")
    val shift = 32 - Integer.numberOfTrailingZeros(buckets)
    df.withColumn("zkey", zkey(a, b))
      .withColumn("zbucket", shiftright(col("zkey"), shift))
      .repartition(col("zbucket"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").partitionBy("zbucket").parquet(path)
  }

  val defs: Seq[GraftQuery] = Seq(
    // The key itself, oracle-gated: 32-bit Morton interleave of
    // (o_custkey, o_totalprice/16) — both fit 16 bits at every
    // fixture SF; the layout/pruning behavior is spec'd in
    // ZOrderSpec (directory-level skipping is not SQL-observable).
    sql("zorder_key",
      s"""SELECT o_orderkey,
         | ${zkeySql("o_custkey", "CAST(FLOOR(o_totalprice / 16) AS BIGINT)")} AS zkey
         |FROM orders""".stripMargin) {
      (s, d) =>
        Tables.orders(s, d)
          .select(col("o_orderkey"),
            zkey(col("o_custkey"),
              (col("o_totalprice") / 16).cast("long")).as("zkey"))
    })
}
