package graft.operators

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.GraftQuery.sql

/** DATA-QUALITY PROFILING — the pre-ingestion checks a training-data
  * pipeline runs before a table is allowed in (the Deequ/Great-
  * Expectations role), as plain one-pass aggregates:
  *
  *  - `profile_orders`: per-column null count, exact distinct count,
  *    and min/max in a tall (column, metric…) frame. ONE scan; the
  *    count-distincts share Spark's single Expand-based aggregate. At
  *    100 TB swap the exact distincts for the KMV sketch
  *    ([[graft.functions.KmvDistinctAgg]]) — the frame shape and scan
  *    discipline stay identical.
  *  - `quality_constraints_orders`: constraint VIOLATION COUNTS —
  *    primary-key uniqueness, NOT-NULL, value-domain membership,
  *    numeric range, and FK referential integrity (orders→customer,
  *    an anti-join count). All-zeros on healthy fixtures; the entry
  *    gates the CHECKS, not the data, so a regressed generator or a
  *    broken ingest shows up as a nonzero cell.
  *
  * Determinism notes: doubles are profiled as scaled-BIGINT cents
  * (a raw double→VARCHAR min/max would hit engine formatting
  * differences); timestamps stringify identically ('yyyy-MM-dd
  * HH:mm:ss') in both engines under UTC.
  */
object Profiling {

  val defs: Seq[GraftQuery] = Seq(
    // JOIN-SKEW ADVISOR — the "should I salt this join key" check a
    // 100 TB pipeline runs BEFORE the shuffle that melts an executor:
    // per-key counts of lineitem's order FK, then key cardinality,
    // hottest key, skew factor (max/avg = max·keys/rows — exact
    // integer cross-product, ONE IEEE division) and the p99 key count
    // as an inverted-CDF selection over the count distribution,
    // ranked by [[DistributedRank.withGlobalRank]] (every stage
    // partitioned — the selection must not itself be the
    // single-task sort it warns about). The two one-row frames meet
    // in a broadcast-of-one-row cross join.
    sql("profile_lineitem_skew",
      """WITH k AS (SELECT l_orderkey AS key, COUNT(*) AS cnt
        |           FROM lineitem GROUP BY 1),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |        CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |        CAST(MAX(cnt) AS BIGINT) AS max_cnt FROM k),
        |p AS (SELECT CAST(quantile_disc(cnt, 0.99) AS BIGINT) AS p99_cnt FROM k)
        |SELECT n_keys, n_rows, max_cnt,
        | CAST(max_cnt AS DOUBLE) * n_keys / n_rows AS skew_factor, p99_cnt
        |FROM agg, p""".stripMargin) {
      (s, d) =>
        val k = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey").as("key")).agg(count(lit(1)).as("cnt"))
        val agg = k.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
          max(col("cnt")).as("max_cnt"))
        val (ranked, n) = DistributedRank.withGlobalRank(k, "rk",
          col("cnt"), col("key"))
        val p99 = ranked.filter(col("rk") * 100 >= lit(99L) * lit(n))
          .agg(min(col("cnt")).as("p99_cnt"))
        agg.crossJoin(p99) // broadcast-of-one-aggregate-row, both sides
          .select(col("n_keys"), col("n_rows"), col("max_cnt"),
            (col("max_cnt").cast("double") * col("n_keys") / col("n_rows"))
              .as("skew_factor"),
            col("p99_cnt"))
    },

    // JOIN-AMPLIFICATION FORECAST — the companion check: EXACT output
    // cardinality of orders ⋈ lineitem from per-key count profiles
    // (Σ cₐ·c_b over matched keys) plus the hottest key's contribution
    // — the number that decides broadcast vs shuffle vs salt BEFORE
    // running the join. Two hash aggregates + one key-profile join
    // (key-cardinality sized, not data sized).
    sql("profile_join_amplification",
      """WITH a AS (SELECT o_orderkey AS k, COUNT(*) AS ca FROM orders GROUP BY 1),
        |b AS (SELECT l_orderkey AS k, COUNT(*) AS cb FROM lineitem GROUP BY 1)
        |SELECT CAST(SUM(ca * cb) AS BIGINT) AS join_rows,
        | CAST(COUNT(*) AS BIGINT) AS matched_keys,
        | CAST(MAX(ca * cb) AS BIGINT) AS max_key_rows
        |FROM a JOIN b USING (k)""".stripMargin) {
      (s, d) =>
        val a = Tables.orders(s, d)
          .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("ca"))
        val b = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("cb"))
        a.join(b, "k")
          .agg(sum(col("ca") * col("cb")).as("join_rows"),
            count(lit(1)).as("matched_keys"),
            max(col("ca") * col("cb")).as("max_key_rows"))
    },

    sql("profile_orders",
      """WITH b AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS o_totalprice_e2,
        |  CAST(o_orderdate AS VARCHAR) AS o_orderdate_s, o_orderpriority
        | FROM orders)
        |SELECT 'o_orderkey' AS col, COUNT(*) - COUNT(o_orderkey) AS n_nulls,
        |  COUNT(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
        |  CAST(MAX(o_orderkey) AS VARCHAR) AS max_val FROM b
        |UNION ALL
        |SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey),
        |  COUNT(DISTINCT o_custkey),
        |  CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR) FROM b
        |UNION ALL
        |SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
        |  COUNT(DISTINCT o_orderstatus),
        |  MIN(o_orderstatus), MAX(o_orderstatus) FROM b
        |UNION ALL
        |SELECT 'o_totalprice_e2', COUNT(*) - COUNT(o_totalprice_e2),
        |  COUNT(DISTINCT o_totalprice_e2),
        |  CAST(MIN(o_totalprice_e2) AS VARCHAR), CAST(MAX(o_totalprice_e2) AS VARCHAR) FROM b
        |UNION ALL
        |SELECT 'o_orderdate', COUNT(*) - COUNT(o_orderdate_s),
        |  COUNT(DISTINCT o_orderdate_s),
        |  MIN(o_orderdate_s), MAX(o_orderdate_s) FROM b
        |UNION ALL
        |SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
        |  COUNT(DISTINCT o_orderpriority),
        |  MIN(o_orderpriority), MAX(o_orderpriority) FROM b""".stripMargin) {
      (s, d) =>
        // ONE aggregate over ONE scan: all six columns' metrics in a
        // single agg row (the multiple count-distincts share Spark's
        // Expand-based distinct aggregate), then stack() reshapes to
        // the tall frame — no per-column re-scan
        val b = Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").as("o_totalprice_e2"),
          col("o_orderdate").cast("string").as("o_orderdate_s"),
          col("o_orderpriority"))
        val cols = Seq("o_orderkey" -> "o_orderkey", "o_custkey" -> "o_custkey",
          "o_orderstatus" -> "o_orderstatus", "o_totalprice_e2" -> "o_totalprice_e2",
          "o_orderdate" -> "o_orderdate_s", "o_orderpriority" -> "o_orderpriority")
        val agg1 = b.agg(count(lit(1)).as("n"),
          cols.flatMap { case (_, c) => Seq(
            count(col(c)).as(s"cnt_$c"),
            countDistinct(col(c)).as(s"nd_$c"),
            min(col(c)).cast("string").as(s"min_$c"),
            max(col(c)).cast("string").as(s"max_$c"))
          }: _*)
        agg1.selectExpr(
          s"stack(${cols.size}, " + cols.map { case (name, c) =>
            s"'$name', n - cnt_$c, nd_$c, min_$c, max_$c" }.mkString(", ") +
            ") as (col, n_nulls, n_distinct, min_val, max_val)")
    },

    sql("quality_constraints_orders",
      """SELECT 'pk_unique' AS constraint_name,
        | CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT) AS n_violations
        |UNION ALL
        |SELECT 'custkey_not_null',
        | (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
        |UNION ALL
        |SELECT 'status_domain',
        | (SELECT COUNT(*) FROM orders WHERE o_orderstatus NOT IN ('F', 'O', 'P'))
        |UNION ALL
        |SELECT 'price_range',
        | (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0 OR o_totalprice > 1000000)
        |UNION ALL
        |SELECT 'fk_customer',
        | (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS (
        |   SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))""".stripMargin) {
      (s, d) =>
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        def row(name: String, v: org.apache.spark.sql.DataFrame) =
          v.select(lit(name).as("constraint_name"),
            col("v").cast("long").as("n_violations"))
        row("pk_unique",
            o.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("v")))
          .unionAll(row("custkey_not_null",
            o.filter(col("o_custkey").isNull).agg(count(lit(1)).as("v"))))
          .unionAll(row("status_domain",
            o.filter(!col("o_orderstatus").isin("F", "O", "P"))
              .agg(count(lit(1)).as("v"))))
          .unionAll(row("price_range",
            o.filter(col("o_totalprice") <= 0 || col("o_totalprice") > 1000000)
              .agg(count(lit(1)).as("v"))))
          .unionAll(row("fk_customer",
            o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")
              .agg(count(lit(1)).as("v"))))
    },

    // The fact table's checks: composite-PK uniqueness, two FK edges
    // (orders, part — the fan-out joins the engine maintains), and
    // measure-domain ranges.
    sql("quality_constraints_lineitem",
      """SELECT 'pk_unique' AS constraint_name,
        | CAST((SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
        |   FROM lineitem) AS BIGINT) AS n_violations
        |UNION ALL
        |SELECT 'fk_orders',
        | (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (
        |   SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |UNION ALL
        |SELECT 'fk_part',
        | (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (
        |   SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |UNION ALL
        |SELECT 'qty_range',
        | (SELECT COUNT(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
        |UNION ALL
        |SELECT 'discount_range',
        | (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)""".stripMargin) {
      (s, d) =>
        val l = Tables.lineitem(s, d)
        def row(name: String, v: org.apache.spark.sql.DataFrame) =
          v.select(lit(name).as("constraint_name"),
            col("v").cast("long").as("n_violations"))
        // Composite key counted as a struct: alias-proof for any
        // linenumber domain (an arithmetic encoding like key*10+line
        // would silently collide once linenumber reaches the radix).
        row("pk_unique",
            l.agg((count(lit(1)) -
              countDistinct(struct(col("l_orderkey"), col("l_linenumber")))).as("v")))
          .unionAll(row("fk_orders",
            l.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"), "left_anti")
              .agg(count(lit(1)).as("v"))))
          .unionAll(row("fk_part",
            l.join(Tables.part(s, d), col("l_partkey") === col("p_partkey"), "left_anti")
              .agg(count(lit(1)).as("v"))))
          .unionAll(row("qty_range",
            l.filter(col("l_quantity") < 1 || col("l_quantity") > 50)
              .agg(count(lit(1)).as("v"))))
          .unionAll(row("discount_range",
            l.filter(col("l_discount") < 0 || col("l_discount") > 1)
              .agg(count(lit(1)).as("v"))))
    })
}
