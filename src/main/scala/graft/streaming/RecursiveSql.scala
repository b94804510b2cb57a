package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Bounded `WITH RECURSIVE` — SQL:1999 linear recursion compiled onto
  * the engine's checkpointed fixpoint loop (the same distributed shape
  * as [[graft.operators.GraphOps.kcore]]'s peel / BFS frontier loops):
  *
  * {{{
  * WITH RECURSIVE r[(cols)] AS (
  *   <anchor query>            -- must not reference r
  *   UNION [ALL]
  *   <recursive query>         -- must reference r exactly ONCE
  * )
  * <outer query over r>
  * }}}
  *
  * Standard working-table semantics (Postgres/DuckDB): each iteration
  * the recursive term sees ONLY the rows produced by the previous
  * iteration (the frontier), `UNION` deduplicates against everything
  * accumulated so far (so cyclic data terminates — the BFS shape),
  * `UNION ALL` appends blindly (terminates only when the frontier
  * empties — DAG data). Iterations run as ordinary Spark jobs: one
  * equi-join per round against the frontier, lineage truncated per
  * round via eager localCheckpoint so the plan never grows with depth.
  *
  * Loud fences, never wrong answers:
  *  - NON-LINEAR recursion (the recursive term referencing r twice —
  *    e.g. a self-join of the working table) fails at compile;
  *  - a recursion still producing new rows after `maxIters` fails
  *    loudly — a truncated result is NOT the statement's fixpoint;
  *  - additional CTEs in the WITH are not compiled (pre-bind them as
  *    temp views instead).
  *
  * At 100 TB the loop is diameter-bounded BFS: every round is a
  * key-partitioned join frontier ⋈ edges plus a distinct — both
  * shuffle-partitioned, no driver-side data, frontier monotonically
  * shrinking on saturating graphs.
  *
  * Reference: beyond-reference SQL surface (the reference has no SQL
  * front end); semantics follow the SQL standard / DuckDB, which the
  * oracle runs natively.
  */
object RecursiveSql {

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private val headPattern = java.util.regex.Pattern.compile(
    "(?is)^\\s*WITH\\s+RECURSIVE\\s+(\\w+)(?:\\s*\\(([^)]*)\\))?\\s+AS\\s*\\(")

  /** Split `sqlText` into (cteName, colAliases, anchorText,
    * recursiveText, unionAll, outerText). */
  private[graft] def parse(sqlText: String)
      : (String, Seq[String], String, String, Boolean, String) = {
    val m = headPattern.matcher(sqlText)
    if (!m.find()) fail("expected WITH RECURSIVE <name>[(cols)] AS ( ... ) <outer query>")
    val name = m.group(1)
    val aliases = Option(m.group(2)).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Nil)
    // balanced-paren body extraction, string-aware
    var i = m.end()
    var depth = 1
    var inStr = false
    val start = i
    while (i < sqlText.length && depth > 0) {
      val c = sqlText.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => ()
      }
      i += 1
    }
    if (depth != 0) fail("unbalanced parentheses in the recursive CTE body")
    val body = sqlText.substring(start, i - 1)
    val rest = sqlText.substring(i).trim
    if (rest.startsWith(","))
      fail("WITH RECURSIVE with additional CTEs is not compiled — bind the " +
        "other tables as temp views (or inline them) and keep ONE recursive CTE")
    val (parts, kinds) = SqlCompiler.splitTopLevelUnion(body)
    if (parts.size != 2)
      fail(s"the recursive CTE body must be <anchor> UNION [ALL] <recursive " +
        s"term> — found ${parts.size} branch(es)")
    val refs = countRefs(parts(1), name)
    if (countRefs(parts(0), name) != 0)
      fail(s"the anchor term may not reference '$name' (it seeds the recursion)")
    if (refs == 0)
      fail(s"the recursive term does not reference '$name' — use a plain WITH")
    if (refs > 1)
      fail(s"non-linear recursion: the recursive term references '$name' $refs " +
        "times; SQL's working-table semantics admit exactly one reference " +
        "(a self-join of the working table has no bounded fixpoint plan)")
    (name, aliases, parts(0), parts(1), kinds.head, rest)
  }

  /** Occurrences of `name` as a standalone TABLE identifier, outside
    * string literals: a `name.` qualifier is a COLUMN reference to the
    * same table factor (not a second reference), and `x.name` is a
    * different qualified name entirely — both are skipped. */
  private def countRefs(text: String, name: String): Int = {
    var i = 0
    var inStr = false
    var n = 0
    val upper = text.toUpperCase
    val target = name.toUpperCase
    def identChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    while (i < text.length) {
      val c = text.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; i += 1 }
      else if (upper.startsWith(target, i) &&
        (i == 0 || (!identChar(text.charAt(i - 1)) && text.charAt(i - 1) != '.')) &&
        (i + target.length == text.length ||
          (!identChar(text.charAt(i + target.length)) &&
            text.charAt(i + target.length) != '.'))) {
        n += 1; i += target.length
      } else i += 1
    }
    n
  }

  /** Run the statement against the parquet fixture at `dir`: every
    * base table name in [[Tables.names]] is bound as a temp view in a
    * CHILD session (so caller bindings are untouched), the anchor
    * seeds the accumulator, and the loop iterates the recursive term
    * over the frontier until it adds nothing (or fails at `maxIters`).
    */
  def run(spark: SparkSession, dir: String, sqlText: String,
          maxIters: Int = 100): DataFrame = {
    val (name, aliases, anchorText, recText, unionAll, outerText) = parse(sqlText)
    val s = spark.newSession()
    Tables.names.foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))

    def renamed(df: DataFrame): DataFrame =
      if (aliases.isEmpty) df
      else if (aliases.size != df.columns.length)
        fail(s"column alias list (${aliases.size}) does not match the anchor's " +
          s"output arity (${df.columns.length})")
      else df.toDF(aliases: _*)

    var acc = renamed(s.sql(anchorText))
    if (!unionAll) acc = acc.distinct()
    acc = acc.localCheckpoint(true)
    val accCols = acc.columns.toSeq
    // UNION aligns branches POSITIONALLY per SQL: the recursive term's
    // output takes the anchor's column names whatever it calls them
    def aligned(df: DataFrame): DataFrame = {
      if (df.columns.length != accCols.length)
        fail(s"the recursive term yields ${df.columns.length} column(s), " +
          s"the anchor ${accCols.length} — UNION branches must agree")
      df.toDF(accCols: _*)
    }
    var frontier = acc
    var rounds = 0
    var done = frontier.isEmpty
    while (!done) {
      if (rounds >= maxIters)
        fail(s"recursion still producing rows after $maxIters iterations — " +
          "a truncated result is not the statement's fixpoint; raise maxIters " +
          "or bound the recursion in the query")
      frontier.createOrReplaceTempView(name)
      val step = aligned(renamed(s.sql(recText)))
      val delta =
        if (unionAll) step.localCheckpoint(true)
        // UNION: only rows not already accumulated enter (null-safe,
        // EXCEPT's equality) — the termination argument on cyclic data
        else step.distinct().except(acc).localCheckpoint(true)
      if (delta.isEmpty) done = true
      else {
        acc = acc.unionAll(delta).localCheckpoint(true)
        frontier = delta
        rounds += 1
      }
    }
    acc.createOrReplaceTempView(name)
    s.sql(outerText)
  }
}
