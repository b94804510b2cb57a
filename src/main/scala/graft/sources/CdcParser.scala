package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Parser for the reference's CDC text format (DataFlow.java:63-119):
  * each line is `<7-char header><sep><pipe-separated row>`, where the
  * header is `Add`/`Sub` + a 4-char relation code —
  * `AddLINE|SubLINE|AddORDE|SubORDE|AddCUST|SubCUST|AddNATI|SubNATI`
  * (DataFlow.java:74-81) — and `Add` means Insert, `Sub` Delete.
  *
  * The reference demuxes with Flink side outputs (OutputTags,
  * DataFlow.java:21-24); Spark has no side outputs, so the idiom is N
  * filters over one shared scan — Catalyst collapses the shared parse
  * into each branch, and at scale the text scan is read once per
  * branch from the page cache (or `.cache()` the parsed frame when
  * branches are consumed together).
  *
  * Everything is built from codegen'd expressions (`substring`,
  * `split`, `cast`) — one WholeStageCodegen stage from text line to
  * typed row, exactly the hot path §3.2 of SURVEY.md describes.
  */
object CdcParser {

  /** Relation code → (relation name, ordered column schema). */
  type RelationSchema = Seq[(String, DataType)]

  /** Parse a frame of raw CDC lines (column `value`, as produced by
    * `spark.read.text` / `spark.readStream.text`).
    *
    * TOTAL over malformed input (truncated/uncastable fields become
    * nulls rather than ANSI errors) — when the stream may contain
    * garbage, split it with [[cleanLines]]/[[rejects]] first so
    * quarantined lines don't double as null-padded relation rows.
    *
    * @return frame with `action` (Insert/Delete), `relation`, and the
    *         typed columns of `schema`, filtered to `relCode`.
    */
  def parseRelation(lines: DataFrame, relCode: String, schema: RelationSchema): DataFrame = {
    val header = substring(col("value"), 1, 7)
    val body = expr("substring(value, 9)") // 7-char header + 1 separator (DataFlow.java:70-71)
    val parts = split(body, "\\|")
    // try_element_at + try_cast: a truncated or malformed line must
    // yield null fields, not an INVALID_ARRAY_INDEX / CAST_INVALID_INPUT
    // error killing the whole job under ANSI mode — [[rejects]] routes
    // such lines to quarantine; the demux itself must stay TOTAL
    // the literal "null" is the format's null marker ([[toCdcLines]]
    // renders nulls that way so they don't vanish from concat_ws and
    // shift later fields): map it back to a typed null — for non-string
    // types try_cast does this anyway; for strings it must be explicit
    // (a true string value "null" is ambiguous in the text format and
    // round-trips to null — the format's documented limitation)
    val typedCols = schema.zipWithIndex.map { case ((name, dt), i) =>
      val raw = try_element_at(parts, lit(i + 1))
      when(raw === "null", lit(null).cast(dt))
        .otherwise(raw.try_cast(dt)).as(name)
    }
    lines
      .filter(substring(header, 4, 4) === relCode)
      .select(
        (when(substring(header, 1, 3) === "Add", "Insert").otherwise("Delete").as("action") +:
          lit(relCode).as("rel_code") +:
          typedCols): _*)
  }

  /** Inverse of [[parseRelation]]: render typed rows back to CDC lines
    * (used by the round-trip correctness query and test fixtures).
    * Null fields render as the literal "null" — concat_ws would
    * otherwise DROP them entirely, silently shifting every later field
    * left (an arity mismatch the dead-letter path would quarantine). */
  def toCdcLines(df: DataFrame, add: Boolean, relCode: String, cols: Seq[String]): DataFrame = {
    val headerStr = (if (add) "Add" else "Sub") + relCode
    df.select(concat_ws("|",
      (lit(headerStr) +: cols.map(c => coalesce(col(c).cast("string"), lit("null")))): _*)
      .as("value"))
  }

  /** Dead-letter routing: lines the N-filter demux would otherwise
    * lose SILENTLY — unknown/short header, wrong field count, or a
    * field whose cast fails while the raw text isn't the literal
    * "null". The reference has no such path (bad lines vanish inside
    * its per-relation filters); real ingest needs the rejects routed
    * to a quarantine sink with a `reason`, not dropped. Pure
    * per-line expressions — same single-scan cost model as the demux
    * itself. */
  def rejects(lines: DataFrame, schemas: Map[String, RelationSchema]): DataFrame = {
    rejectsOrClean(lines, schemas, wantRejects = true)
  }

  /** The complement of [[rejects]]: lines safe to feed to
    * [[parseRelation]]. ALWAYS split the stream with this pair —
    * `parseRelation` alone is total (null-pads malformed fields), so
    * feeding it unsplit input would let a quarantined line ALSO appear
    * as a null-padded row in the relation output. */
  def cleanLines(lines: DataFrame, schemas: Map[String, RelationSchema]): DataFrame =
    rejectsOrClean(lines, schemas, wantRejects = false).drop("reason")

  // ── JSON CDC envelope (the Debezium-style wire format) ──────────────
  //
  // Each line is one JSON object `{"op": "c"|"r"|"u"|"d", "before":
  // {...}, "after": {...}, "ts_ms": <long>}`: op c/r (create/read
  // snapshot) carries the after-image, d the before-image, u BOTH.
  // Parsing demuxes every envelope into SIGNED row events — u becomes
  // (−1, before) + (+1, after) — which is exactly the delta engine's
  // changelog shape, so a Debezium topic drives the incremental
  // engine with no intermediate state. All codegen'd expressions
  // (from_json / explode), scan-shaped like the pipe format above.

  import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

  /** The envelope struct over a relation's row schema. */
  def envelopeSchema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("op", StringType), StructField("before", rowSchema),
    StructField("after", rowSchema), StructField("ts_ms", LongType)))

  /** Parse JSON envelope lines (column `value`) into signed row
    * events: `op`, `ts_ms`, `sign` (+1/−1), then the typed columns of
    * `rowSchema`. An update emits its two events in wire order
    * (retraction first). Malformed lines emit NOTHING here — split
    * the stream with [[rejectsJsonEnvelope]] first, same dead-letter
    * contract as the pipe format's [[cleanLines]]/[[rejects]].
    *
    * Pass `jsonOpts` (e.g. `timestampFormat`) identically to the
    * writer's options — the default JSON timestamp format drops
    * sub-millisecond precision. */
  def parseJsonEnvelope(lines: DataFrame, rowSchema: StructType,
                        jsonOpts: Map[String, String] = Map.empty): DataFrame = {
    val e = from_json(col("value"), envelopeSchema(rowSchema), jsonOpts)
    def ev(sign: Int, img: Column) =
      struct(lit(sign).as("sign"), img.as("row"))
    lines.select(e.as("e"))
      .select(col("e.op").as("op"), col("e.ts_ms").as("ts_ms"),
        explode(
          when(col("e.op").isin("c", "r"), array(ev(1, col("e.after"))))
            .when(col("e.op") === "d", array(ev(-1, col("e.before"))))
            .when(col("e.op") === "u",
              array(ev(-1, col("e.before")), ev(1, col("e.after"))))
        ).as("__ev"))
      .select((col("op") +: col("ts_ms") +: col("__ev.sign").as("sign") +:
        rowSchema.fieldNames.toSeq.map(n => col(s"__ev.row.$n"))): _*)
  }

  /** Dead-letter routing for the JSON envelope: unparseable JSON, an
    * unknown op, or a missing required image (c/r without after, d
    * without before, u missing either). */
  def rejectsJsonEnvelope(lines: DataFrame, rowSchema: StructType,
                          jsonOpts: Map[String, String] = Map.empty): DataFrame = {
    val e = from_json(col("value"), envelopeSchema(rowSchema), jsonOpts)
    val op = e.getField("op")
    val badJson = e.isNull || op.isNull
    val badOp = !op.isin("c", "r", "u", "d")
    val missing =
      (op.isin("c", "r") && e.getField("after").isNull) ||
        (op === "d" && e.getField("before").isNull) ||
        (op === "u" && (e.getField("before").isNull || e.getField("after").isNull))
    lines.filter(badJson || badOp || missing)
      .select(col("value"),
        when(badJson, "bad_json").when(badOp, "bad_op")
          .otherwise("missing_image").as("reason"))
  }

  /** Render envelope lines from a frame carrying `op` (string),
    * `before`/`after` (row structs, null where the op omits them) and
    * `ts_ms`. Null images are omitted from the JSON (reader yields
    * null back). */
  def toJsonEnvelope(df: DataFrame, jsonOpts: Map[String, String] = Map.empty): DataFrame =
    df.select(to_json(
      struct(col("op"), col("before"), col("after"), col("ts_ms")), jsonOpts).as("value"))

  private def rejectsOrClean(lines: DataFrame, schemas: Map[String, RelationSchema],
                             wantRejects: Boolean): DataFrame = {
    val action = substring(col("value"), 1, 3)
    val codeCol = substring(col("value"), 4, 4)
    val parts = split(expr("substring(value, 9)"), "\\|")
    val headerBad = length(col("value")) < lit(9) ||
      !action.isin("Add", "Sub") ||
      !codeCol.isin(schemas.keys.toSeq.map(lit): _*)
    // per-relation: arity mismatch, or cast-failure on a non-"null" field
    val perCode = schemas.map { case (code, schema) =>
      val arityBad = size(parts) =!= lit(schema.size)
      val castBad = schema.zipWithIndex.map { case ((_, dt), i) =>
        val raw = try_element_at(parts, lit(i + 1))
        raw.isNotNull && raw =!= "null" && raw.try_cast(dt).isNull
      }.reduce(_ || _)
      (codeCol === code) && (arityBad || castBad)
    }.reduce(_ || _)
    val bad = headerBad || perCode
    lines
      .filter(if (wantRejects) bad else !bad)
      .select(col("value"),
        when(headerBad, "bad_header").otherwise("bad_fields").as("reason"))
  }
}
