package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.CdcParser

class CdcParserSpec extends AnyFunSuite {
  private def s = SparkTestSession.spark

  test("render→parse round-trips NULL fields without shifting columns") {
    val sp = s
    import sp.implicits._
    // nullable data: a null mid-row would vanish from concat_ws and
    // shift every later field left without the "null" coalesce
    val df = Seq(
      (1L, Option("alpha"), Option(2.5)),
      (2L, None: Option[String], Option(7.0)),
      (3L, Option("gamma"), None: Option[Double])
    ).toDF("id", "name", "score")
    val lines = CdcParser.toCdcLines(df, add = true, "TEST", Seq("id", "name", "score"))
    // no arity mismatches: nothing lands in the dead-letter path
    val schemas = Map("TEST" -> Seq("id" -> LongType, "name" -> StringType,
      "score" -> DoubleType))
    assert(CdcParser.rejects(lines, schemas).count() == 0)
    val back = CdcParser.parseRelation(lines, "TEST",
        Seq("id" -> LongType, "name" -> StringType, "score" -> DoubleType))
      .select("id", "name", "score").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1).toSeq
    assert(back == Seq(
      (1L, Some("alpha"), Some(2.5)),
      (2L, None, Some(7.0)),
      (3L, Some("gamma"), None)))
  }

  test("rejects routes exactly the malformed lines, with reasons") {
    val ss = s
    import ss.implicits._
    val schemas: Map[String, CdcParser.RelationSchema] = Map(
      "LINE" -> Seq("l_orderkey" -> LongType, "l_quantity" -> DoubleType,
        "l_returnflag" -> StringType))
    val good1 = "AddLINE|42|12.5|R"
    val good2 = "SubLINE|7|null|N"        // explicit null field is legal
    val badHeader1 = "ZapLINE|1|2.0|R"    // unknown action
    val badHeader2 = "AddXXXX|1|2.0|R"    // unknown relation code
    val badHeader3 = "AddLIN"             // truncated
    val badArity = "AddLINE|1|2.0"        // missing field
    val badCast = "AddLINE|notanum|2.0|R" // unparseable bigint
    val lines = Seq(good1, good2, badHeader1, badHeader2, badHeader3, badArity, badCast)
      .toDF("value")

    val rej = CdcParser.rejects(lines, schemas).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rej.keySet ==
      Set(badHeader1, badHeader2, badHeader3, badArity, badCast))
    assert(rej(badHeader1) == "bad_header" && rej(badHeader3) == "bad_header")
    assert(rej(badArity) == "bad_fields" && rej(badCast) == "bad_fields")

    // the clean remainder parses fully typed with no null surprises
    val clean = CdcParser.cleanLines(lines, schemas)
    assert(clean.count() + rej.size == lines.count(), "clean/rejects partition the stream")
    val parsed = CdcParser.parseRelation(clean, "LINE", schemas("LINE"))
      .orderBy("l_orderkey").collect()
    assert(parsed.length == 2)
    assert(parsed(0).getString(0) == "Delete" && parsed(0).getLong(2) == 7L
      && parsed(0).isNullAt(3))
    assert(parsed(1).getString(0) == "Insert" && parsed(1).getLong(2) == 42L
      && parsed(1).getDouble(3) == 12.5)
  }

  test("JSON envelope: op demux to signed events; dead-letter reasons partition the stream") {
    val ss = s
    import ss.implicits._
    import org.apache.spark.sql.types.{StructField, StructType}
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val create = """{"op":"c","after":{"id":1,"name":"a"},"ts_ms":10}"""
    val update = """{"op":"u","before":{"id":1,"name":"a"},"after":{"id":1,"name":"b"},"ts_ms":20}"""
    val delete = """{"op":"d","before":{"id":1,"name":"b"},"ts_ms":30}"""
    val badJson = """{"op":"c","after":"""          // truncated
    val badOp = """{"op":"x","after":{"id":9},"ts_ms":1}"""
    val missingImg = """{"op":"u","after":{"id":9,"name":"z"},"ts_ms":1}""" // u without before
    val lines = Seq(create, update, delete, badJson, badOp, missingImg).toDF("value")

    val rej = CdcParser.rejectsJsonEnvelope(lines, rowSchema).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rej.keySet == Set(badJson, badOp, missingImg))
    assert(rej(badJson) == "bad_json" && rej(badOp) == "bad_op"
      && rej(missingImg) == "missing_image")

    // the three good envelopes demux to FOUR signed events (u → −/+),
    // in the delta engine's changelog shape
    val clean = lines.join(CdcParser.rejectsJsonEnvelope(lines, rowSchema)
      .select("value"), Seq("value"), "left_anti")
    val evs = CdcParser.parseJsonEnvelope(clean, rowSchema)
      .select("op", "ts_ms", "sign", "id", "name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getString(4)))
      .sortBy(e => (e._2, e._3)).toSeq
    assert(evs == Seq(
      ("c", 10L, 1, 1L, "a"),
      ("u", 20L, -1, 1L, "a"),
      ("u", 20L, 1, 1L, "b"),
      ("d", 30L, -1, 1L, "b")))
  }
}
