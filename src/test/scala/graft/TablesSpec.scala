package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The events fixture has shipped in two vintages (int64 nanoseconds,
  * native timestamp[us]); `Tables.events` must load both — and any
  * future LTZ-flagged write — to the SAME downstream shape:
  * `TimestampType` micros, identical values. One loader, every vintage.
  */
class TablesSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // 2024-03-01T12:34:56.789Z and one second later, as micros since epoch.
  private val micros = Seq(1709296496789000L, 1709296497789000L)

  private def writeFixture(tag: String)(write: String => Unit): String = {
    val dir = Files.createTempDirectory(s"graft_events_$tag").toFile
    dir.deleteOnExit()
    write(s"${dir.getAbsolutePath}/events.parquet")
    dir.getAbsolutePath
  }

  test("events loader adapts to ns-int64, timestamp[us] NTZ, and LTZ vintages") {
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "click", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")

    // Legacy vintage: ts as raw int64 nanoseconds (what nanosAsLong
    // yields for a TIMESTAMP(NANOS) column — plain int64 exercises the
    // same LongType branch; Spark cannot author TIMESTAMP(NANOS)).
    val nsDir = writeFixture("ns") { p =>
      base.withColumn("ts", col("us") * 1000L).drop("us")
        .write.mode("overwrite").parquet(p)
    }
    // Current vintage: native timestamp[us], NOT adjusted to UTC
    // (pandas/pyarrow default) — Spark reads it as TimestampNTZType.
    val usDir = writeFixture("us") { p =>
      base.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
        .drop("us").write.mode("overwrite").parquet(p)
    }
    // LTZ vintage: timestamp[us] adjusted to UTC — Spark's own output.
    val ltzDir = writeFixture("ltz") { p =>
      base.withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .write.mode("overwrite").parquet(p)
    }

    val loaded = Seq("ns" -> nsDir, "us" -> usDir, "ltz" -> ltzDir).map {
      case (tag, dir) =>
        val ev = Tables.events(spark, dir)
        assert(ev.schema("ts").dataType == TimestampType,
          s"$tag vintage loaded as ${ev.schema("ts").dataType}")
        tag -> ev.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
    }.toMap

    assert(loaded("ns") == micros, s"ns vintage values: ${loaded("ns")}")
    assert(loaded("us") == micros, s"us vintage values: ${loaded("us")}")
    assert(loaded("ltz") == micros, s"ltz vintage values: ${loaded("ltz")}")
  }

  test("events loader reads the real fixture with a timestamp ts and 2024 data") {
    val ev = Tables.events(spark, SparkTestSession.sfTiny)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.filter(col("ts") >= to_timestamp(lit("2024-01-01"))).count() > 0)
  }
}
