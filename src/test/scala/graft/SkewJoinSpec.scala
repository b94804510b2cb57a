package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("salted join equals the plain join on a skewed key distribution") {
    // hot key 7 carries 50k rows; keys 0-9 uniform otherwise
    val big = spark.range(60000)
      .select(when(col("id") < 50000, 7L).otherwise(col("id") % 10).as("k"),
        col("id").as("payload"))
    val small = Seq((0L, "a"), (3L, "b"), (7L, "c"), (9L, "d")).toDF("k", "name")

    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = SkewJoin.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "name")

    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salt spreads a hot key even when its rows are byte-identical") {
    // the hard case: a pure content hash would put all 10k copies in
    // ONE sub-key; the row-id term must spread them
    val big = spark.range(10000).select(lit(7L).as("k"), lit(1L).as("payload"))
    val salts = big.withColumn("_s",
        pmod(hash(monotonically_increasing_id() +: big.columns.map(col): _*), lit(8)))
      .groupBy("_s").count().collect()
    assert(salts.length == 8, "all 8 salt buckets populated")
    assert(salts.map(_.getLong(1)).max < 10000 * 0.3, "no bucket holds the whole key")
    // and the join stays correct on identical rows
    val small = Seq((7L, "x")).toDF("k", "name")
    assert(SkewJoin.saltedJoin(big, small, "k", 8).count() == 10000)
  }

  test("saltedJoin tolerates an existing _salt-like column on the inputs") {
    val big = spark.range(100).select((col("id") % 5).as("k"), col("id").as("_graft_salt0"))
    val small = Seq((0L, "a"), (3L, "b")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(big, small, "k", 4)
    val plain = big.join(small, Seq("k"))
    assert(out.count() == plain.count())
    assert(out.columns.contains("_graft_salt0"), "user column preserved")
    assert(out.except(plain).isEmpty && plain.except(out).isEmpty)
  }
}
