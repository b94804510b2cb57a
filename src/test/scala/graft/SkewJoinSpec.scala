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

  test("salt spreads a hot key across sub-keys") {
    val big = spark.range(10000).select(lit(7L).as("k"), col("id").as("payload"))
    val salts = big.withColumn("_salt",
        pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(8)))
      .groupBy("_salt").count().collect()
    assert(salts.length == 8, "all 8 salt buckets populated")
    assert(salts.map(_.getLong(1)).max < 10000 * 0.3, "no bucket holds the whole key")
  }
}
