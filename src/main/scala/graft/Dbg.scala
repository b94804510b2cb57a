import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

object Dbg {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[dbg] $label%-30s ${(System.nanoTime()-t0)/1e9}%7.2f s")
    }
    def li = graft.Tables.lineitem(s, d)
    def floorSum(c: org.apache.spark.sql.Column, s10: Long) =
      sum(floor(c * s10 + 0.5).cast(LongType))
    def roundSum(c: org.apache.spark.sql.Column, s10: Long) =
      sum(round(c * s10, 0).cast(LongType))
    for (r <- 1 to 2) {
      println(s"-- round $r")
      time("decimal sums")(li.groupBy("l_returnflag","l_linestatus")
        .agg(sum(col("l_quantity").cast(DecimalType(18,2))), sum(col("l_extendedprice").cast(DecimalType(18,2))),
             sum((col("l_extendedprice")*(lit(1.0)-col("l_discount"))).cast(DecimalType(18,4))), count(lit(1)))
        .queryExecution.toRdd.count())
      time("floor-long sums")(li.groupBy("l_returnflag","l_linestatus")
        .agg(floorSum(col("l_quantity"),100), floorSum(col("l_extendedprice"),100),
             floorSum(col("l_extendedprice")*(lit(1.0)-col("l_discount")),10000), count(lit(1)))
        .queryExecution.toRdd.count())
      time("round-long sums")(li.groupBy("l_returnflag","l_linestatus")
        .agg(roundSum(col("l_quantity"),100), roundSum(col("l_extendedprice"),100),
             roundSum(col("l_extendedprice")*(lit(1.0)-col("l_discount")),10000), count(lit(1)))
        .queryExecution.toRdd.count())
    }
    s.stop()
  }
}
