package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions.
  *
  * A hash-partitioned join sends every row of a hot key to ONE task;
  * at 100 TB a single key holding 1% of the fact table stalls the
  * stage on one straggler. Salting splits each key into `salts`
  * sub-keys: the big side gets a deterministic salt derived from its
  * whole row, the small side is replicated once per salt value, and
  * the join key becomes (key, salt) — the hot key's rows spread over
  * `salts` tasks at the cost of replicating the small side ×salts.
  *
  * AQE's skew-join handling covers sort-merge joins after the fact;
  * salting is the explicit fix when AQE can't help (stateful
  * aggregations over the join output, storage-partitioned layouts, or
  * skew known up front).
  *
  * The salt is `pmod(hash(all big-side columns), salts)` — stable
  * under task retries (a `rand()` salt is not: a re-executed partition
  * would re-salt differently mid-shuffle).
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltedBig = big.withColumn("_salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(replicatedSmall, Seq(key, "_salt"))
      .drop("_salt")
  }
}
