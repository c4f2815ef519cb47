package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for EXTREME key skew: when one join key holds a
  * double-digit percentage of the big side, even AQE's skew-join split
  * leaves a straggler (it splits partitions, not keys, and only for
  * sort-merge joins). Salting splits the hot KEY itself: the big side
  * gets a uniform salt in [0, buckets), the small side is replicated
  * once per salt value, and the join key becomes (key, salt) — each hot
  * key now spreads over `buckets` reducers.
  *
  * Cost model: small side grows ×buckets (keep it broadcast-size ÷
  * buckets), big side is untouched. Result equals the plain inner
  * equi-join exactly (spec-verified).
  */
object SkewJoin {

  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val saltCol = "__salt"
    require(!big.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"column $saltCol is reserved by saltedEquiJoin")
    // deterministic uniform salt: hash of the whole big row spreads even
    // single-key data; monotonically_increasing_id would break retries
    val salted = big.withColumn(saltCol,
      pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(buckets)))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }
}
