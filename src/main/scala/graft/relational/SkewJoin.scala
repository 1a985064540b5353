package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the cases AQE can't fix (SURVEY.md §4.4 "hub
  * nodes"): pre-aggregated broadcast is impossible and one join key holds a
  * disproportionate share of the big side (e.g. a `LineNumber` dimension
  * node shared by every bulletin, or a power-law user in `events`).
  *
  * Classic salting: the skewed (big) side gets a uniform random-free
  * deterministic salt derived from a row-unique column; the small side is
  * exploded `saltBuckets` ways so every salted key still finds its match.
  * One shuffle either way — the win is that the hot key's rows now spread
  * over `saltBuckets` reducers instead of one straggler.
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `key`, with the big side salted by
    * `pmod(xxhash64(saltFrom), saltBuckets)`. `saltFrom` must be a column
    * on `big` with high cardinality (a row id).
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      saltFrom: String, saltBuckets: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(col(saltFrom)), lit(saltBuckets)).cast("int"))
    val exploded = small.withColumn("_salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }
}
