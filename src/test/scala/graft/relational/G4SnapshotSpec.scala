package graft.relational

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Regression pin for the HLL approximate-distinct path. The registered,
  * oracle-graded G4 face is `g4b_kmv_sketch` (KMV order statistics —
  * engine-portable, DuckDB reproduces it exactly); Spark's own
  * `approx_count_distinct` HLL is pinned HERE instead of riding a
  * rows-only correctness row, because HLL sketches differ
  * engine-to-engine by design. The estimate is DETERMINISTIC for a given
  * input multiset — the sketch is a pure fold over value hashes,
  * independent of partitioning or row order — so its exact outputs at
  * sf0.01 are pinned. A Spark upgrade that changes the HLL
  * implementation, or any accidental edit, trips this spec instead of
  * sliding through a rows-only gate unnoticed. (True distinct count per
  * flag at sf0.01 is 2000 — the pinned 1947 estimates sit within HLL's
  * documented 5% default error.)
  */
class G4SnapshotSpec extends SparkSpec {

  test("g4 HLL estimates at sf0.01 are pinned") {
    val got = Tables.lineitem(spark, sf("sf0.01")).groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy("l_returnflag")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    assert(got == Seq(("A", 1947L), ("N", 1947L), ("R", 1947L)),
      s"HLL snapshot drifted: $got")
  }
}
