package graft.relational

import graft.{SparkEntry, SparkSpec}

/** Regression pin for the one relational query the DuckDB oracle cannot
  * hash-check: `g4_approx_distinct` (HLL sketches differ engine-to-engine
  * by design, so the driver records rows-only). Spark's
  * `approx_count_distinct` is DETERMINISTIC for a given input multiset —
  * the sketch is a pure fold over value hashes, independent of
  * partitioning or row order — so its exact outputs at sf0.01 are pinned
  * here. A Spark upgrade that changes the HLL implementation, or any
  * accidental edit to the query, trips this spec instead of sliding
  * through the rows-only gate unnoticed. (The oracle-exact sketch path is
  * `g4b_kmv_sketch`/`g4b_prod_knobs`; the true distinct count per flag at
  * sf0.01 is 2000 — the pinned 1947 estimates sit within HLL's documented
  * 5% default error.)
  */
class G4SnapshotSpec extends SparkSpec {

  test("g4 HLL estimates at sf0.01 are pinned") {
    val got = SparkEntry.queries("g4_approx_distinct")(spark, sf("sf0.01"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    assert(got == Seq(("A", 1947L), ("N", 1947L), ("R", 1947L)),
      s"HLL snapshot drifted: $got")
  }
}
