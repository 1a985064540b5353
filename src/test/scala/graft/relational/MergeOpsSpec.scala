package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeOpsSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def oldDf: DataFrame = {
    import spark.implicits._
    Seq((1L, "a", Some(10.0)), (2L, "b", Some(20.0)),
      (3L, "c", None: Option[Double]))
      .toDF("k", "name", "v")
  }

  test("mergeInto: matched rows updated, unmatched survive, new inserted") {
    import spark.implicits._
    val src = Seq((2L, "b2", Some(99.0)), (4L, "d", Some(40.0)))
      .toDF("k", "name", "v")
    val out = MergeOps.mergeInto(oldDf, src, Seq("k"))
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out(1).getString(1) == "b2" && out(1).getDouble(2) == 99.0)
    assert(out(0).getString(1) == "a") // untouched survivor
  }

  test("mergeInto is idempotent: merging the same source twice = once") {
    import spark.implicits._
    val src = Seq((2L, "b2", Some(99.0)), (4L, "d", Some(40.0)))
      .toDF("k", "name", "v")
    val once = MergeOps.mergeInto(oldDf, src, Seq("k"))
    val twice = MergeOps.mergeInto(once, src, Seq("k"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("cdcDiff tags insert/delete/update/unchanged, null-safely") {
    import spark.implicits._
    // k=1 unchanged; k=2 update; k=3 null→value update; k=5 insert;
    // and dropping k=2's sibling? (delete via a missing key: k=99)
    val newDf = Seq((1L, "a", Some(10.0)), (2L, "b", Some(21.0)),
      (3L, "c", Some(1.0)), (5L, "e", Some(50.0)))
      .toDF("k", "name", "v")
    val tags = MergeOps.cdcDiff(oldDf, newDf, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tags == Map(1L -> "unchanged", 2L -> "update", 3L -> "update",
      5L -> "insert"))
    // delete: a key present only in old
    val del = MergeOps.cdcDiff(oldDf, newDf.filter(col("k") =!= 1L),
      Seq("k")).filter(col("op") === "delete")
      .collect().map(_.getLong(0)).toSeq
    assert(del == Seq(1L))
    // null == null must be unchanged (null-safe struct compare)
    val same = MergeOps.cdcDiff(oldDf, oldDf, Seq("k"))
      .collect().map(_.getString(1)).toSet
    assert(same == Set("unchanged"))
  }
}
