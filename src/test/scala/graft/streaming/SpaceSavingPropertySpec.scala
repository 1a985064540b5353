package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The SpaceSaving sketch's guarantees, property-tested over arbitrary
  * batch sequences against exact truth (no Spark needed — the merge step
  * is pure; [[HeavyHitterStreamSpec]] covers the streaming wiring):
  *   1. capacity is NEVER exceeded;
  *   2. for every tracked item, est − err ≤ true ≤ est;
  *   3. every item with true count > N/capacity is tracked
  *      (the heavy-hitter completeness theorem, Metwally et al. 2005);
  *   4. batch boundaries are transparent: re-splitting any batch at a
  *      sorted-run boundary yields the identical counter table (what
  *      makes micro-batch sizing semantically invisible).
  */
object SpaceSavingPropertySpec extends Properties("streaming.spacesaving") {

  private val batches: Gen[List[List[Long]]] =
    Gen.listOfN(4, Gen.listOf(Gen.chooseNum(0L, 30L)))
  private val caps: Gen[Int] = Gen.chooseNum(1, 8)

  private def runAll(bs: List[List[Long]], cap: Int)
      : Map[Long, (Long, Long)] =
    bs.foldLeft(Map.empty[Long, (Long, Long)]) { (cur, b) =>
      SpaceSaving.merge(cur,
        b.groupBy(identity).view.mapValues(_.size.toLong).toMap, cap)
    }

  property("capacity, est/err bounds, heavy-hitter completeness") =
    forAll(batches, caps) { (bs, cap) =>
      val fin = runAll(bs, cap)
      val truth = bs.flatten.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val n = bs.flatten.size.toLong
      val boundsOk = fin.forall { case (u, (est, err)) =>
        val t = truth.getOrElse(u, 0L)
        est >= t && est - err <= t
      }
      val heaviesOk = truth.forall { case (u, t) =>
        t * cap <= n || fin.contains(u)
      }
      fin.size <= cap && boundsOk && heaviesOk
    }

  property("batch boundaries are transparent to the counter table") =
    forAll(batches, caps) { (bs, cap) =>
      val whole = runAll(bs, cap)
      val resplit = bs.flatMap { b =>
        val sorted = b.sorted
        val half = sorted.take(sorted.size / 2)
        // cut at a run boundary so each item's occurrences stay within
        // one sub-batch
        val cut = half.lastOption match {
          case Some(x) => sorted.span(_ <= x)
          case None => (half, sorted.drop(half.size))
        }
        List(cut._1, cut._2)
      }
      runAll(resplit, cap) == whole
    }
}
