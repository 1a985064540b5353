package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (X2, SURVEY.md §2.C): element-wise vector centroid.
  * Buffer = (running per-dimension sums, count); merge is associative and
  * commutative, so Catalyst runs it partial+final like any built-in
  * aggregate — the 100-TB-safe shape for custom aggregation.
  */
object CentroidAgg
    extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double])
      : (Array[Double], Long) = {
    if (b._1.isEmpty) (v.toArray, 1L)
    else {
      val s = b._1
      var i = 0
      val n = math.min(s.length, v.length)
      while (i < n) { s(i) += v(i); i += 1 }
      (s, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long))
      : (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      val s = a._1
      var i = 0
      val n = math.min(s.length, b._1.length)
      while (i < n) { s(i) += b._1(i); i += 1 }
      (s, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty
    else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.product[(Array[Double], Long)]

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
