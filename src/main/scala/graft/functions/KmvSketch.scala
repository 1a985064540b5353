package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer

/** KMV (k-minimum-values) distinct-count sketch buffer: keeps the k
  * smallest 64-bit hashes seen. Mergeable by union-then-truncate, so the
  * aggregate runs partial+final like any built-in — the mergeability that
  * makes sketches work at 100 TB.
  */
final class KmvBuffer(val k: Int) {
  // sorted ascending; size <= k
  var values: java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    if (values.size < k) { values.add(h); () }
    else if (h < values.last()) {
      if (values.add(h)) { values.remove(values.last()); () }
    }
  }

  def merge(o: KmvBuffer): Unit = {
    val it = o.values.iterator()
    while (it.hasNext) add(it.next())
  }

  /** Standard KMV estimator: (k-1) / (kth-min as a fraction of hash space);
    * exact count when fewer than k values seen. Hashes live in [0, 2^60)
    * (see [[KmvSketch]]), so the fraction divides by 2^60.
    */
  def estimate: Long =
    if (values.size < k) values.size.toLong
    else {
      val kth = values.last().toDouble / KmvBuffer.HashSpace
      math.round((k - 1) / kth)
    }
}

object KmvBuffer {
  /** 2^60 as an (exactly representable) double. */
  val HashSpace: Double = 1152921504606846976.0
}

/** Custom `TypedImperativeAggregate` (the machinery tier below typed
  * Aggregators): a serializable mutable sketch buffer with explicit
  * partial/merge/final phases. `approx_count_distinct` (HLL) is the
  * built-in answer (SURVEY.md §2.C G4); this demonstrates the extension
  * point a novel sketch would use.
  */
case class KmvSketch(
    child: Expression,
    k: Int = 1024, // rel. std error ≈ 1/sqrt(k-2) ≈ 3%; buffer = 8k bytes
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_kmv_distinct"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val s = v match {
        case u: UTF8String => u.toString
        case other         => other.toString
      }
      buf.add(portableHash(s))
    }
    buf
  }

  @transient private lazy val md5Local
      : java.lang.ThreadLocal[java.security.MessageDigest] =
    java.lang.ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The repo-wide engine-portable hash (value of the first 15 hex digits
    * of md5, a uniform 60-bit integer — `graft.text.PortableHash`), computed
    * here on raw digest bytes. Using the shared hash makes the SKETCH ITSELF
    * oracle-checkable: DuckDB reproduces the exact estimate, not just its
    * error band. A production deployment that doesn't need cross-engine
    * determinism would swap in xxhash64 at this seam.
    */
  private def portableHash(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val b = md.digest(s.getBytes("UTF-8"))
    var h = 0L
    var j = 0
    while (j < 15) { // 15 hex nibbles = high 60 bits of the first 8 bytes
      val nib =
        if (j % 2 == 0) (b(j / 2) >> 4) & 0xf
        else b(j / 2) & 0xf
      h = (h << 4) | nib
      j += 1
    }
    h
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: KmvBuffer): Any = buf.estimate

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (buf.values.size + 2))
    bb.putLong(buf.k.toLong)
    bb.putLong(buf.values.size.toLong)
    val it = buf.values.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getLong.toInt)
    val n = bb.getLong
    var i = 0L
    while (i < n) { buf.values.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** Register `graft_kmv_distinct(col)` on the session (idempotent).
    * `k` sizes the sketch: rel. std error ≈ 1/sqrt(k-2), buffer = 8k bytes.
    */
  def register(spark: SparkSession, name: String = "graft_kmv_distinct",
      k: Int = 1024): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => KmvSketch(exprs.head, k = k).toAggregateExpression(),
      "internal")
}
