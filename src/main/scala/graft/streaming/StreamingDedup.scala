package graft.streaming

import graft.text.{DedupKnobs, TextQueries}
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** A document arriving on the ingest stream. */
final case class DocText(doc_id: Long, text: String)

/** One LSH band-bucket row: the stateful key is (band, bandKey) — only
  * documents agreeing on a FULL band ever meet, exactly the batch kernel's
  * bucket-join key.
  */
final case class BandedDoc(bucket: String, doc_id: Long, sig: Seq[Long])

/** A detected near-duplicate candidate: `doc_b` (the newly arrived side)
  * collided with the already-ingested `doc_a` in some band;
  * `est_jaccard` = matching signature components / SEEDS (the standard
  * MinHash similarity estimate, computable without re-reading either text).
  */
final case class DupPair(doc_a: Long, doc_b: Long, est_jaccard: Double)

/** Per-bucket membership state: every new document in the bucket is
  * compared against the members seen SO FAR (any batch, any session —
  * the list lives in RocksDB), then appended. `maxBucket` caps hot
  * buckets the same way the batch family's DF cap does: a bucket that
  * large is a stopword-signature cluster whose pairs carry no dedup
  * signal while costing O(bucket²) compares — new members still match
  * against the capped membership but stop growing it.
  */
class BandBucketProcessor(seeds: Int, maxBucket: Int)
    extends StatefulProcessor[String, BandedDoc, DupPair] {
  @transient private var members: ListState[BandedDoc] = _
  // doc_ids ever processed in this bucket — a SUPERSET of `members` once
  // the cap hits. Re-delivery must be a no-op even for docs that arrived
  // after the bucket was capped (compared-but-not-appended), so the
  // "seen" check cannot be derived from capped membership. One Long per
  // doc (no signature), so a hot bucket's seen-list stays cheap.
  @transient private var seenIds: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    members = getHandle.getListState[BandedDoc]("members",
      Encoders.product[BandedDoc], TTLConfig.NONE)
    seenIds = getHandle.getListState[Long]("seen",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(bucket: String, rows: Iterator[BandedDoc],
      timerValues: TimerValues): Iterator[DupPair] = {
    val prior = members.get().toSeq
    val seen = scala.collection.mutable.Set(seenIds.get().toSeq: _*)
    // deterministic intra-batch order: a batch delivering several docs to
    // one bucket must pair them the same way regardless of upstream
    // partitioning (doc_id order ≡ "arrival" order for same-batch rows)
    val fresh = rows.toSeq.sortBy(_.doc_id)
      .filter(d => !seen.contains(d.doc_id)) // source re-delivery is a no-op
      .distinctBy(_.doc_id)
    var current = prior
    val out = Seq.newBuilder[DupPair]
    fresh.foreach { d =>
      current.foreach { m =>
        val matching = m.sig.iterator.zip(d.sig.iterator)
          .count { case (x, y) => x == y }
        out += DupPair(math.min(m.doc_id, d.doc_id),
          math.max(m.doc_id, d.doc_id), matching.toDouble / seeds)
      }
      seenIds.appendValue(d.doc_id) // recorded even when the cap blocks
      if (current.size < maxBucket) {
        members.appendValue(d)
        current = current :+ d
      }
    }
    out.result().iterator
  }
}

/** Streaming incremental near-dedup (the streaming face of the l2 MinHash
  * family): every arriving document is checked against EVERYTHING ingested
  * before it, across batches and restarts, in O(its own bucket sizes) —
  * never a scan of the corpus.
  *
  * Shape: the signature is per-row arithmetic → computed inline in the
  * stream (flatMap, no shuffle, no state); only bucket MEMBERSHIP is
  * stateful, keyed by (band, bandKey) exactly like the batch kernel's
  * bucket join, so state is partitioned by bucket and scales horizontally.
  * The pair set it emits provably equals [[TextQueries.minhashPairs]] on
  * the same documents (same tokenize/shingle/hash/band formulas, see
  * [[TextQueries.minhashBands]]) — asserted end-to-end in
  * StreamingDedupSpec, including pairs straddling ingest batches and a
  * RocksDB checkpoint restart.
  */
object StreamingDedup {
  def nearDupPairs(spark: SparkSession, docs: Dataset[DocText],
      kn: DedupKnobs = DedupKnobs.Test,
      maxBucket: Int = 1024): Dataset[DupPair] = {
    import spark.implicits._
    docs.flatMap(d => TextQueries.minhashBands(d.text, kn)
        .map { case (band, key, sig) =>
          BandedDoc(s"$band:$key", d.doc_id, sig) })
      .groupByKey(_.bucket)
      .transformWithState(new BandBucketProcessor(kn.seeds, maxBucket),
        TimeMode.None(), OutputMode.Update())
  }
}
