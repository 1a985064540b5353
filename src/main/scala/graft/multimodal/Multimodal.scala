package graft.multimodal

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded media metadata (typed side of an opaque binary payload). */
final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long,
    width: Int, height: Int, n_frames: Int)

/** Multimodal-column plumbing (north star): media as opaque `binary`
  * columns + typed metadata, with decode/feature-extract running batched
  * per partition — the Scala analogue of a `mapInPandas` batch UDF.
  *
  * The actual codec call is STUBBED (no image/audio libraries in this
  * environment): [[FakeCodec.decode]] derives deterministic dimensions from
  * the payload bytes. The Spark-side contract — binary column, schema,
  * partition-batched execution, typed output — is real and tested; swapping
  * in a real decoder touches only the codec seam.
  */
object Multimodal {

  /** A real decoder would parse the container header here. Deterministic
    * fake: dimensions derived from payload length and first/last byte.
    */
  object FakeCodec {
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val len = payload.length
      val kind = (len % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      MediaMeta(docId, kind, len.toLong,
        width = (len % 64) + 16,
        height = ((len / 7) % 64) + 16,
        n_frames = (len % 10) + 1)
    }
  }

  /** 60-bit average-hash perceptual fingerprint (the aHash member of the
    * pHash family, DCT stubbed like the rest of the codec): byte stream
    * split into 60 balanced segments, bit j set iff segment j's mean byte
    * exceeds the global mean. All-integer comparison (cross-multiplied, no
    * division) so the oracle reproduces it bit-for-bit. 60 bits — not 64 —
    * keeps every `1 << j` term positive in both engines, sidestepping the
    * sign-bit literal dance the 64-bit SimHash needs.
    */
  def aHash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val segSum = new Array[Long](60)
    val segCnt = new Array[Long](60)
    var tot = 0L
    var p = 0
    while (p < n) {
      val j = (p * 60) / n
      val b = (bytes(p) & 0xff).toLong
      segSum(j) += b
      segCnt(j) += 1
      tot += b
      p += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) {
      if (segSum(j) * n > tot * segCnt(j)) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** Per-partition perceptual hashing of "image" payloads — same codec
    * seam as [[decodeAll]] (a real pHash decodes pixels + DCT here).
    */
  def phashes(s: SparkSession, payloads: DataFrame): DataFrame = {
    import s.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.collect {
          case (id, bytes) if bytes.length % 3 == 0 => (id, aHash(bytes))
        }
      }
      .toDF("doc_id", "phash")
  }

  /** documents → (doc_id, payload binary) — the "raw media" table shape.
    * Payload is the UTF-8 encoding of `text` standing in for media bytes.
    */
  def payloadTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Batched decode over partitions: one codec context per partition (the
    * expensive init a real decoder amortizes), rows streamed through it.
    */
  def decodeAll(s: SparkSession, payloads: DataFrame): Dataset[MediaMeta] = {
    import s.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "codec init" would go here
        rows.map { case (id, bytes) => FakeCodec.decode(id, bytes) }
      }
  }

  /** Windowed "audio" feature extraction: chunk the payload into fixed-size
    * windows and compute per-window byte statistics — the batch shape of a
    * spectrogram/MFCC pass, with the DSP stubbed to byte averages. Runs in
    * `mapPartitions` so a real DSP context initializes once per partition.
    */
  final case class AudioWindow(doc_id: Long, window_idx: Int,
      n_bytes: Int, mean_byte: Double)

  def audioWindows(s: SparkSession, payloads: DataFrame,
      windowSize: Int = 64): org.apache.spark.sql.Dataset[AudioWindow] = {
    import s.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          bytes.grouped(windowSize).zipWithIndex.map { case (w, i) =>
            AudioWindow(id, i, w.length,
              w.map(b => (b & 0xff).toDouble).sum / w.length)
          }
        }
      }
  }

  /** Frame sampling for "video" media: one row per sampled frame with a
    * deterministic frame fingerprint — the shape a real frame-decode
    * fan-out produces (explode bounded by metadata, no driver loop).
    * Input: decoded metadata with (doc_id, kind, n_frames).
    */
  def frameSample(meta: DataFrame): DataFrame =
    meta.filter(col("kind") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(1), col("n_frames"))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        expr("CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':'," +
          " CAST(frame_idx AS STRING))), 1, 15), 16, 10) AS BIGINT)")
          .as("frame_fp"))
      .orderBy("doc_id", "frame_idx")

  /** 16×16 patch grid per "image": one row per tile with its pixel
    * rectangle (edge tiles clamped) — the fan-out a ViT-style patch
    * extractor runs, bounded by metadata, no driver loop.
    * Input: decoded metadata with (doc_id, kind, width, height).
    */
  def tileGrid(meta: DataFrame): DataFrame =
    meta.filter(col("kind") === "image")
      .select(col("doc_id"), col("width"), col("height"),
        ceil(col("width") / 16.0).cast("int").as("tx"),
        ceil(col("height") / 16.0).cast("int").as("ty"))
      .select(col("doc_id"), col("width"), col("height"), col("tx"),
        explode(sequence(lit(0), col("tx") * col("ty") - 1)).as("tile_id"))
      .select(col("doc_id"), col("tile_id").cast("int").as("tile_id"),
        expr("CAST(tile_id % tx AS INT)").as("tile_x"),
        expr("CAST(tile_id div tx AS INT)").as("tile_y"),
        expr("CAST(least(16, width - (tile_id % tx) * 16) AS INT)")
          .as("tile_w"),
        expr("CAST(least(16, height - (tile_id div tx) * 16) AS INT)")
          .as("tile_h"))
      .orderBy("doc_id", "tile_id")

  /** The decode pipeline as an oracle-checkable query: the fake codec is
    * pure arithmetic on the payload length, so DuckDB reproduces it.
    */
  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "mm4_audio_windows",
      // the fake DSP is pure byte arithmetic, so DuckDB reproduces it:
      // 64-byte windows, per-window byte mean. The corpus text is ASCII
      // (verified at every SF), so ascii(substring(text, j, 1)) IS byte j;
      // a non-ASCII corpus would need a blob-indexing oracle instead.
      s"""WITH b AS (
         |  SELECT doc_id, text, octet_length(encode(text)) AS n
         |  FROM documents WHERE doc_id % 3 = 1),
         |wi AS (
         |  SELECT doc_id, text, n, unnest(generate_series(0,
         |    CAST(ceil(n / 64.0) AS BIGINT) - 1)) AS wi
         |  FROM b),
         |w AS (
         |  SELECT doc_id, CAST(wi AS INT) AS window_idx,
         |    CAST(least(64, n - wi * 64) AS INT) AS n_bytes,
         |    list_transform(generate_series(wi * 64 + 1, least((wi + 1) * 64, n)),
         |      j -> ascii(substring(text, j, 1))) AS bs
         |  FROM wi)
         |SELECT doc_id, window_idx, n_bytes,
         |  ${graft.Det.duckPortableRound(
             "CAST(list_sum(bs) AS DOUBLE) / CAST(n_bytes AS DOUBLE)", 6)}
         |    AS mean_byte
         |FROM w ORDER BY doc_id, window_idx""".stripMargin) { (s, d) =>
      audioWindows(s, payloadTable(s, d)
        .filter(col("doc_id") % 3 === 1)) // the "audio" slice
        .toDF()
        .select(col("doc_id"), col("window_idx"), col("n_bytes"),
          graft.Det.portableRound(col("mean_byte"), 6).as("mean_byte"))
        .orderBy("doc_id", "window_idx")
    },
    QueryDef.sql(
      "mm1_decode_meta",
      """SELECT doc_id,
        |  CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'image'
        |       WHEN octet_length(encode(text)) % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 64 + 16 AS INT) AS width,
        |  CAST((octet_length(encode(text)) // 7) % 64 + 16 AS INT) AS height,
        |  CAST(octet_length(encode(text)) % 10 + 1 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      decodeAll(s, payloadTable(s, d)).toDF().orderBy("doc_id")
    },
    QueryDef.sql(
      "mm3_frame_sample",
      // frame sampling for "video" payloads: one row per sampled frame with
      // a deterministic frame fingerprint — the shape a real frame-decode
      // fan-out produces (explode bounded by metadata, no driver loop)
      """SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR), ':',
        |    CAST(frame_idx AS VARCHAR))), 1, 15)) AS BIGINT) AS frame_fp
        |FROM (SELECT doc_id, octet_length(encode(text)) % 10 + 1 AS n_frames
        |      FROM documents
        |      WHERE octet_length(encode(text)) % 3 = 2) v
        |CROSS JOIN generate_series(1, 10) t(frame_idx)
        |WHERE frame_idx <= n_frames
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      frameSample(decodeAll(s, payloadTable(s, d)).toDF())
    },
    QueryDef.sql(
      "mm2_media_stats",
      """SELECT kind, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(max(width) AS INT) AS max_w, CAST(max(height) AS INT) AS max_h
        |FROM (SELECT
        |  CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'image'
        |       WHEN octet_length(encode(text)) % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  octet_length(encode(text)) % 64 + 16 AS width,
        |  (octet_length(encode(text)) // 7) % 64 + 16 AS height
        |  FROM documents) t
        |GROUP BY kind ORDER BY kind""".stripMargin) { (s, d) =>
      decodeAll(s, payloadTable(s, d)).toDF()
        .groupBy("kind")
        .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"),
          max("width").as("max_w"), max("height").as("max_h"))
        .orderBy("kind")
    },
    QueryDef.sql(
      "mm5_tile_grid",
      // 16×16 patch grid per "image": one row per tile with its pixel
      // rectangle (edge tiles clamped) — the fan-out a ViT-style patch
      // extractor runs, bounded by metadata, no driver loop
      """WITH m AS (SELECT doc_id,
        |    octet_length(encode(text)) % 64 + 16 AS width,
        |    (octet_length(encode(text)) // 7) % 64 + 16 AS height
        |  FROM documents WHERE octet_length(encode(text)) % 3 = 0),
        |g AS (SELECT doc_id, width, height,
        |    CAST(ceil(width / CAST(16 AS DOUBLE)) AS INT) AS tx,
        |    CAST(ceil(height / CAST(16 AS DOUBLE)) AS INT) AS ty FROM m)
        |SELECT doc_id, CAST(tile_id AS INT) AS tile_id,
        |  CAST(tile_id % tx AS INT) AS tile_x,
        |  CAST(tile_id // tx AS INT) AS tile_y,
        |  CAST(least(16, width - (tile_id % tx) * 16) AS INT) AS tile_w,
        |  CAST(least(16, height - (tile_id // tx) * 16) AS INT) AS tile_h
        |FROM g CROSS JOIN generate_series(0, 63) t(tile_id)
        |WHERE tile_id < tx * ty
        |ORDER BY doc_id, tile_id""".stripMargin) { (s, d) =>
      decodeAll(s, payloadTable(s, d)).toDF()
        .filter(col("kind") === "image")
        .select(col("doc_id"), col("width"), col("height"),
          ceil(col("width") / 16.0).cast("int").as("tx"),
          ceil(col("height") / 16.0).cast("int").as("ty"))
        .select(col("doc_id"), col("width"), col("height"), col("tx"),
          explode(sequence(lit(0), col("tx") * col("ty") - 1)).as("tile_id"))
        .select(col("doc_id"), col("tile_id").cast("int").as("tile_id"),
          expr("CAST(tile_id % tx AS INT)").as("tile_x"),
          expr("CAST(tile_id div tx AS INT)").as("tile_y"),
          expr("CAST(least(16, width - (tile_id % tx) * 16) AS INT)")
            .as("tile_w"),
          expr("CAST(least(16, height - (tile_id div tx) * 16) AS INT)")
            .as("tile_h"))
        .orderBy("doc_id", "tile_id")
    },
    QueryDef.sql(
      "mm6_phash",
      // per-image 60-bit perceptual fingerprint — the oracle recomputes
      // every bit from the bytes independently, so a hash match here is
      // bit-exact evidence for the whole aHash pipeline
      s"""WITH $duckPhashCtes
         |SELECT doc_id, phash FROM fp ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        phashes(s, payloadTable(s, d)).orderBy("doc_id")
    },
    QueryDef.sql(
      "mm7_phash_neardup",
      // perceptual near-dup pairs over the "image" slice: aHash in the
      // codec seam, then the SAME banded-Hamming machinery as the SimHash
      // text path. Test knobs: 10 bands × 6 bits ⇒ full recall at Hamming
      // ≤ 9 by pigeonhole (the synthetic corpus's closest image pair sits
      // at Hamming 8); production widens bands and tightens the threshold
      // exactly as DedupKnobs documents for SimHash — 64 buckets/band is a
      // test value, never a billion-image setting. The oracle recomputes
      // the hash from bytes and brute-forces all image pairs — same
      // answer, sub-quadratic engine plan.
      s"""WITH $duckPhashCtes,
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    bit_count(xor(a.phash, b.phash)) AS hamming
         |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
         |FROM p WHERE hamming <= 9 ORDER BY doc_a, doc_b""".stripMargin) {
      (s, d) =>
        graft.functions.HammingDistance.register(s)
        val fps = phashes(s, payloadTable(s, d)).localCheckpoint()
        def banded(idCol: String, fpCol: String): DataFrame =
          fps.select(col("doc_id").as(idCol), col("phash").as(fpCol))
            .withColumn("band", explode(expr(
              s"transform(sequence(0, 9)," +
                s" b -> concat(b, ':', shiftright($fpCol, b * 6) & 63))")))
        banded("doc_a", "fp_a").join(banded("doc_b", "fp_b"), Seq("band"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "fp_a", "doc_b", "fp_b").distinct()
          .withColumn("hamming", expr("graft_hamming(fp_a, fp_b)"))
          .filter(col("hamming") <= 9)
          .select("doc_a", "doc_b", "hamming")
          .orderBy("doc_a", "doc_b")
    }
  )

  /** DuckDB CTE chain ending in `fp(doc_id, phash)` — the byte-level
    * mirror of [[aHash]] over the "image" slice.
    */
  private def duckPhashCtes: String =
    """img AS (SELECT doc_id, text, octet_length(encode(text)) AS n
      |  FROM documents WHERE octet_length(encode(text)) % 3 = 0),
      |by AS (SELECT doc_id, n, unnest(generate_series(1, n)) AS i, text
      |  FROM img),
      |bv AS (SELECT doc_id, n, i,
      |    ascii(substring(text, CAST(i AS INT), 1)) AS b FROM by),
      |seg AS (SELECT doc_id, n, ((i - 1) * 60) // n AS j,
      |    CAST(sum(b) AS BIGINT) AS ss, count(*) AS sc
      |  FROM bv GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, CAST(sum(b) AS BIGINT) AS tb
      |  FROM bv GROUP BY doc_id),
      |fp AS (SELECT s.doc_id,
      |    CAST(sum(CASE WHEN s.ss * s.n > t.tb * s.sc
      |      THEN CAST(1 AS BIGINT) << CAST(s.j AS INT)
      |      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS phash
      |  FROM seg s JOIN tot t USING (doc_id) GROUP BY s.doc_id)""".stripMargin
}
