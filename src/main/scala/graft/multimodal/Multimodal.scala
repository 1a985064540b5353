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
  * All three MEDIA payload paths run REAL codecs end-to-end:
  *  - IMAGE: [[bmpTable]] renders each "image" document as an actual
  *    24-bit BMP and the perceptual-hash queries (mm6/mm7) run
  *    [[Bmp.decode]] — a genuine header/pixel-layout parse — then hash
  *    the decoded 8×8 luma grid ([[Bmp.aHash64]]).
  *  - AUDIO: [[wavTable]] renders the audio slice as actual RIFF/WAVE
  *    16-bit PCM files and [[audioWindows]] (mm4) computes its windowed
  *    statistics over samples parsed by [[Wav.decode]] — a genuine chunk
  *    walk with fmt validation and sign-extended little-endian samples.
  *  - VIDEO: [[aviTable]] renders the video slice as actual
  *    uncompressed-DIB AVI files and [[frameStats]] (mm8) samples and
  *    averages frames parsed by [[Avi.decode]] — a genuine nested
  *    RIFF/LIST walk collecting 00db frame chunks.
  * Only the METADATA decode (mm1/mm2) remains the documented stub seam:
  * [[FakeCodec.decode]] derives deterministic metadata from payload
  * bytes, standing in for a codec-library probe; swapping in a real
  * prober touches only that function — the Spark-side contract (binary
  * column, schema, partition-batched execution, typed output) is
  * identical.
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

  /** The "image" slice of the corpus rendered as REAL BMP files: each
    * document whose text-byte length n is a positive multiple of 3 (the
    * same slice [[FakeCodec]] labels "image") becomes a grayscale
    * (n%24+8)×((n/7)%24+8) 24-bit BMP whose pixel at logical position p
    * is text byte p mod n. The generator is trivially mirrorable in SQL —
    * which is exactly what lets the oracle grade a REAL decode: DuckDB
    * recomputes the hash from the generator formula, Spark recovers the
    * same pixels by parsing the actual BMP byte layout. Any decoder bug
    * (row order, padding, channel order, header offsets) hash-misses.
    * Empty documents are excluded on BOTH sides (a 0-byte payload has no
    * pixels — and the SQL mirror's generate_series would silently drop
    * the row while a naive engine side emitted fp=0).
    */
  def bmpTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("tb"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.collect { case (id, t) if t.length > 0 && t.length % 3 == 0 =>
          val n = t.length
          (id, Bmp.encode(n % 24 + 8, (n / 7) % 24 + 8,
            p => t(p % n) & 0xff))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Per-partition perceptual hashing of image payloads: a REAL codec
    * parse (BMP by default; pass [[Png.decode]] for PNG payloads) then
    * the classic 8×8-luma average hash over the DECODED pixels. One
    * decoder context per partition — the batch shape a `mapInPandas`
    * image pipeline uses.
    */
  def phashes(s: SparkSession, payloads: DataFrame,
      decoder: Array[Byte] => Bmp.Image = Bmp.decode): DataFrame = {
    import s.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) => (id, Bmp.aHash64(decoder(bytes))) }
      }
      .toDF("doc_id", "phash")
  }

  /** The `% 3 == 1` document slice rendered as REAL 8-bit grayscale PNGs:
    * a (n%21+8)×((n/5)%21+8) image whose pixel at logical position p is
    * text byte p mod n — same mirrorable-generator discipline as
    * [[bmpTable]], but the engine-side parse now crosses a DEFLATE
    * stream, CRC-verified chunks, and the five scanline filters
    * ([[Png]]). The encoder cycles filter types per row, so the oracle
    * hash-compare grades every unfilter path, Paeth included.
    */
  def pngTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("tb"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.collect { case (id, t) if t.length > 0 && t.length % 3 == 1 =>
          val n = t.length
          (id, Png.encode(n % 21 + 8, (n / 5) % 21 + 8,
            p => t(p % n) & 0xff))
        }
      }
      .toDF("doc_id", "payload")
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

  /** The "audio" slice of the corpus rendered as REAL RIFF/WAVE files:
    * each document in the mm4 slice becomes a mono 16-bit PCM WAV whose
    * sample k is `(textByte(k) - 128) * 256` — byte-derived, so the SQL
    * oracle can recompute every sample from the text without parsing the
    * container, which is exactly what lets it grade a REAL decode (any
    * [[Wav.decode]] bug in chunk offsets, endianness, or sign extension
    * hash-misses). Same construction as [[bmpTable]] for images.
    */
  def wavTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("tb"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, t) =>
          val samples = new Array[Short](t.length)
          var i = 0
          while (i < t.length) {
            samples(i) = (((t(i) & 0xff) - 128) * 256).toShort
            i += 1
          }
          (id, Wav.encode(8000, samples))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Windowed audio feature extraction over a REAL codec parse: decode
    * the RIFF/WAVE payload ([[Wav.decode]]), chunk the PCM samples into
    * fixed-size windows, and compute the per-window mean and RMS energy —
    * the batch shape of a spectrogram/MFCC pass, with the statistics over
    * DECODED SAMPLES. Runs in `mapPartitions` so a real DSP context
    * initializes once per partition. The per-window integer sums (sum,
    * sum of squares) stay exact; the division and sqrt happen once per
    * window.
    */
  final case class AudioWindow(doc_id: Long, window_idx: Int,
      n_samples: Int, mean_sample: Double, rms: Double)

  def audioWindows(s: SparkSession, payloads: DataFrame,
      windowSize: Int = 64): org.apache.spark.sql.Dataset[AudioWindow] = {
    import s.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val audio = Wav.decode(bytes)
          audio.samples.grouped(windowSize).zipWithIndex.map {
            case (w, i) =>
              var sum = 0L
              var sumSq = 0L
              var k = 0
              while (k < w.length) {
                val v = w(k).toLong
                sum += v; sumSq += v * v; k += 1
              }
              AudioWindow(id, i, w.length,
                sum.toDouble / w.length,
                math.sqrt(sumSq.toDouble / w.length))
          }
        }
      }
  }

  /** The "video" slice of the corpus rendered as REAL AVI files: each
    * document whose byte length n satisfies n % 3 == 2 (the slice
    * [[FakeCodec]] labels "video") becomes an uncompressed-DIB AVI of
    * (n%10+1) grayscale (n%16+8)×((n/3)%16+8) frames, where frame f's
    * pixel at logical position p is text byte (p + f·7919) mod n. The
    * generator is trivially mirrorable in SQL, which is what lets the
    * oracle grade a REAL container parse: DuckDB recomputes every frame
    * statistic from the formula, Spark recovers the same pixels by
    * walking the actual nested RIFF/LIST structure ([[Avi.decode]]).
    */
  def aviTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("tb"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.collect { case (id, t) if t.length % 3 == 2 =>
          val n = t.length
          val w = n % 16 + 8
          val h = (n / 3) % 16 + 8
          val nf = n % 10 + 1
          val frames = Array.tabulate(nf)(f =>
            Array.tabulate(w * h)(p => t((p + f * 7919) % n) & 0xff))
          (id, Avi.encode(w, h, frames))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Per-sampled-frame statistics over a REAL container parse: decode the
    * AVI ([[Avi.decode]]), keep every `stride`-th frame (the frame-sample
    * step a video pipeline runs before feature extraction), and compute
    * each kept frame's mean luma — integer pixel sum, one division per
    * frame. One decoder context per partition.
    */
  final case class FrameStat(doc_id: Long, frame_idx: Int, n_px: Int,
      mean_luma: Double)

  def frameStats(s: SparkSession, payloads: DataFrame,
      stride: Int = 3): Dataset[FrameStat] = {
    import s.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val video = Avi.decode(bytes)
          val npx = video.width * video.height
          video.frames.iterator.zipWithIndex.collect {
            case (fr, fi) if fi % stride == 0 =>
              var sm = 0L
              var p = 0
              while (p < fr.length) { sm += fr(p); p += 1 }
              FrameStat(id, fi, npx, sm.toDouble / npx)
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
      // REAL codec grading: the engine parses actual RIFF/WAVE payloads
      // (Wav.decode) while the oracle recomputes each 16-bit sample from
      // the generator formula `(byte - 128) * 256` on the raw text — the
      // container never reaches DuckDB, so any chunk-walk/endianness/sign
      // bug on the Spark side hash-misses. 64-sample windows, per-window
      // mean + RMS; integer sums exact, one division/sqrt per window.
      // The corpus text is ASCII (verified at every SF), so
      // ascii(substring(text, j, 1)) IS byte j.
      s"""WITH b AS (
         |  SELECT doc_id, text, octet_length(encode(text)) AS n
         |  FROM documents WHERE doc_id % 3 = 1),
         |wi AS (
         |  SELECT doc_id, text, n, unnest(generate_series(0,
         |    CAST(ceil(n / 64.0) AS BIGINT) - 1)) AS wi
         |  FROM b),
         |w AS (
         |  SELECT doc_id, CAST(wi AS INT) AS window_idx,
         |    CAST(least(64, n - wi * 64) AS INT) AS n_samples,
         |    list_transform(generate_series(wi * 64 + 1, least((wi + 1) * 64, n)),
         |      j -> (ascii(substring(text, j, 1)) - 128) * 256) AS ss
         |  FROM wi)
         |SELECT doc_id, window_idx, n_samples,
         |  ${graft.Det.duckPortableRound(
             "CAST(list_sum(ss) AS DOUBLE) / CAST(n_samples AS DOUBLE)", 6)}
         |    AS mean_sample,
         |  ${graft.Det.duckPortableRound(
             "sqrt(CAST(list_sum(list_transform(ss, x -> x * x)) AS DOUBLE)" +
               " / CAST(n_samples AS DOUBLE))", 6)}
         |    AS rms
         |FROM w ORDER BY doc_id, window_idx""".stripMargin) { (s, d) =>
      audioWindows(s, wavTable(s, d)
        .filter(col("doc_id") % 3 === 1)) // the "audio" slice
        .toDF()
        .select(col("doc_id"), col("window_idx"), col("n_samples"),
          graft.Det.portableRound(col("mean_sample"), 6).as("mean_sample"),
          graft.Det.portableRound(col("rms"), 6).as("rms"))
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
      // per-image 64-bit aHash over REAL decoded pixels: the engine parses
      // the actual BMP byte layout and hashes the decoded 8×8 luma grid;
      // the oracle recomputes every bit from the image GENERATOR formula
      // (pixel p = text byte p mod n), never seeing the BMP — so a hash
      // match is bit-exact evidence that decode recovered the true pixels
      // (any row-order/padding/channel/offset bug hash-misses)
      s"""WITH $duckPhashCtes
         |SELECT doc_id, phash FROM ph ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        phashes(s, bmpTable(s, d)).orderBy("doc_id")
    },
    QueryDef.sql(
      "mm7_phash_neardup",
      // perceptual near-dup pairs over REAL decoded pixels: BMP decode +
      // 8×8-luma aHash in the codec seam, then the SAME banded-Hamming
      // machinery as the SimHash text path. Test knobs: 16 bands × 4
      // bits ⇒ full recall at Hamming ≤ 15 by pigeonhole (the corpus's
      // text near-dups land at Hamming 13-15 as pixels: differing image
      // dims wrap the shared bytes differently, so pixel similarity is
      // softer than byte similarity); production widens bands and
      // tightens the threshold exactly as DedupKnobs documents for
      // SimHash — 16 buckets/band is a test value, never a billion-image
      // setting. The oracle recomputes the hash from the generator
      // formula and brute-forces all image pairs — same answer,
      // sub-quadratic engine plan.
      s"""WITH $duckPhashCtes,
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    bit_count(xor(a.phash, b.phash)) AS hamming
         |  FROM ph a JOIN ph b ON a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
         |FROM p WHERE hamming <= 15 ORDER BY doc_a, doc_b""".stripMargin) {
      (s, d) =>
        graft.functions.HammingDistance.register(s)
        val fps = phashes(s, bmpTable(s, d)).localCheckpoint()
        def banded(idCol: String, fpCol: String): DataFrame =
          fps.select(col("doc_id").as(idCol), col("phash").as(fpCol))
            .withColumn("band", explode(expr(
              s"transform(sequence(0, 15)," +
                s" b -> concat(b, ':', shiftright($fpCol, b * 4) & 15))")))
        banded("doc_a", "fp_a").join(banded("doc_b", "fp_b"), Seq("band"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "fp_a", "doc_b", "fp_b").distinct()
          .withColumn("hamming", expr("graft_hamming(fp_a, fp_b)"))
          .filter(col("hamming") <= 15)
          .select("doc_a", "doc_b", "hamming")
          .orderBy("doc_a", "doc_b")
    },
    QueryDef.sql(
      "mm8_frame_decode",
      // REAL container grading for video: the engine walks actual AVI
      // files (nested RIFF LISTs, strf validation, 00db DIB frames) while
      // the oracle recomputes every sampled frame's mean luma from the
      // frame GENERATOR formula (pixel p of frame f = text byte
      // (p + f·7919) mod n; gray BT.601 luma = the byte itself) — the
      // container never reaches DuckDB, so any bug in the LIST walk,
      // frame chunk collection, or bottom-up row layout hash-misses.
      // Every 3rd frame is kept (the sampling step), mean over an exact
      // integer pixel sum, one division per frame.
      s"""WITH v AS (
         |  SELECT doc_id, text, octet_length(encode(text)) AS n
         |  FROM documents WHERE octet_length(encode(text)) % 3 = 2),
         |m AS (SELECT doc_id, text, n, n % 16 + 8 AS w,
         |    (n // 3) % 16 + 8 AS h, n % 10 + 1 AS nf FROM v),
         |f AS (SELECT doc_id, text, n, w, h,
         |    unnest(generate_series(0, nf - 1)) AS fi FROM m),
         |px AS (
         |  SELECT doc_id, CAST(fi AS INT) AS frame_idx,
         |    CAST(w * h AS INT) AS n_px,
         |    list_sum(list_transform(generate_series(0, w * h - 1),
         |      p -> ascii(substring(text,
         |        CAST((p + fi * 7919) % n AS INT) + 1, 1)))) AS sm
         |  FROM f WHERE fi % 3 = 0)
         |SELECT doc_id, frame_idx, n_px,
         |  ${graft.Det.duckPortableRound(
             "CAST(sm AS DOUBLE) / CAST(n_px AS DOUBLE)", 6)} AS mean_luma
         |FROM px ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      frameStats(s, aviTable(s, d)).toDF()
        .select(col("doc_id"), col("frame_idx"), col("n_px"),
          graft.Det.portableRound(col("mean_luma"), 6).as("mean_luma"))
        .orderBy("doc_id", "frame_idx")
    },
    QueryDef.sql(
      "mm9_probe_meta",
      // REAL metadata probing (the ffprobe step): magic-byte sniff, then
      // the container's OWN header fields — BMP dims from the info
      // header, WAV rate/samples from fmt + data chunk sizes, AVI
      // dims/frame-count from avih — with media payloads never read.
      // The oracle recomputes every field (including each container's
      // exact encoded byte size) from the generator formulas; a probe
      // reading the wrong header offset hash-misses. Slices overlap (a
      // doc can be both the image and the audio slice), so the output
      // keys on (doc_id, kind).
      """WITH img AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents
        |  WHERE octet_length(encode(text)) % 3 = 0
        |    AND octet_length(encode(text)) > 0),
        |aud AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents
        |  WHERE doc_id % 3 = 1),
        |vid AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents
        |  WHERE octet_length(encode(text)) % 3 = 2),
        |u AS (
        |  SELECT doc_id, 'image' AS kind,
        |    CAST(54 + 4 * ((3 * (n % 24 + 8) + 3) // 4)
        |      * ((n // 7) % 24 + 8) AS BIGINT) AS n_bytes,
        |    CAST(n % 24 + 8 AS INT) AS width,
        |    CAST((n // 7) % 24 + 8 AS INT) AS height,
        |    CAST(1 AS INT) AS n_frames, CAST(-1 AS INT) AS sample_rate,
        |    CAST(-1 AS BIGINT) AS n_samples
        |  FROM img
        |  UNION ALL
        |  SELECT doc_id, 'audio', CAST(44 + 2 * n AS BIGINT),
        |    CAST(-1 AS INT), CAST(-1 AS INT), CAST(-1 AS INT),
        |    CAST(8000 AS INT), CAST(n AS BIGINT)
        |  FROM aud
        |  UNION ALL
        |  SELECT doc_id, 'video',
        |    CAST(224 + (n % 10 + 1) * (8 + 4 * ((3 * (n % 16 + 8) + 3) // 4)
        |      * ((n // 3) % 16 + 8)) AS BIGINT),
        |    CAST(n % 16 + 8 AS INT), CAST((n // 3) % 16 + 8 AS INT),
        |    CAST(n % 10 + 1 AS INT), CAST(-1 AS INT), CAST(-1 AS BIGINT)
        |  FROM vid)
        |SELECT doc_id, kind, n_bytes, width, height, n_frames,
        |  sample_rate, n_samples
        |FROM u ORDER BY doc_id, kind""".stripMargin) { (s, d) =>
      import s.implicits._
      bmpTable(s, d)
        .unionByName(wavTable(s, d).filter(col("doc_id") % 3 === 1))
        .unionByName(aviTable(s, d))
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          // one sniffing context per partition, headers only
          rows.map { case (id, bytes) => Probe.probe(id, bytes) }
        }
        .toDF()
        .orderBy("doc_id", "kind")
    },
    QueryDef.sql(
      "mm11_binary_ingest",
      // the OBJECT-STORAGE seam as a graded query (MediaIngestSpec pins
      // it as a spec; this row makes the driver exercise it every
      // round): real .bmp FILES on disk → the `binaryFile` datasource
      // (partitioned file listing, no driver-side reads) → REAL codec
      // decode per partition → per-file stats. The oracle recomputes
      // byte size, dimensions and the full-pixel luma sum from the
      // GENERATOR formulas (file pixel p = text byte p mod n) — the
      // files never reach DuckDB, so a wrong glob, a misparsed header,
      // or a truncated pixel walk hash-misses.
      """WITH img AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n
        |  FROM documents
        |  WHERE octet_length(encode(text)) % 3 = 0
        |    AND octet_length(encode(text)) > 0),
        |dim AS (SELECT doc_id, text, n, n % 24 + 8 AS w,
        |    (n // 7) % 24 + 8 AS h FROM img),
        |px AS (SELECT doc_id, n, text, w, h,
        |    unnest(generate_series(0, w * h - 1)) AS p FROM dim),
        |ls AS (SELECT doc_id,
        |    CAST(sum(ascii(substring(text, CAST(p % n AS INT) + 1, 1)))
        |      AS BIGINT) AS luma_sum
        |  FROM px GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(54 + 4 * ((3 * d.w + 3) // 4) * d.h AS BIGINT) AS n_bytes,
        |  CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  ls.luma_sum
        |FROM dim d JOIN ls USING (doc_id) ORDER BY d.doc_id""".stripMargin) {
      (s, d) =>
      import s.implicits._
      val dir = java.nio.file.Files
        .createTempDirectory("graft_mm11").toString
      // producer side of the seam: render the image slice to real files,
      // executor-parallel (at 100 TB this is the upstream system writing
      // the bucket; the ENGINE path under grade starts at the read)
      bmpTable(s, d).as[(Long, Array[Byte])].foreachPartition {
        rows: Iterator[(Long, Array[Byte])] =>
          rows.foreach { case (id, bytes) =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(dir, f"doc_$id%012d.bmp"), bytes)
          }
      }
      // a decoy the glob filter must exclude
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "notes.txt"),
        "not an image".getBytes("UTF-8"))
      s.read.format("binaryFile").option("pathGlobFilter", "*.bmp")
        .load(dir)
        .select(element_at(split(col("path"), "/"), -1).as("file"),
          col("length"), col("content"))
        .as[(String, Long, Array[Byte])]
        .mapPartitions { rows =>
          // one decoder context per partition (the mapInPandas shape)
          rows.map { case (f, len, bytes) =>
            val img = Bmp.decode(bytes)
            (f.stripPrefix("doc_").stripSuffix(".bmp").toLong, len,
              img.width, img.height, img.luma.map(_.toLong).sum)
          }
        }
        .toDF("doc_id", "n_bytes", "width", "height", "luma_sum")
        .orderBy("doc_id")
    },

    QueryDef.sql(
      "mm10_png_phash",
      // per-image aHash over REAL decoded PNG pixels: unlike mm6's flat
      // BMP layout, the engine-side parse crosses a DEFLATE stream
      // (java.util.zip), CRC-verified chunks, and the five scanline
      // prediction filters (the encoder cycles filter types per row).
      // The oracle recomputes every bit from the GENERATOR formula
      // (pixel p = text byte p mod n) — the PNG container never reaches
      // DuckDB, so a hash match is bit-exact evidence the inflate +
      // unfilter chain (Paeth included) recovered the true pixels.
      s"""WITH ${duckPhashCtesFor(1, "n % 21 + 8", "(n // 5) % 21 + 8")}
         |SELECT doc_id, phash FROM ph ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        phashes(s, pngTable(s, d), Png.decode).orderBy("doc_id")
    }
  )

  /** DuckDB CTE chain ending in `ph(doc_id, phash)` — the GENERATOR-level
    * mirror of decode + [[Bmp.aHash64]] over the image slice: luma at
    * position p is text byte p mod n (the [[bmpTable]] formula; gray BT.601
    * luma = the byte itself since the weights sum to 1000), cell k =
    * (y·8/h)·8 + x·8/w, bit k set iff cellSum·n > totSum·cellCnt.
    * The 64-bit fingerprint is assembled from 32-bit halves combined with
    * an explicit signed fold — DuckDB raises on `1::BIGINT << 63`, and the
    * `k % 32` inside each branch keeps every shift ≤ 31 even if the
    * vectorized CASE evaluates both arms.
    */
  private def duckPhashCtes: String = duckPhashCtesFor(0,
    "n % 24 + 8", "(n // 7) % 24 + 8")

  /** The SQL mirror of generator → aHash for one image slice: slice
    * selector (`octet_length % 3 = mod`) and dimension formulas are the
    * only degrees of freedom between the BMP and PNG fixtures — the hash
    * pipeline (cell mapping, integer cross-multiplied threshold, two-half
    * bit assembly) is shared verbatim.
    */
  private def duckPhashCtesFor(mod: Int, wExpr: String,
      hExpr: String): String =
    s"""img AS (SELECT doc_id, text, octet_length(encode(text)) AS n
      |  FROM documents
      |  WHERE octet_length(encode(text)) % 3 = $mod
      |    AND octet_length(encode(text)) > 0),
      |dim AS (SELECT doc_id, text, n,
      |    $wExpr AS w, $hExpr AS h FROM img),
      |px AS (SELECT doc_id, text, n, w, h, w * h AS wh,
      |    unnest(generate_series(0, w * h - 1)) AS p FROM dim),
      |lum AS (SELECT doc_id, wh,
      |    ((p // w) * 8 // h) * 8 + ((p % w) * 8 // w) AS k,
      |    ascii(substring(text, CAST(p % n AS INT) + 1, 1)) AS v FROM px),
      |cell AS (SELECT doc_id, k, CAST(sum(v) AS BIGINT) AS cs,
      |    count(*) AS cc, max(wh) AS wh FROM lum GROUP BY doc_id, k),
      |tot AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS ts
      |  FROM lum GROUP BY doc_id),
      |bits AS (SELECT c.doc_id, c.k FROM cell c JOIN tot t USING (doc_id)
      |  WHERE c.cs * c.wh > t.ts * c.cc),
      |halves AS (SELECT i.doc_id,
      |    CAST(coalesce(sum(CASE WHEN b.k < 32
      |      THEN CAST(1 AS BIGINT) << CAST(b.k % 32 AS INT)
      |      ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS lo,
      |    CAST(coalesce(sum(CASE WHEN b.k >= 32
      |      THEN CAST(1 AS BIGINT) << CAST(b.k % 32 AS INT)
      |      ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS hi
      |  FROM img i LEFT JOIN bits b USING (doc_id) GROUP BY i.doc_id),
      |ph AS (SELECT doc_id,
      |    (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
      |      * 4294967296 + lo AS phash
      |  FROM halves)""".stripMargin
}
