package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The multimodal seam over a REAL binary fixture: payloads that are not
  * valid UTF-8 (container magic bytes, stray continuation bytes, the full
  * 0x00–0xFF sweep) written to a genuine `binary`-typed parquet column.
  * The corpus-backed mm* queries stand in text-encoded bytes for media;
  * this spec proves the codec path itself never assumes text.
  */
class MultimodalBinarySpec extends SparkSpec {

  // none of these decode as UTF-8: a PNG-style header with 0xFF/0x00, an
  // invalid continuation pair, and a 200-byte sweep through all bit patterns
  private val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
    0xFF, 0x00, 0xFE).map(_.toByte)
  private val bad = Array(0xC3, 0x28, 0x00, 0xFF, 0x80, 0x81).map(_.toByte)
  private val sweep = Array.tabulate(200)(i => (i % 256).toByte)

  private lazy val binDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bin").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(Row(1L, png), Row(2L, bad), Row(3L, sweep)), 2), schema)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("binary payloads round-trip through parquet bit-exactly") {
    val back = spark.read.parquet(binDir)
    assert(back.schema("payload").dataType == BinaryType)
    val m = back.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(m(1L), png))
    assert(java.util.Arrays.equals(m(2L), bad))
    assert(java.util.Arrays.equals(m(3L), sweep))
  }

  test("mm1 decode yields byte-derived metadata for non-UTF8 payloads") {
    val meta = Multimodal.decodeAll(spark, spark.read.parquet(binDir))
      .collect()
    val expected = Map(1L -> png, 2L -> bad, 3L -> sweep)
      .map { case (id, b) => id -> Multimodal.FakeCodec.decode(id, b) }
    assert(meta.length == 3)
    meta.foreach(m => assert(m == expected(m.doc_id), m.toString))
  }

  test("mm4 audio windows run over DECODED PCM samples: signed 16-bit " +
      "little-endian, through a real RIFF chunk walk") {
    import spark.implicits._
    // 200 samples sweeping -32768, -32512, … (steps of 256): values that
    // only come out right if the decoder sign-extends little-endian int16
    val samples = Array.tabulate(200)(i => ((i - 128) * 256).toShort)
    val wav = Wav.encode(8000, samples)
    val dir = java.nio.file.Files.createTempDirectory("graft-wav").toString
    Seq((3L, wav)).toDF("doc_id", "payload")
      .write.mode("overwrite").parquet(dir)
    val w = Multimodal.audioWindows(spark, spark.read.parquet(dir),
        windowSize = 64)
      .collect().filter(_.doc_id == 3L).sortBy(_.window_idx)
    assert(w.length == 4) // ceil(200 / 64)
    assert(w.map(_.n_samples).toSeq == Seq(64, 64, 64, 8))
    // window 0 = samples (0-128..63-128)*256 → mean (-96.5)*256; a
    // decoder reading unsigned or big-endian lands far away
    assert(math.abs(w(0).mean_sample - (-96.5 * 256)) < 1e-9)
    assert(math.abs(w(2).mean_sample - (31.5 * 256)) < 1e-9)
    // RMS of window 2 (values 0..63 minus 128 → 0*256..63*256 shifted):
    // exact integer sum of squares
    val w2 = (128 until 192).map(i => ((i - 128) * 256).toLong)
    val exp = math.sqrt(w2.map(v => v * v).sum.toDouble / 64)
    assert(math.abs(w(2).rms - exp) < 1e-9)
  }

  test("Wav codec: round-trip identity, foreign chunks skipped, " +
      "malformed payloads fail loudly") {
    val samples = Array.tabulate(777)(i => ((i * 37 - 9000) % 32768).toShort)
    val enc = Wav.encode(44100, samples)
    val dec = Wav.decode(enc)
    assert(dec.sampleRate == 44100)
    assert(dec.samples.toSeq == samples.toSeq)
    // a LIST chunk (odd-sized, to exercise the RIFF pad byte) inserted
    // BEFORE fmt/data: a header-offset decoder breaks, a chunk walker
    // doesn't
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val withChunk = {
      val b = java.nio.ByteBuffer.allocate(enc.length + extra.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(enc, 0, 12) // RIFF header + WAVE form
      b.put(extra)
      b.put(enc, 12, enc.length - 12)
      b.array()
    }
    val dec2 = Wav.decode(withChunk)
    assert(dec2.samples.toSeq == samples.toSeq)
    // truncation and non-RIFF payloads are named errors, not garbage
    intercept[IllegalArgumentException](Wav.decode(enc.take(20)))
    intercept[IllegalArgumentException](
      Wav.decode("not audio at all".getBytes("US-ASCII")))
    // stereo is rejected (the contract is mono PCM 16-bit)
    val stereo = enc.clone()
    stereo(22) = 2 // channels field inside fmt
    intercept[IllegalArgumentException](Wav.decode(stereo))
  }

  test("Avi codec: frame round-trip, top-level JUNK skipped, " +
      "compressed variants rejected") {
    // an ASYMMETRIC frame: pixel value = logical position, so any
    // row-order / bottom-up confusion in the DIB parse scrambles it
    val w = 11; val h = 5 // odd width exercises the 4-byte row padding
    val f0 = Array.tabulate(w * h)(p => p % 256)
    val f1 = Array.tabulate(w * h)(p => (255 - p) % 256)
    val enc = Avi.encode(w, h, Array(f0, f1))
    val dec = Avi.decode(enc)
    assert(dec.width == w && dec.height == h && dec.frames.length == 2)
    assert(dec.frames(0).toSeq == f0.toSeq)
    assert(dec.frames(1).toSeq == f1.toSeq)
    // a JUNK chunk inserted between the RIFF form type and LIST hdrl:
    // real writers pad with JUNK; a fixed-offset parser breaks here
    val junk = Array[Byte]('J', 'U', 'N', 'K', 6, 0, 0, 0, 9, 9, 9, 9, 9, 9)
    val withJunk = enc.take(12) ++ junk ++ enc.drop(12)
    assert(Avi.decode(withJunk).frames(1).toSeq == f1.toSeq)
    // compressed or non-24-bit DIBs are named errors, not misreads:
    // the compression dword sits 24 bytes into the strf chunk
    val strfAt = enc.indexOfSlice("strf".getBytes("US-ASCII"))
    assert(strfAt > 0)
    val compressed = enc.clone()
    compressed(strfAt + 24) = 1 // BI_RLE8
    intercept[IllegalArgumentException](Avi.decode(compressed))
    intercept[IllegalArgumentException](Avi.decode(enc.take(40)))
    intercept[IllegalArgumentException](
      Avi.decode("RIFFxxxxWAVE".getBytes("US-ASCII")))
  }

  test("mm8 frame stats run over decoded AVI frames with the sampling " +
      "stride") {
    import spark.implicits._
    val w = 9; val h = 4
    // 7 frames of constant luma = 10*frame_idx: stride 3 keeps frames
    // 0, 3, 6 with means 0, 30, 60
    val frames = Array.tabulate(7)(f => Array.fill(w * h)(f * 10))
    val dir = java.nio.file.Files.createTempDirectory("graft-avi").toString
    Seq((42L, Avi.encode(w, h, frames))).toDF("doc_id", "payload")
      .write.mode("overwrite").parquet(dir)
    val got = Multimodal.frameStats(spark, spark.read.parquet(dir))
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0, 3, 6))
    assert(got.forall(_.n_px == w * h))
    assert(got.map(_.mean_luma).toSeq == Seq(0.0, 30.0, 60.0))
  }

  test("Probe reads each container's OWN header fields, never guesses") {
    val bmp = Bmp.encode(13, 7, p => p % 256)
    val pb = Probe.probe(1L, bmp)
    assert(pb.kind == "image" && pb.width == 13 && pb.height == 7 &&
      pb.n_frames == 1 && pb.n_bytes == bmp.length)
    val wav = Wav.encode(22050, Array.tabulate(321)(_.toShort))
    val pw = Probe.probe(2L, wav)
    assert(pw.kind == "audio" && pw.sample_rate == 22050 &&
      pw.n_samples == 321 && pw.n_bytes == wav.length)
    assert(pw.width == -1 && pw.n_frames == -1)
    val avi = Avi.encode(9, 4, Array.fill(5)(Array.fill(36)(7)))
    val pv = Probe.probe(3L, avi)
    assert(pv.kind == "video" && pv.width == 9 && pv.height == 4 &&
      pv.n_frames == 5 && pv.n_bytes == avi.length)
    // foreign payloads are total-function 'unknown', never an exception:
    // an ingest sweep must survive the first file it cannot place
    Seq(png, bad, sweep, Array.empty[Byte]).zipWithIndex.foreach {
      case (p, i) =>
        val u = Probe.probe(100L + i, p)
        assert(u.kind == "unknown" && u.n_bytes == p.length, u.toString)
    }
    // a RIFF form the probe does not know is unknown too, not misread
    val odd = "RIFF".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "ACON".getBytes("US-ASCII")
    assert(Probe.probe(200L, odd).kind == "unknown")
  }

  test("mm3/mm5 fan-outs run off binary-decoded metadata") {
    val meta = Multimodal.decodeAll(spark, spark.read.parquet(binDir)).toDF()
    val vidFrames = meta.filter(col("kind") === "video")
      .agg(coalesce(sum("n_frames"), lit(0L))).collect()(0).getLong(0)
    assert(vidFrames > 0) // the fixture must actually exercise the path
    assert(Multimodal.frameSample(meta).count() == vidFrames)
    val imgs = meta.filter(col("kind") === "image").collect()
    assert(imgs.nonEmpty)
    val expTiles = imgs.map(r => (math.ceil(r.getAs[Int]("width") / 16.0) *
      math.ceil(r.getAs[Int]("height") / 16.0)).toLong).sum
    assert(Multimodal.tileGrid(meta).count() == expTiles)
  }
}
