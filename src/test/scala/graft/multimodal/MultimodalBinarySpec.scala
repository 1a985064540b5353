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

  test("mm4 audio windows treat bytes as unsigned raw data, not text") {
    val w = Multimodal.audioWindows(spark, spark.read.parquet(binDir),
        windowSize = 64)
      .collect().filter(_.doc_id == 3L).sortBy(_.window_idx)
    assert(w.length == 4) // ceil(200 / 64)
    assert(w.map(_.n_bytes).toSeq == Seq(64, 64, 64, 8))
    // window 0 = bytes 0..63 → mean 31.5; window 2 covers 128..191, which
    // only comes out 159.5 if bytes ≥ 0x80 read as unsigned
    assert(math.abs(w(0).mean_byte - 31.5) < 1e-9)
    assert(math.abs(w(2).mean_byte - 159.5) < 1e-9)
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
