package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Object-storage media ingest: the `binaryFile` datasource is the
  * canonical Spark path from "a bucket of image files" to the
  * (path, length, content-binary) relation the multimodal family
  * operates on. This pins the end-to-end seam: files on disk → binary
  * rows → REAL codec decode — the exact shape a 100 TB media corpus
  * ingests through (partitioned file listing, no driver-side reads).
  */
class MediaIngestSpec extends SparkSpec {

  test("binaryFile source + BMP codec: files round-trip through the " +
      "relation to decoded pixels") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    val expected = (0 until 8).map { i =>
      val bytes = Bmp.encode(5, 3, p => (p * 7 + i * 11) % 256)
      java.nio.file.Files.write(dir.resolve(f"img_$i%02d.bmp"), bytes)
      // a decoy the glob filter must exclude
      java.nio.file.Files.write(dir.resolve(f"notes_$i%02d.txt"),
        "not an image".getBytes("UTF-8"))
      f"img_$i%02d.bmp" -> (0 until 15).map(p => (p * 7 + i * 11) % 256).sum
    }.toMap

    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bmp")
      .load(dir.toString)
    assert(df.count() == 8)
    // the source carries (path, modificationTime, length, content)
    assert(df.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))

    import spark.implicits._
    val decoded = df
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("content"))
      .as[(String, Array[Byte])]
      .map { case (f, bytes) =>
        val img = Bmp.decode(bytes)
        (f, img.width, img.height, img.luma.sum)
      }
      .collect()
    assert(decoded.length == 8)
    decoded.foreach { case (f, w, h, lumaSum) =>
      assert(w == 5 && h == 3, s"$f decoded ${w}x$h")
      assert(lumaSum == expected(f), s"$f pixel sum drifted")
    }
  }
}
