package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL container metadata probe — the `ffprobe` step of the pipeline:
  * sniff the payload's magic bytes, then parse the actual container
  * header for typed metadata, WITHOUT decoding media data. This replaces
  * guesswork with the container's own declared fields:
  *
  *  - `BM…`               → BMP: width/height from BITMAPINFOHEADER
  *  - `RIFF…WAVE`         → WAV: sample rate / sample count from
  *                          `fmt `+`data` chunk sizes
  *  - `RIFF…AVI `         → AVI: width/height from `strf`, frame count
  *                          from the `movi` chunk list
  *
  * Unlike the full decoders ([[Bmp.decode]]/[[Wav.decode]]/
  * [[Avi.decode]]) the probe never touches pixel/sample payloads — a
  * 100 TB probe pass reads only container headers. Unknown payloads
  * return kind `unknown` with byte length only (probing must be total:
  * an ingest sweep cannot throw on the first foreign file).
  */
object Probe {

  /** Typed probe result; -1 marks fields the container kind lacks. */
  final case class MediaProbe(doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, sample_rate: Int,
      n_samples: Long)

  private def unknown(id: Long, n: Int) =
    MediaProbe(id, "unknown", n.toLong, -1, -1, -1, -1, -1L)

  def probe(id: Long, bytes: Array[Byte]): MediaProbe = {
    if (bytes.length >= 2 && bytes(0) == 'B'.toByte &&
        bytes(1) == 'M'.toByte && bytes.length >= 54) {
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      MediaProbe(id, "image", bytes.length.toLong,
        b.getInt(18), math.abs(b.getInt(22)), 1, -1, -1L)
    } else if (bytes.length >= 12 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF") {
      new String(bytes, 8, 4, "US-ASCII") match {
        case "WAVE" => probeWave(id, bytes)
        case "AVI " => probeAvi(id, bytes)
        case _ => unknown(id, bytes.length)
      }
    } else unknown(id, bytes.length)
  }

  /** Header-only WAV probe: chunk walk for `fmt ` (rate, block align) and
    * the `data` chunk SIZE — the sample payload is never read.
    */
  private def probeWave(id: Long, bytes: Array[Byte]): MediaProbe = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    b.position(12)
    var rate = -1
    var blockAlign = -1
    var dataSize = -1L
    while (b.remaining() >= 8) {
      val a = new Array[Byte](4); b.get(a)
      val idc = new String(a, "US-ASCII")
      val size = b.getInt()
      if (size < 0 || size > b.remaining()) return unknown(id, bytes.length)
      idc match {
        case "fmt " if size >= 16 =>
          val p = b.position()
          b.getShort() // format
          b.getShort() // channels
          rate = b.getInt()
          b.getInt() // byte rate
          blockAlign = b.getShort()
          b.position(p + size)
        case "data" =>
          dataSize = size.toLong
          b.position(b.position() + size)
        case _ => b.position(b.position() + size)
      }
      if (size % 2 == 1 && b.remaining() > 0) b.position(b.position() + 1)
    }
    if (rate <= 0 || blockAlign <= 0 || dataSize < 0)
      unknown(id, bytes.length)
    else MediaProbe(id, "audio", bytes.length.toLong, -1, -1, -1,
      rate, dataSize / blockAlign)
  }

  /** Header-only AVI probe: `avih` declares the frame count and frame
    * dimensions — no movi scan, no frame bytes touched.
    */
  private def probeAvi(id: Long, bytes: Array[Byte]): MediaProbe = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    b.position(12)
    while (b.remaining() >= 8) {
      val a = new Array[Byte](4); b.get(a)
      val idc = new String(a, "US-ASCII")
      val size = b.getInt()
      if (size < 0 || size > b.remaining()) return unknown(id, bytes.length)
      if (idc == "LIST") {
        val la = new Array[Byte](4); b.get(la)
        if (new String(la, "US-ASCII") == "hdrl") {
          // avih is the first chunk of hdrl per the AVI spec
          val ha = new Array[Byte](4); b.get(ha)
          val hsize = b.getInt()
          if (new String(ha, "US-ASCII") == "avih" && hsize >= 56) {
            val p = b.position()
            val totalFrames = b.getInt(p + 16)
            val w = b.getInt(p + 32)
            val h = b.getInt(p + 36)
            return MediaProbe(id, "video", bytes.length.toLong, w, h,
              totalFrames, -1, -1L)
          } else return unknown(id, bytes.length)
        } else b.position(b.position() + size - 4)
      } else b.position(b.position() + size)
      if (size % 2 == 1 && b.remaining() > 0) b.position(b.position() + 1)
    }
    unknown(id, bytes.length)
  }
}
