package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal REAL video container codec: AVI (RIFF form `AVI `) carrying
  * uncompressed 24-bit DIB frames (`DIB ` handler, `00db` chunks).
  *
  * The video counterpart of [[Bmp]]/[[Wav]]: [[decode]] walks the actual
  * nested RIFF structure — `LIST hdrl` → `LIST strl` → `strf`
  * (BITMAPINFOHEADER validated as 24-bit BI_RGB) for the dimensions,
  * `LIST movi` for the frame chunks — and parses each `00db` payload as
  * bottom-up, 4-byte-padded BGR rows to integer BT.601 luma (the exact
  * DIB pixel layout [[Bmp]] reads, sans file headers). [[encode]] writes
  * the same structure with a standard `avih`/`strh` header pair. The
  * frame-decode query (mm8) computes its statistics over frames parsed by
  * this walker while its oracle recomputes every pixel from the frame
  * generator formula — the container never reaches DuckDB, so any bug in
  * the nested-LIST walk, the frame chunk collection, or the row layout
  * hash-misses.
  */
object Avi {

  /** Decoded video: per-frame integer luma in logical top-down row-major
    * order (same contract as [[Bmp.Image]]).
    */
  final case class Video(width: Int, height: Int,
      frames: Array[Array[Int]])

  private def rowSize(width: Int): Int = (width * 3 + 3) & ~3

  /** Encode grayscale frames: `frames(f)(p)` is the luma (0..255) at
    * logical position p = y*width + x of frame f, top-down row-major.
    * Frames are written as bottom-up padded BGR DIB bits in `00db`
    * chunks — the standard uncompressed-AVI layout.
    */
  def encode(width: Int, height: Int,
      frames: Array[Array[Int]]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(frames.nonEmpty, "a video needs at least one frame")
    val rs = rowSize(width)
    val frameBytes = rs * height
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviSize = 4 + frames.length * (8 + frameBytes)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val b = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    cc("RIFF"); b.putInt(riffSize); cc("AVI ")
    cc("LIST"); b.putInt(hdrlSize); cc("hdrl")
    cc("avih"); b.putInt(56)
    b.putInt(40000) // microseconds per frame (25 fps)
      .putInt(frameBytes * 25) // max bytes/sec
      .putInt(0) // padding granularity
      .putInt(0x10) // AVIF_HASINDEX unset; 0x10 = WASCAPTUREFILE (benign)
      .putInt(frames.length) // total frames
      .putInt(0) // initial frames
      .putInt(1) // streams
      .putInt(frameBytes) // suggested buffer size
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    cc("LIST"); b.putInt(4 + (8 + 56) + (8 + 40)); cc("strl")
    cc("strh"); b.putInt(56)
    cc("vids"); cc("DIB ")
    b.putInt(0) // flags
      .putShort(0).putShort(0) // priority, language
      .putInt(0) // initial frames
      .putInt(1).putInt(25) // scale / rate = 25 fps
      .putInt(0) // start
      .putInt(frames.length) // length in frames
      .putInt(frameBytes) // suggested buffer size
      .putInt(-1) // quality (default)
      .putInt(0) // sample size (varies)
      .putShort(0).putShort(0).putShort(width.toShort)
      .putShort(height.toShort) // rcFrame
    cc("strf"); b.putInt(40)
    b.putInt(40) // BITMAPINFOHEADER size
      .putInt(width).putInt(height) // positive height = bottom-up
      .putShort(1).putShort(24) // planes, bits per pixel
      .putInt(0) // BI_RGB
      .putInt(frameBytes)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    cc("LIST"); b.putInt(moviSize); cc("movi")
    frames.foreach { fr =>
      require(fr.length == width * height,
        s"frame has ${fr.length} pixels, expected ${width * height}")
      cc("00db"); b.putInt(frameBytes)
      var y = height - 1 // bottom-up storage
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val v = (fr(y * width + x) & 0xff).toByte
          b.put(v).put(v).put(v) // B, G, R
          x += 1
        }
        var pad = rs - width * 3
        while (pad > 0) { b.put(0.toByte); pad -= 1 }
        y -= 1
      }
    }
    b.array()
  }

  /** Parse an uncompressed-DIB AVI. Walks the top-level chunk list (any
    * order, unknown chunks skipped, odd sizes padded), descends `LIST
    * hdrl` → `LIST strl` for the `strf` BITMAPINFOHEADER, and collects
    * every `00db`/`00dc` chunk under `LIST movi` as one frame. Fails
    * loudly on compressed/non-24-bit variants and structural damage.
    */
  def decode(bytes: Array[Byte]): Video = {
    require(bytes.length >= 12, s"truncated RIFF header: ${bytes.length}B")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
    }
    require(fourCC() == "RIFF", "not a RIFF container")
    b.getInt()
    require(fourCC() == "AVI ", "not an AVI form")
    var width = -1
    var height = -1
    val frameChunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    // walk chunks in [from, to); LIST chunks recurse one level at a time
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        b.position(pos)
        val id = fourCC()
        val size = b.getInt()
        require(size >= 0 && pos + 8 + size <= to,
          s"chunk '$id' overruns its parent: $size bytes at $pos")
        id match {
          case "LIST" =>
            val listType = fourCC()
            if (listType == "hdrl" || listType == "strl" ||
                listType == "movi")
              walk(pos + 12, pos + 8 + size, listType == "movi")
          case "strf" =>
            require(size >= 40, s"strf too small: $size")
            val biSize = b.getInt()
            require(biSize >= 40, s"bad BITMAPINFOHEADER size $biSize")
            width = b.getInt()
            height = b.getInt()
            b.getShort() // planes
            val bpp = b.getShort()
            val compression = b.getInt()
            require(bpp == 24 && compression == 0,
              s"unsupported DIB variant: bpp=$bpp compression=$compression")
            require(width > 0 && height > 0,
              s"bad dimensions ${width}x$height")
          case "00db" | "00dc" if inMovi =>
            frameChunks += ((pos + 8, size))
          case _ => // avih, strh, idx1, JUNK, …: skip
        }
        pos += 8 + size + (size % 2) // RIFF word alignment
      }
    }
    walk(12, bytes.length, inMovi = false)
    require(width > 0, "missing strf header")
    require(frameChunks.nonEmpty, "no frames in movi list")
    val rs = rowSize(width)
    val frames = frameChunks.map { case (off, size) =>
      require(size >= rs * height,
        s"frame chunk truncated: $size < ${rs * height}")
      val luma = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        val base = off + (height - 1 - y) * rs // bottom-up rows
        var x = 0
        while (x < width) {
          val bl = bytes(base + x * 3) & 0xff
          val gr = bytes(base + x * 3 + 1) & 0xff
          val rd = bytes(base + x * 3 + 2) & 0xff
          luma(y * width + x) = (299 * rd + 587 * gr + 114 * bl) / 1000
          x += 1
        }
        y += 1
      }
      luma
    }.toArray
    Video(width, height, frames)
  }
}
