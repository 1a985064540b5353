package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal REAL image codec #2: 8-bit grayscale PNG (color type 0, no
  * interlace).
  *
  * Unlike BMP's flat pixel array, PNG layers three real mechanisms the
  * decoder must get right: the chunk stream (length/type/data/CRC32 — every
  * CRC is verified, ancillary chunks are skipped but still checked), the
  * DEFLATE-compressed image stream (`java.util.zip.Inflater`, the same
  * zlib encoding every PNG in the wild uses), and per-scanline prediction
  * filters. [[encode]] cycles the filter type per row (`y % 5`:
  * None/Sub/Up/Average/Paeth), so a decoder that fakes any of the five
  * unfilters — including the Paeth predictor's tie-breaking order —
  * produces wrong pixels and hash-misses the oracle. Decoded output is the
  * same [[Bmp.Image]] luma contract the perceptual-hash pipeline consumes.
  */
object Png {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G',
    0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG filter reconstruction predictor (RFC 2083 §6.6): nearest of
    * left/up/upper-left to the linear estimate, ties broken in that order.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array())
    val tb = typ.getBytes("US-ASCII")
    out.write(tb)
    out.write(data)
    val crc = new CRC32()
    crc.update(tb)
    crc.update(data)
    out.write(java.nio.ByteBuffer.allocate(4)
      .putInt(crc.getValue.toInt).array())
  }

  /** Encode a grayscale image (`gray(p)` = luma 0..255 at p = y*width+x,
    * top-down row-major) as a standards-conformant 8-bit grayscale PNG.
    * Row y is written under filter type y % 5, exercising every defined
    * filter in any image of height ≥ 5.
    */
  def encode(width: Int, height: Int, gray: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val stride = width + 1 // leading filter-type byte per scanline
    val raw = new Array[Byte](stride * height)
    val recon = new Array[Int](width * height)
    var p = 0
    while (p < recon.length) { recon(p) = gray(p) & 0xff; p += 1 }
    var y = 0
    while (y < height) {
      val ft = y % 5
      raw(y * stride) = ft.toByte
      var x = 0
      while (x < width) {
        val cur = recon(y * width + x)
        val left = if (x > 0) recon(y * width + x - 1) else 0
        val up = if (y > 0) recon((y - 1) * width + x) else 0
        val ul = if (x > 0 && y > 0) recon((y - 1) * width + x - 1) else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case _ => cur - paeth(left, up, ul)
        }
        raw(y * stride + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new Deflater()
    defl.setInput(raw)
    defl.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) {
      val k = defl.deflate(buf)
      idat.write(buf, 0, k)
    }
    defl.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte) // bit depth
      .put(0.toByte) // color type 0 = grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", idat.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parse an 8-bit grayscale PNG to luma pixels: verified chunk walk
    * (every CRC checked, forged chunks rejected), concatenated-IDAT
    * inflate with an exact output-length check, then the five scanline
    * unfilters. Other bit depths / color types / interlacing are rejected
    * loudly rather than misread.
    */
  def decode(payload: Array[Byte]): Bmp.Image = {
    require(payload.length >= Signature.length &&
      Signature.indices.forall(i => payload(i) == Signature(i)), "not a PNG")
    def be32(o: Int): Int =
      ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
        ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
    var pos = Signature.length
    var width = 0
    var height = 0
    var seenIhdr = false
    var done = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!done) {
      require(pos + 8 <= payload.length, "truncated chunk header")
      val len = be32(pos)
      val typ = new String(payload, pos + 4, 4, "US-ASCII")
      // Long arithmetic: a forged length must fail this check, not
      // overflow past it into a misread
      require(len >= 0 && pos + 12L + len <= payload.length,
        s"truncated $typ chunk")
      val crc = new CRC32()
      crc.update(payload, pos + 4, 4 + len)
      require(crc.getValue.toInt == be32(pos + 8 + len), s"bad CRC in $typ")
      typ match {
        case "IHDR" =>
          width = be32(pos + 8)
          height = be32(pos + 12)
          val bitDepth = payload(pos + 16) & 0xff
          val colorType = payload(pos + 17) & 0xff
          val interlace = payload(pos + 20) & 0xff
          require(bitDepth == 8 && colorType == 0 && interlace == 0,
            s"unsupported PNG variant: depth=$bitDepth color=$colorType " +
              s"interlace=$interlace")
          seenIhdr = true
        case "IDAT" => idat.write(payload, pos + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunk: skipped, CRC still verified
      }
      pos += 12 + len
    }
    require(seenIhdr && width > 0 && height > 0, "missing or bad IHDR")
    val stride = width + 1
    val raw = new Array[Byte](stride * height)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inf.finished()) {
      val k = inf.inflate(raw, off, raw.length - off)
      require(k > 0 || inf.finished(), "truncated IDAT stream")
      off += k
    }
    inf.end()
    require(off == raw.length,
      s"IDAT decoded to $off bytes, expected ${raw.length}")
    val luma = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * stride) & 0xff
      var x = 0
      while (x < width) {
        val f = raw(y * stride + 1 + x) & 0xff
        val left = if (x > 0) luma(y * width + x - 1) else 0
        val up = if (y > 0) luma((y - 1) * width + x) else 0
        val ul = if (x > 0 && y > 0) luma((y - 1) * width + x - 1) else 0
        val v = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 => f + paeth(left, up, ul)
          case other =>
            throw new IllegalArgumentException(s"bad filter type $other")
        }
        luma(y * width + x) = v & 0xff
        x += 1
      }
      y += 1
    }
    Bmp.Image(width, height, luma)
  }
}
