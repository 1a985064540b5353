package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL image codec: 24-bit uncompressed (BI_RGB) Windows BMP.
  *
  * [[decode]] parses the actual BITMAPFILEHEADER / BITMAPINFOHEADER byte
  * layout (little-endian fields, bottom-up padded pixel rows, BGR channel
  * order) and converts pixels to integer BT.601 luma; [[encode]] writes
  * the same layout. The perceptual-hash queries (mm6/mm7) hash DECODED
  * PIXELS through this codec, not payload bytes. Its siblings decode for
  * real too — [[Png]] (zlib inflate + all five filter types), [[Wav]]
  * (RIFF PCM chunk walk), [[Avi]] (nested-LIST DIB frames); only the
  * opaque-payload METADATA seam ([[Multimodal.FakeCodec]], mm1/mm2)
  * remains the documented stub contract for arbitrary binaries.
  */
object Bmp {

  /** Decoded image: BT.601 integer luma per pixel, logical top-down
    * row-major order (`luma(y * width + x)`), values 0..255.
    */
  final case class Image(width: Int, height: Int, luma: Array[Int])

  private val HeaderSize = 54 // 14-byte file header + 40-byte info header

  /** Encode a grayscale image: `gray(p)` is the luma (0..255) at logical
    * position p = y*width + x, top-down row-major. Written as 24-bit BGR
    * (all three channels equal), bottom-up rows, 4-byte row padding — the
    * standard layout every BMP reader accepts.
    */
  def encode(width: Int, height: Int, gray: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val rowSize = (width * 3 + 3) & ~3
    val dataSize = rowSize * height
    val b = ByteBuffer.allocate(HeaderSize + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
      .putInt(HeaderSize + dataSize) // file size
      .putShort(0).putShort(0) // reserved
      .putInt(HeaderSize) // pixel data offset
    b.putInt(40) // BITMAPINFOHEADER size
      .putInt(width).putInt(height) // positive height = bottom-up
      .putShort(1) // planes
      .putShort(24) // bits per pixel
      .putInt(0) // BI_RGB (uncompressed)
      .putInt(dataSize)
      .putInt(2835).putInt(2835) // 72 DPI in pixels/metre
      .putInt(0).putInt(0) // palette unused at 24bpp
    var y = height - 1 // bottom-up storage: last image row first
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val v = (gray(y * width + x) & 0xff).toByte
        b.put(v).put(v).put(v) // B, G, R
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** Parse a 24-bit BI_RGB BMP to luma pixels. Handles both bottom-up
    * (positive height, the standard) and top-down (negative height)
    * storage; rejects other bit depths / compressions loudly rather than
    * misreading them.
    */
  def decode(payload: Array[Byte]): Image = {
    require(payload.length >= HeaderSize &&
      payload(0) == 'B'.toByte && payload(1) == 'M'.toByte, "not a BMP")
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = b.getInt(10)
    val width = b.getInt(18)
    val heightRaw = b.getInt(22)
    val bpp = b.getShort(28)
    val compression = b.getInt(30)
    require(bpp == 24 && compression == 0,
      s"unsupported BMP variant: bpp=$bpp compression=$compression")
    val bottomUp = heightRaw >= 0
    val height = math.abs(heightRaw)
    require(width > 0 && height > 0, s"bad dimensions ${width}x$heightRaw")
    val rowSize = (width * 3 + 3) & ~3
    // Long arithmetic: a forged header must fail this check, not overflow
    // past it into a misread
    require(dataOffset.toLong + rowSize.toLong * height <= payload.length,
      "pixel data truncated")
    val luma = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      val base = dataOffset + srcRow * rowSize
      var x = 0
      while (x < width) {
        val bl = payload(base + x * 3) & 0xff
        val gr = payload(base + x * 3 + 1) & 0xff
        val rd = payload(base + x * 3 + 2) & 0xff
        // integer BT.601: exact (no float), and = the gray value itself
        // when r = g = b since the weights sum to 1000
        luma(y * width + x) = (299 * rd + 587 * gr + 114 * bl) / 1000
        x += 1
      }
      y += 1
    }
    Image(width, height, luma)
  }

  /** Classic 8×8 average-hash over DECODED pixels: the image is reduced to
    * an 8×8 grid (cell of pixel (x, y) is (y*8/h, x*8/w) — every pixel
    * lands in exactly one cell), bit k = row*8+col set iff that cell's
    * mean luma strictly exceeds the whole image's mean. The comparison is
    * cross-multiplied in integers (cellSum·nPixels > totalSum·cellCount),
    * so the oracle reproduces every bit exactly — no float rounding.
    */
  def aHash64(img: Image): Long = {
    val w = img.width
    val h = img.height
    val n = w * h
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var tot = 0L
    var p = 0
    while (p < n) {
      val x = p % w
      val y = p / w
      val k = (y * 8 / h) * 8 + (x * 8 / w)
      val v = img.luma(p).toLong
      cellSum(k) += v
      cellCnt(k) += 1
      tot += v
      p += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) {
      if (cellSum(k) * n > tot * cellCnt(k)) fp |= (1L << k)
      k += 1
    }
    fp
  }
}
