package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the PNG codec: round-trip through DEFLATE + all five
  * scanline filters, cross-codec agreement with BMP on the same pixels,
  * and loud rejection of forged/corrupted containers.
  */
class PngSpec extends AnyFunSuite {

  test("encode/decode round-trips pixels exactly through all five filters") {
    // height 7 ≥ 5 cycles every filter type (None/Sub/Up/Average/Paeth);
    // the gradient+noise pattern makes each predictor's output distinct,
    // so a wrong unfilter cannot round-trip by luck
    val w = 11
    val h = 7
    val gray = (0 until w * h).map(p => (p * 37 + (p * p) % 19) % 256)
    val img = Png.decode(Png.encode(w, h, gray))
    assert(img.width == w && img.height == h)
    assert(img.luma.toSeq == gray)
    // 1×1 edge case: single Paeth-free pixel, no left/up neighbors
    val tiny = Png.decode(Png.encode(1, 1, _ => 200))
    assert(tiny.luma.toSeq == Seq(200))
  }

  test("PNG and BMP decode the same logical image to identical luma") {
    val w = 9
    val h = 6
    val gray = (0 until w * h).map(p => (p * 23) % 256)
    val fromPng = Png.decode(Png.encode(w, h, gray))
    val fromBmp = Bmp.decode(Bmp.encode(w, h, gray))
    assert(fromPng.luma.toSeq == fromBmp.luma.toSeq)
    // and therefore the perceptual hashes agree across containers
    assert(Bmp.aHash64(fromPng) == Bmp.aHash64(fromBmp))
  }

  test("corrupted or foreign containers are rejected, not misread") {
    val ok = Png.encode(4, 4, p => p * 16)
    // flip one byte inside the IDAT chunk (its CRC trailer): the chunk
    // CRC verification must catch it
    val corrupted = ok.clone()
    corrupted(ok.length - 13) = (corrupted(ok.length - 13) ^ 0x40).toByte
    assertThrows[IllegalArgumentException](Png.decode(corrupted))
    // truncated stream
    assertThrows[IllegalArgumentException](
      Png.decode(ok.take(ok.length - 5)))
    // a BMP is not a PNG
    assertThrows[IllegalArgumentException](
      Png.decode(Bmp.encode(2, 2, _ => 0)))
  }

  test("decoded pixels equal the generator formula (the oracle contract)") {
    val t = "the quick brown fox jumps over the lazy dog"
      .getBytes("UTF-8")
    val n = t.length
    val w = n % 21 + 8
    val h = (n / 5) % 21 + 8
    val img = Png.decode(Png.encode(w, h, p => t(p % n) & 0xff))
    assert((0 until w * h).forall(p => img.luma(p) == (t(p % n) & 0xff)))
  }
}
