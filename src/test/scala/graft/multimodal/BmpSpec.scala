package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the REAL image codec: byte-level round-trip, BT.601
  * luma from a hand-built colored BMP, and a PINNED 8×8 aHash value a
  * refactor cannot silently change.
  */
class BmpSpec extends AnyFunSuite {

  test("encode/decode round-trips pixels exactly (incl. row padding)") {
    // 5×3: row size 15 pads to 16 — exercises the 4-byte alignment
    val gray = (0 until 15).map(p => (p * 17) % 256)
    val img = Bmp.decode(Bmp.encode(5, 3, gray))
    assert(img.width == 5 && img.height == 3)
    // gray BT.601 luma = the gray value itself (weights sum to 1000)
    assert(img.luma.toSeq == gray)
  }

  test("decode reads the actual BMP layout: bottom-up rows, BGR order, " +
      "integer BT.601 luma") {
    // hand-built 1×2 24bpp BMP, bottom-up: stored first row is IMAGE row 1
    val rowSize = 4 // 1 px × 3 bytes, padded to 4
    val b = ByteBuffer.allocate(54 + rowSize * 2)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * 2)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(1).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(rowSize * 2).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    b.put(10.toByte).put(20.toByte).put(30.toByte).put(0.toByte) // img row 1
    b.put(40.toByte).put(50.toByte).put(60.toByte).put(0.toByte) // img row 0
    val img = Bmp.decode(b.array())
    assert(img.width == 1 && img.height == 2)
    // B=40 G=50 R=60 → (299·60 + 587·50 + 114·40)/1000 = 51850/1000 = 51
    assert(img.luma(0) == 51)
    // B=10 G=20 R=30 → (299·30 + 587·20 + 114·10)/1000 = 21850/1000 = 21
    assert(img.luma(1) == 21)
  }

  test("non-BMP and unsupported variants are rejected loudly") {
    intercept[IllegalArgumentException] {
      Bmp.decode("not an image".getBytes("UTF-8"))
    }
    // valid magic but 8bpp: must refuse, not misread
    val b = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54).putShort(0).putShort(0)
      .putInt(54).putInt(40).putInt(1).putInt(1).putShort(1).putShort(8)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    intercept[IllegalArgumentException] { Bmp.decode(b.array()) }
  }

  test("pinned aHash: half-bright 8×8 image → exactly 0xF0F0F0F0F0F0F0F0") {
    // left half luma 0, right half 255: each 8×8 cell is one pixel, the
    // bright cells strictly exceed the global mean, bit k = y*8+x for
    // x ≥ 4 → nibble 0xF0 in every byte. A refactor that flips bit
    // order, row order, or the strict inequality changes this value.
    val img = Bmp.decode(Bmp.encode(8, 8,
      p => if (p % 8 >= 4) 255 else 0))
    assert(Bmp.aHash64(img) == 0xF0F0F0F0F0F0F0F0L)
  }

  test("pinned aHash: constant image hashes to 0 (no cell beats the mean)") {
    val img = Bmp.decode(Bmp.encode(16, 16, _ => 200))
    assert(Bmp.aHash64(img) == 0L)
  }

  test("aHash cell mapping covers non-multiple-of-8 dimensions") {
    // 9×10: every pixel lands in exactly one cell, counts sum to w·h
    val img = Bmp.decode(Bmp.encode(9, 10, p => p % 251))
    val fp = Bmp.aHash64(img)
    // sanity: deterministic (recompute) and within 64 bits
    assert(fp == Bmp.aHash64(img))
  }
}
