package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal REAL audio codec: RIFF/WAVE, 16-bit PCM, mono.
  *
  * The audio counterpart of [[Bmp]]: [[decode]] parses the actual RIFF
  * container — magic, chunk walk (arbitrary chunk order and unknown
  * chunks tolerated, as real writers emit `LIST`/`fact` chunks), `fmt `
  * field validation, little-endian signed 16-bit samples — and
  * [[encode]] writes the same layout. The windowed-DSP query (mm4) runs
  * its statistics over DECODED SAMPLES through this parser, not over
  * payload bytes; its oracle recomputes every value from the sample
  * generator formula without ever seeing the WAV, so any decoder bug
  * (chunk offsets, endianness, sign extension) hash-misses.
  */
object Wav {

  /** Decoded audio: sample rate and the signed 16-bit PCM samples. */
  final case class Audio(sampleRate: Int, samples: Array[Short])

  /** Encode mono 16-bit PCM as a standard RIFF/WAVE file. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val dataSize = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
      .putInt(36 + dataSize) // RIFF payload size
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII"))
      .putInt(16) // PCM fmt chunk size
      .putShort(1) // audio format: PCM
      .putShort(1) // channels: mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { b.putShort(samples(i)); i += 1 }
    b.array()
  }

  /** Parse a RIFF/WAVE payload. Walks the chunk list (chunks may appear
    * in any order, unknown chunks are skipped, odd-sized chunks carry the
    * RIFF pad byte); requires a PCM mono 16-bit `fmt ` chunk and a `data`
    * chunk. Fails loudly on anything else — a silent partial decode would
    * feed garbage statistics downstream.
    */
  def decode(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 12, s"truncated RIFF header: ${bytes.length}B")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
    }
    require(fourCC() == "RIFF", "not a RIFF container")
    b.getInt() // RIFF payload size (trust the actual buffer instead)
    require(fourCC() == "WAVE", "not a WAVE form")
    var sampleRate = -1
    var data: Array[Byte] = null
    while (b.remaining() >= 8) {
      val id = fourCC()
      val size = b.getInt()
      require(size >= 0 && size <= b.remaining(),
        s"chunk '$id' overruns the payload: $size > ${b.remaining()}")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val fmtEnd = b.position() + size
          val audioFormat = b.getShort()
          val channels = b.getShort()
          sampleRate = b.getInt()
          b.getInt() // byte rate
          b.getShort() // block align
          val bits = b.getShort()
          require(audioFormat == 1, s"not PCM: format $audioFormat")
          require(channels == 1, s"not mono: $channels channels")
          require(bits == 16, s"not 16-bit: $bits")
          b.position(fmtEnd)
        case "data" =>
          data = new Array[Byte](size)
          b.get(data)
        case _ => // unknown chunk (LIST, fact, …): skip its payload
          b.position(b.position() + size)
      }
      // RIFF chunks are word-aligned: odd sizes carry one pad byte
      if (size % 2 == 1 && b.remaining() > 0) b.position(b.position() + 1)
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(data != null, "missing data chunk")
    require(data.length % 2 == 0, s"odd PCM byte count: ${data.length}")
    val sb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val samples = new Array[Short](data.length / 2)
    var i = 0
    while (i < samples.length) { samples(i) = sb.getShort(); i += 1 }
    Audio(sampleRate, samples)
  }
}
