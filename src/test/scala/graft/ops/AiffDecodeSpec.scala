package graft.ops

import graft.SparkTestBase

/** [[Multimodal.decodeAiff]] byte-level semantics: the 80-bit
  * extended sample rate, big-endian samples, SSND offset, chunk
  * walking, and rejection paths. */
class AiffDecodeSpec extends SparkTestBase {

  test("synthAiff round-trips: rate, count, and the exact sample pattern") {
    val a = Multimodal.decodeAiff(Multimodal.synthAiff(5L, 10)).get
    assert((a.channels, a.sampleRate, a.samples.length) == ((1, 16000, 10)))
    for (i <- 0 until 10)
      assert(a.samples(i) == ((((i * 7 + 5L) % 65536 + 65536) % 65536) - 32768).toShort)
  }

  test("non-power-of-two rates survive the 80-bit extended encoding") {
    for (rate <- Seq(8000, 22050, 44100, 48000, 11025)) {
      val a = Multimodal.decodeAiff(Multimodal.synthAiff(1L, 4, rate)).get
      assert(a.sampleRate == rate, s"rate $rate mangled to ${a.sampleRate}")
    }
  }

  test("SSND offset is honored") {
    val base = Multimodal.synthAiff(3L, 4)
    // rebuild with offset 2: shift samples right by 2 junk bytes
    val bb = java.nio.ByteBuffer.allocate(base.length + 2)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(java.util.Arrays.copyOfRange(base, 0, 12 + 26)) // FORM + COMM
    bb.put("SSND".getBytes("US-ASCII")).putInt(8 + 2 + 8)
      .putInt(2).putInt(0).putShort(0x7f7f.toShort) // 2 junk bytes
    val samplesStart = base.length - 8
    bb.put(java.util.Arrays.copyOfRange(base, samplesStart, base.length))
    // patch FORM size
    val arr = bb.array()
    val formSize = arr.length - 8
    for (k <- 0 to 3) arr(4 + k) = ((formSize >> (8 * (3 - k))) & 0xff).toByte
    val a = Multimodal.decodeAiff(arr).get
    assert(a.samples.length == 4)
    assert(a.samples(0) == ((((0 * 7 + 3L) % 65536 + 65536) % 65536) - 32768).toShort)
  }

  test("rejects: wrong magic, truncation, non-16-bit; decodePcm dispatches both") {
    val ok = Multimodal.synthAiff(1L, 4)
    assert(Multimodal.decodeAiff("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.decodeAiff(ok.take(30)).isEmpty)
    val bad = ok.clone(); bad(12 + 8 + 6 + 1) = 8 // COMM sampleSize 16 -> 8
    assert(Multimodal.decodeAiff(bad).isEmpty)
    assert(Multimodal.decodePcm(Multimodal.synthWav(2L, 4)).get.samples.length == 4)
    assert(Multimodal.decodePcm(ok).get.samples.length == 4)
  }

  test("A-law WAV: CCITT expansion, extremes, parity with the reference switch") {
    // reference anchors of the Sun/CCITT g711 arithmetic
    assert(Multimodal.alawToLinear(0x55.toByte) == -8)
    assert(Multimodal.alawToLinear(0xD5.toByte) == 8)
    assert(Multimodal.alawToLinear(0x2A.toByte) == -32256)
    assert(Multimodal.alawToLinear(0xAA.toByte) == 32256)
    // independent restatement of the reference decoder (the g711.c
    // switch shape) over ALL 256 codes
    def ref(code: Int): Int = {
      val a = code ^ 0x55
      var t = (a & 0x0f) << 4
      val seg = (a & 0x70) >> 4
      seg match {
        case 0 => t += 8
        case 1 => t += 0x108
        case _ => t += 0x108; t <<= seg - 1
      }
      if ((a & 0x80) != 0) t else -t
    }
    (0 until 256).foreach(c =>
      assert(Multimodal.alawToLinear(c.toByte).toInt == ref(c), s"code $c"))
    // monotone within the positive half
    val pos = (0 until 256).map(c => Multimodal.alawToLinear(c.toByte).toInt)
      .filter(_ > 0).sorted
    assert(pos == pos.distinct.sorted && pos.last == 32256)
    val a = Multimodal.decodeWav(Multimodal.synthAlawWav(3L, 10)).get
    assert(a.samples.length == 10 && a.sampleRate == 16000)
    assert(a.samples.toSeq == (0 until 10).map(k =>
      Multimodal.alawToLinear((((k * 7 + 3) % 256) & 0xff).toByte)))
  }

  test("μ-law WAV: CCITT expansion, extremes, dispatch, rejects") {
    // reference anchors of the Sun/CCITT table
    assert(Multimodal.ulawToLinear(0x00.toByte) == -32124)
    assert(Multimodal.ulawToLinear(0xFF.toByte) == 0)
    assert(Multimodal.ulawToLinear(0x7F.toByte) == 0)
    assert(Multimodal.ulawToLinear(0x80.toByte) == 32124)
    // monotone within the positive half (codes 0x80..0xFF descend)
    val pos = (0x80 to 0xFF).map(u => Multimodal.ulawToLinear(u.toByte).toInt)
    assert(pos == pos.sorted.reverse)
    val a = Multimodal.decodeWav(Multimodal.synthUlawWav(3L, 10)).get
    assert((a.channels, a.sampleRate, a.samples.length) == ((1, 16000, 10)))
    for (i <- 0 until 10)
      assert(a.samples(i) ==
        Multimodal.ulawToLinear((((i * 7 + 3L) % 256 + 256) % 256).toByte))
    assert(Multimodal.decodePcm(Multimodal.synthUlawWav(1L, 4)).isDefined)
    // μ-law declared with 16 bits, or linear with 8, rejects
    val bad = Multimodal.synthUlawWav(1L, 4)
    bad(34) = 16 // bitsPerSample 8 -> 16
    assert(Multimodal.decodeWav(bad).isEmpty)
  }

  test("crafted chunk sizes / SSND offsets reject instead of hanging or throwing") {
    def putBe32(a: Array[Byte], i: Int, v: Int): Unit =
      for (k <- 0 to 3) a(i + k) = ((v >> (8 * (3 - k))) & 0xff).toByte
    val ok = Multimodal.synthAiff(1L, 4)
    // COMM chunk size -8: the old walk advanced by 0 forever
    val negSize = ok.clone(); putBe32(negSize, 12 + 4, -8)
    assert(Multimodal.decodeAiff(negSize).isEmpty)
    // negative SSND offset -> negative sample start
    val negOff = ok.clone(); putBe32(negOff, 12 + 26 + 8, -1000)
    assert(Multimodal.decodeAiff(negOff).isEmpty)
    // SSND offset past the chunk end
    val bigOff = ok.clone(); putBe32(bigOff, 12 + 26 + 8, Int.MaxValue)
    assert(Multimodal.decodeAiff(bigOff).isEmpty)
    // huge chunk size that would overflow an Int cursor
    val hugeSize = ok.clone(); putBe32(hugeSize, 12 + 4, Int.MaxValue - 4)
    assert(Multimodal.decodeAiff(hugeSize).isEmpty)
    // same class on the WAV walk (LE sizes)
    val wav = Multimodal.synthWav(1L, 4)
    val wavNeg = wav.clone()
    for (k <- 0 to 3) wavNeg(16 + k) = (((-9) >> (8 * k)) & 0xff).toByte // fmt size -9
    assert(Multimodal.decodeWav(wavNeg).isEmpty)
  }
}
