package graft.ops

import graft.SparkTestBase

/** [[Multimodal.decodePng]]: real DEFLATE decode through the JDK
  * Inflater — round-trips for every color type with all five row
  * filters exercised, alpha dropped, and the untrusted-bytes contract
  * (malformed/bomb inputs return None, never throw or allocate big). */
class PngDecodeSpec extends SparkTestBase {

  private def expected(seed: Long, w: Int, h: Int, cOut: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * cOut)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until cOut)
      out((y * w + x) * cOut + c) = ((((seed + y) % 256) + 256) % 256).toByte
    out
  }

  test("round-trip gray / RGB / gray+alpha / RGBA with filter cycle 0..4") {
    for ((ctype, cOut) <- Seq(0 -> 1, 2 -> 3, 4 -> 1, 6 -> 3)) {
      val bytes = Multimodal.synthPng(seed = 37, w = 7, h = 11, colorType = ctype)
      val img = Multimodal.decodePng(bytes)
        .getOrElse(fail(s"colorType $ctype did not decode"))
      assert(img.width == 7 && img.height == 11 && img.channels == cOut)
      assert(img.pixels.toSeq == expected(37, 7, 11, cOut).toSeq,
        s"pixels for colorType $ctype")
    }
  }

  test("height >= 5 exercises every filter type (one per row, cycling)") {
    // h=5 guarantees rows with filters 0,1,2,3,4; seed near 255 wraps
    val img = Multimodal.decodePng(Multimodal.synthPng(254, 9, 5, 2)).get
    assert(img.pixels.toSeq == expected(254, 9, 5, 3).toSeq)
  }

  test("decodeRaster dispatches PNG next to netpbm and BMP") {
    assert(Multimodal.decodeRaster(Multimodal.synthPng(1, 4, 4, 2)).get.channels == 3)
    assert(Multimodal.decodeRaster(Multimodal.synthPgm(1, 4, 4)).get.channels == 1)
    assert(Multimodal.decodeRaster(Multimodal.synthBmp(1, 4, 4)).get.channels == 3)
  }

  test("malformed inputs return None, never throw") {
    val good = Multimodal.synthPng(5, 6, 6, 2)
    def mutate(i: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(i) = v; b
    }
    assert(Multimodal.decodePng(null).isEmpty)
    assert(Multimodal.decodePng(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodePng(mutate(0, 'X')).isEmpty, "bad signature")
    assert(Multimodal.decodePng(good.take(good.length - 7)).isEmpty, "truncated")
    // corrupt one IDAT payload byte -> chunk CRC mismatch
    assert(Multimodal.decodePng(mutate(8 + 25 + 8 + 2,
      (good(8 + 25 + 8 + 2) ^ 0x5a).toByte)).isEmpty, "CRC mismatch")
    // interlace flag set (and IHDR CRC fixed up to isolate the check)
    val ilaced = good.clone()
    ilaced(8 + 8 + 12) = 1
    val crc = new java.util.zip.CRC32()
    crc.update(ilaced, 12, 17)
    val cv = crc.getValue
    for (k <- 0 until 4) ilaced(8 + 21 + k) = ((cv >> (24 - 8 * k)) & 0xff).toByte
    assert(Multimodal.decodePng(ilaced).isEmpty, "interlaced rejected")
  }

  test("decompression bomb: huge declared dims with tiny IDAT reject pre-alloc") {
    // hand-build a valid-CRC PNG declaring 20000x20000 gray (raw size
    // ~400 MB, inside Int range so the dimension guards pass); IDAT is
    // 10 bytes. The raw-size-vs-input DEFLATE-ratio bound must reject
    // before allocating.
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] =
        Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      out.write(be32(data.length))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val c = new java.util.zip.CRC32(); c.update(tb); c.update(data)
      out.write(be32(c.getValue))
    }
    val dim = 20000
    val ihdr = new Array[Byte](13)
    for ((v, o) <- Seq(dim -> 0, dim -> 4)) {
      ihdr(o) = (v >> 24).toByte; ihdr(o + 1) = (v >> 16).toByte
      ihdr(o + 2) = (v >> 8).toByte; ihdr(o + 3) = v.toByte
    }
    ihdr(8) = 8; ihdr(9) = 0
    chunk("IHDR", ihdr)
    chunk("IDAT", new Array[Byte](10))
    chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.decodePng(out.toByteArray).isEmpty)
  }
}
