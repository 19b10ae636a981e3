package graft.ops

import graft.SparkTestBase

/** [[Multimodal.decodeBmp]] byte-level semantics: BGR→RGB channel
  * order, bottom-up vs top-down row order, 4-byte row padding, and
  * rejection of unsupported variants. */
class BmpDecodeSpec extends SparkTestBase {

  /** Hand-build a 2×2 24-bit BMP: distinct RGB per pixel so channel
    * and row order are unambiguous. `topDown` flips the height sign. */
  private def bmp2x2(topDown: Boolean): Array[Byte] = {
    // image coords: (0,0)=red (1,0)=green / (0,1)=blue (1,1)=white
    val rows = Array( // per image row, file stores BGR
      Array(0, 0, 255, 0, 255, 0), // y=0: red, green
      Array(255, 0, 0, 255, 255, 255)) // y=1: blue, white
    val rowBytes = 8 // 2*3 padded to 4-byte multiple
    val b = new Array[Byte](54 + rowBytes * 2)
    def le32(i: Int, v: Int): Unit = (0 to 3).foreach(k => b(i + k) = ((v >> (8 * k)) & 0xff).toByte)
    def le16(i: Int, v: Int): Unit = (0 to 1).foreach(k => b(i + k) = ((v >> (8 * k)) & 0xff).toByte)
    b(0) = 'B'; b(1) = 'M'
    le32(2, b.length); le32(10, 54); le32(14, 40)
    le32(18, 2); le32(22, if (topDown) -2 else 2)
    le16(26, 1); le16(28, 24); le32(30, 0); le32(34, rowBytes * 2)
    val fileRowForImageRow: Int => Int = y => if (topDown) y else 1 - y
    for (y <- 0 to 1; i <- rows(y).indices)
      b(54 + fileRowForImageRow(y) * rowBytes + i) = rows(y)(i).toByte
    b
  }

  private val wantRgb = Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)

  test("bottom-up BMP: padding skipped, rows unflipped, BGR becomes RGB") {
    val img = Multimodal.decodeBmp(bmp2x2(topDown = false)).get
    assert((img.width, img.height, img.channels) == ((2, 2, 3)))
    assert(img.pixels.map(_ & 0xff).toSeq == wantRgb)
  }

  test("top-down BMP (negative height) decodes to the same image") {
    val img = Multimodal.decodeBmp(bmp2x2(topDown = true)).get
    assert(img.pixels.map(_ & 0xff).toSeq == wantRgb)
  }

  test("unsupported variants and truncation reject cleanly") {
    val ok = bmp2x2(topDown = false)
    val bpp16 = ok.clone(); bpp16(28) = 16
    assert(Multimodal.decodeBmp(bpp16).isEmpty)
    val rle = ok.clone(); rle(30) = 1 // BI_RLE8
    assert(Multimodal.decodeBmp(rle).isEmpty)
    assert(Multimodal.decodeBmp(ok.take(53)).isEmpty)
    assert(Multimodal.decodeBmp(ok.take(60)).isEmpty) // pixel data truncated
    assert(Multimodal.decodeBmp("P5\n1 1\n255\nx".getBytes).isEmpty)
  }

  test("ASCII netpbm (P2/P3): samples parse, comments skip, rejects are clean") {
    val p2 = Multimodal.decodeNetpbm(Multimodal.synthPgmAscii(9L, 5, 4)).get
    assert((p2.width, p2.height, p2.channels) == ((5, 4, 1)))
    for (y <- 0 until 4; x <- 0 until 5)
      assert((p2.pixels(y * 5 + x) & 0xff) == (x + y + 9) % 256)
    val p3 = Multimodal.decodeNetpbm(Multimodal.synthPpmAscii(9L, 3, 2)).get
    assert((p3.width, p3.height, p3.channels) == ((3, 2, 3)))
    for (y <- 0 until 2; x <- 0 until 3; c <- 0 until 3)
      assert((p3.pixels((y * 3 + x) * 3 + c) & 0xff) == (x + y + 9) % 256)
    // ASCII == binary for the same pattern
    val bin = Multimodal.decodeNetpbm(Multimodal.synthPgm(9L, 5, 4)).get
    assert(p2.pixels.toSeq == bin.pixels.toSeq)
    // rejects: missing samples, sample > maxval, 10+-digit run
    assert(Multimodal.decodeNetpbm("P2\n2 2\n255\n1 2 3".getBytes).isEmpty)
    assert(Multimodal.decodeNetpbm("P2\n2 2\n255\n1 2 3 999".getBytes).isEmpty)
    assert(Multimodal.decodeNetpbm("P2\n2 99999999999\n255\n1".getBytes).isEmpty)
    // a tiny header declaring a huge raster must reject BEFORE any
    // allocation (the n > remaining-bytes bound), not OOM
    assert(Multimodal.decodeNetpbm("P2\n40000 40000\n255\n1".getBytes).isEmpty)
    // decodeRaster dispatches the ASCII family too
    assert(Multimodal.decodeRaster(Multimodal.synthPpmAscii(1L, 2, 2)).get.channels == 3)
  }

  test("overflow-crafted headers reject instead of throwing") {
    def putLe32(a: Array[Byte], i: Int, v: Int): Unit =
      for (k <- 0 to 3) a(i + k) = ((v >> (8 * k)) & 0xff).toByte
    val ok = bmp2x2(topDown = false)
    // w ~ 2^31/3: Int rowBytes overflows small/negative, Long math must catch it
    val hugeW = ok.clone(); putLe32(hugeW, 18, 0x2AAAAAAB)
    assert(Multimodal.decodeBmp(hugeW).isEmpty)
    // w*h*3 > Int.MaxValue with modest rowBytes*h
    val bigWh = ok.clone(); putLe32(bigWh, 18, 40000); putLe32(bigWh, 22, 40000)
    assert(Multimodal.decodeBmp(bigWh).isEmpty)
    // h = Int.MinValue: abs() is still negative
    val minH = ok.clone(); putLe32(minH, 22, Int.MinValue)
    assert(Multimodal.decodeBmp(minH).isEmpty)
  }

  test("decodeRaster dispatches both families; synthBmp round-trips its row pattern") {
    assert(Multimodal.decodeRaster(Multimodal.synthPgm(3, 4, 2)).get.channels == 1)
    val img = Multimodal.decodeRaster(Multimodal.synthBmp(7, 5, 4)).get
    assert((img.width, img.height, img.channels) == ((5, 4, 3)))
    // image row y must hold (7+y)%256 in every channel (bottom-up undone)
    for (y <- 0 until 4; x <- 0 until 5; c <- 0 until 3)
      assert((img.pixels((y * 5 + x) * 3 + c) & 0xff) == (7 + y) % 256)
  }
}
