package graft.ops

import graft.SparkTestBase
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** [[Multimodal.decodeGif]] / [[Multimodal.decodePng]] interop: the
  * LZW/DEFLATE arithmetic is pinned against the JDK's OWN javax.imageio
  * codecs in both directions — images this file's encoders produce must
  * decode identically under ImageIO, and ImageIO-encoded images
  * (including ones large and random enough to walk the LZW table
  * through every code width and a table reset) must decode identically
  * under this repo's decoders. That rules out the classic
  * variable-width off-by-one surviving a self-consistent
  * encode/decode pair. */
class GifDecodeSpec extends SparkTestBase {

  private def rgbOf(img: BufferedImage, x: Int, y: Int): (Int, Int, Int) = {
    val p = img.getRGB(x, y)
    ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
  }

  test("synthGif round-trips through decodeGif (plain and interlaced)") {
    for (interlaced <- Seq(false, true)) {
      val img = Multimodal.decodeGif(Multimodal.synthGif(37, 9, 11, interlaced))
        .getOrElse(fail(s"interlaced=$interlaced did not decode"))
      assert(img.width == 9 && img.height == 11 && img.channels == 3)
      for (y <- 0 until 11; x <- 0 until 9; c <- 0 until 3)
        assert((img.pixels((y * 9 + x) * 3 + c) & 0xff) == (37 + y) % 256,
          s"interlaced=$interlaced ($x,$y,$c)")
    }
  }

  test("ImageIO decodes synthGif identically (encoder interop)") {
    for (interlaced <- Seq(false, true)) {
      val bytes = Multimodal.synthGif(254, 23, 17, interlaced)
      val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(theirs != null, "ImageIO rejected synthGif output")
      val mine = Multimodal.decodeGif(bytes).get
      for (y <- 0 until 17; x <- 0 until 23) {
        val (r, g, b) = rgbOf(theirs, x, y)
        assert((mine.pixels((y * 23 + x) * 3) & 0xff,
                mine.pixels((y * 23 + x) * 3 + 1) & 0xff,
                mine.pixels((y * 23 + x) * 3 + 2) & 0xff) == ((r, g, b)), s"($x,$y)")
      }
    }
  }

  test("ImageIO decodes a LARGE synthGif identically (encoder width transitions)") {
    // 300x300 row-constant data builds ~6k run-length entries: the
    // encoder walks 9->10->11->12 bit codes and resets the table at
    // 4096 — a third-party decoder agreeing pins the boundary behavior
    val bytes = Multimodal.synthGif(11, 300, 300)
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(theirs != null)
    val mine = Multimodal.decodeGif(bytes).get
    for (y <- 0 until 300 by 7; x <- 0 until 300 by 11) {
      val (r, g, b) = rgbOf(theirs, x, y)
      val v = (11 + y) % 256
      assert(r == v && g == v && b == v, s"ImageIO ($x,$y)")
      assert((mine.pixels((y * 300 + x) * 3) & 0xff) == v, s"mine ($x,$y)")
    }
  }

  test("decodeGif matches ImageIO on an ImageIO-encoded random image (decoder interop)") {
    // 200x200 random gray: the LZW table fills through 9, 10, 11, 12
    // bit codes and resets at 4096 — every width transition exercised
    // by a third-party encoder
    val rnd = new scala.util.Random(42)
    val src = new BufferedImage(200, 200, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 200; x <- 0 until 200) {
      val v = rnd.nextInt(256)
      src.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val buf = new ByteArrayOutputStream()
    assert(ImageIO.write(src, "gif", buf), "JDK has no GIF writer?")
    val bytes = buf.toByteArray
    val mine = Multimodal.decodeGif(bytes)
      .getOrElse(fail("decodeGif rejected an ImageIO-produced GIF"))
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(mine.width == 200 && mine.height == 200)
    for (y <- 0 until 200; x <- 0 until 200) {
      val (r, g, b) = rgbOf(theirs, x, y)
      val base = (y * 200 + x) * 3
      assert((mine.pixels(base) & 0xff) == r &&
        (mine.pixels(base + 1) & 0xff) == g &&
        (mine.pixels(base + 2) & 0xff) == b, s"($x,$y)")
    }
  }

  test("decodePng matches ImageIO on an ImageIO-encoded random RGB image") {
    val rnd = new scala.util.Random(7)
    val src = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64)
      src.setRGB(x, y, rnd.nextInt(1 << 24))
    val buf = new ByteArrayOutputStream()
    assert(ImageIO.write(src, "png", buf))
    val mine = Multimodal.decodePng(buf.toByteArray)
      .getOrElse(fail("decodePng rejected an ImageIO-produced PNG"))
    assert(mine.width == 64 && mine.height == 48 && mine.channels == 3)
    for (y <- 0 until 48; x <- 0 until 64) {
      val (r, g, b) = rgbOf(src, x, y)
      val base = (y * 64 + x) * 3
      assert((mine.pixels(base) & 0xff) == r &&
        (mine.pixels(base + 1) & 0xff) == g &&
        (mine.pixels(base + 2) & 0xff) == b, s"($x,$y)")
    }
  }

  test("ImageIO decodes synthPng identically (PNG encoder interop)") {
    val bytes = Multimodal.synthPng(100, 13, 9, colorType = 6)
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(theirs != null, "ImageIO rejected synthPng output")
    for (y <- 0 until 9; x <- 0 until 13) {
      val (r, g, b) = rgbOf(theirs, x, y)
      assert(r == (100 + y) % 256 && g == r && b == r, s"($x,$y)")
    }
  }

  test("malformed GIFs return None, never throw") {
    val good = Multimodal.synthGif(5, 8, 8)
    assert(Multimodal.decodeGif(null).isEmpty)
    assert(Multimodal.decodeGif("GIF89a".getBytes).isEmpty)
    assert(Multimodal.decodeGif("NOTGIF!!".getBytes ++ good.drop(8)).isEmpty)
    assert(Multimodal.decodeGif(good.take(good.length / 2)).isEmpty, "truncated")
    // no global or local palette
    val noPal = good.clone(); noPal(10) = (noPal(10) & 0x7f).toByte
    assert(Multimodal.decodeGif(noPal).isEmpty, "palette-less must reject")
    // declared FRAME dims inflated so the pixel count can't match the
    // LZW stream (descriptor sits after the 6+7 header and 768-byte GCT)
    assert((good(781) & 0xff) == 0x2c, "image descriptor offset")
    val wrongDims = good.clone(); wrongDims(781 + 5) = 0x40.toByte
    assert(Multimodal.decodeGif(wrongDims).isEmpty)
  }

  test("decodeRaster dispatches GIF next to the other families") {
    assert(Multimodal.decodeRaster(Multimodal.synthGif(1, 4, 4)).get.channels == 3)
  }
}
