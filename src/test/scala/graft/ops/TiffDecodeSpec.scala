package graft.ops

import graft.SparkTestBase
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** [[Tiff.decode]]: lossless, so interop with the JDK's own TIFF
  * plugin (JDK 9+) is EXACT equality in both directions, for both
  * supported compressions; big-endian structure and rejection of the
  * unsupported compressions are pinned directly. */
class TiffDecodeSpec extends SparkTestBase {

  private def writeTiff(img: BufferedImage, compression: Option[String]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    compression.foreach { c =>
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionType(c)
    }
    val buf = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    buf.toByteArray
  }

  test("synth round-trips through Tiff.decode and ImageIO identically") {
    val bytes = Tiff.synth(37, 200, 11) // rows wider than one PackBits run
    val mine = Tiff.decode(bytes).getOrElse(fail("synth did not decode"))
    assert(mine.width == 200 && mine.height == 11 && mine.channels == 1)
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(theirs != null, "ImageIO rejected synth TIFF")
    for (y <- 0 until 11; x <- 0 until 200) {
      val v = (37 + y) % 256
      assert((mine.pixels(y * 200 + x) & 0xff) == v, s"mine ($x,$y)")
      // raw raster sample: getRGB would gamma-convert linear gray
      assert(theirs.getRaster.getSample(x, y, 0) == v, s"ImageIO ($x,$y)")
    }
  }

  test("ImageIO-written gray and RGB, uncompressed and PackBits: exact equality") {
    val rnd = new scala.util.Random(42)
    for (compression <- Seq(None, Some("PackBits"));
         gray <- Seq(true, false)) {
      val src = new BufferedImage(37, 23,
        if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 23; x <- 0 until 37) src.setRGB(x, y, rnd.nextInt(1 << 24))
      val bytes = writeTiff(src, compression)
      val mine = Tiff.decode(bytes)
        .getOrElse(fail(s"rejected gray=$gray compression=$compression"))
      assert(mine.channels == (if (gray) 1 else 3))
      val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
      for (y <- 0 until 23; x <- 0 until 37; c <- 0 until mine.channels) {
        // raw raster samples: getRGB gamma-converts TYPE_BYTE_GRAY
        val t = theirs.getRaster.getSample(x, y, c)
        assert((mine.pixels((y * 37 + x) * mine.channels + c) & 0xff) == t,
          s"gray=$gray comp=$compression ($x,$y,$c)")
      }
    }
  }

  test("big-endian (MM) structure decodes") {
    // hand-built: MM header, one 3x2 gray uncompressed image
    val bb = java.nio.ByteBuffer.allocate(8 + 2 + 9 * 12 + 4 + 6)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    bb.putShort(9)
    val dataOff = 8 + 2 + 9 * 12 + 4
    def entry(tag: Int, typ: Int, cnt: Int, v: Int): Unit = {
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt)
      if (typ == 3) { bb.putShort(v.toShort); bb.putShort(0) } else bb.putInt(v)
      ()
    }
    entry(256, 3, 1, 3); entry(257, 3, 1, 2); entry(258, 3, 1, 8)
    entry(259, 3, 1, 1); entry(262, 3, 1, 1); entry(273, 4, 1, dataOff)
    entry(277, 3, 1, 1); entry(278, 3, 1, 2); entry(279, 4, 1, 6)
    bb.putInt(0)
    bb.put(Array[Byte](10, 20, 30, 40, 50, 60))
    val img = Tiff.decode(bb.array()).getOrElse(fail("BE TIFF rejected"))
    assert(img.width == 3 && img.height == 2)
    assert(img.pixels.toSeq == Seq[Byte](10, 20, 30, 40, 50, 60))
  }

  test("WhiteIsZero photometric inverts; LZW and truncation reject") {
    // WhiteIsZero: flip photometric in the synth (tag 262 entry value)
    val b = Tiff.synth(0, 4, 1) // row value 0
    // entry layout: header 8 + count 2, entries of 12; 262 is the 5th
    val photoOff = 8 + 2 + 4 * 12 + 8
    assert((b(photoOff) & 0xff) == 1, "synth photometric sanity")
    b(photoOff) = 0
    val inv = Tiff.decode(b).getOrElse(fail("WhiteIsZero rejected"))
    assert(inv.pixels.forall(p => (p & 0xff) == 255), "0 under WhiteIsZero is white")

    val src = new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_GRAY)
    val lzw = writeTiff(src, Some("LZW"))
    assert(Tiff.decode(lzw).isEmpty, "LZW must reject")
    val good = Tiff.synth(5, 8, 8)
    for (n <- Seq(3, 10, good.length / 2, good.length - 2))
      assert(Tiff.decode(good.take(n)).isEmpty, s"truncated to $n")
    assert(Multimodal.decodeRaster(good).isDefined, "dispatch reaches TIFF")
  }
}
