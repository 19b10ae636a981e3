package graft.ops

import graft.SparkTestBase

/** Untrusted-bytes fuzz sweep over EVERY decoder the corpus pipelines
  * run on raw document bytes: random garbage, bit-flipped valid files,
  * and truncations at every prefix length must all return None or a
  * value — never throw, hang, or allocate unboundedly. This turns the
  * per-decoder hardening contracts into one standing invariant that
  * automatically covers future decoders added to the dispatchers. */
class DecoderFuzzSpec extends SparkTestBase {

  private val rasterDecoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "netpbm" -> Multimodal.decodeNetpbm _,
    "bmp" -> Multimodal.decodeBmp _,
    "png" -> Multimodal.decodePng _,
    "gif" -> Multimodal.decodeGif _,
    "jpeg" -> Jpeg.decode _,
    "tiff" -> Tiff.decode _,
    "rasterDispatch" -> Multimodal.decodeRaster _,
    "wav" -> Multimodal.decodeWav _,
    "aiff" -> Multimodal.decodeAiff _,
    "pcmDispatch" -> Multimodal.decodePcm _)

  private def validSamples: Seq[(String, Array[Byte])] = Seq(
    "pgm" -> Multimodal.synthPgm(3, 6, 5),
    "pgmAscii" -> Multimodal.synthPgmAscii(3, 6, 5),
    "bmp" -> Multimodal.synthBmp(3, 6, 5),
    "png" -> Multimodal.synthPng(3, 6, 5, colorType = 2),
    "gif" -> Multimodal.synthGif(3, 6, 5),
    "gifI" -> Multimodal.synthGif(3, 6, 5, interlaced = true),
    "wav" -> Multimodal.synthWav(3, 64),
    "ulaw" -> Multimodal.synthUlawWav(3, 64),
    "aiff" -> Multimodal.synthAiff(3, 64),
    "alaw" -> Multimodal.synthAlawWav(3, 64),
    "adpcm" -> Multimodal.synthImaAdpcmWav(3, 2),
    "tiff" -> Tiff.synth(3, 9, 7),
    "jpeg" -> {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, (x * 16 + y) * 789)
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", buf)
      buf.toByteArray
    })

  private def assertNoThrow(tag: String, bytes: Array[Byte]): Unit =
    rasterDecoders.foreach { case (name, dec) =>
      try { dec(bytes); () }
      catch { case e: Throwable =>
        fail(s"$name threw on $tag: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }

  test("random garbage never throws in any decoder") {
    val rnd = new scala.util.Random(12345)
    for (i <- 0 until 300) {
      val len = rnd.nextInt(400)
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      assertNoThrow(s"garbage[$i] len=$len", b)
    }
  }

  test("every truncation of every valid file never throws") {
    validSamples.foreach { case (tag, full) =>
      (0 until full.length).foreach(n =>
        assertNoThrow(s"$tag truncated to $n", full.take(n)))
    }
  }

  test("bit-flipped valid files never throw") {
    val rnd = new scala.util.Random(999)
    validSamples.foreach { case (tag, full) =>
      for (i <- 0 until 200) {
        val b = full.clone()
        val pos = rnd.nextInt(b.length)
        b(pos) = (b(pos) ^ (1 << rnd.nextInt(8))).toByte
        assertNoThrow(s"$tag flip[$i]@$pos", b)
      }
    }
  }

  test("magic-prefixed garbage (passes dispatch, fails parse) never throws") {
    val rnd = new scala.util.Random(777)
    val magics = Seq("P5\n", "P2\n", "BM", "GIF89a",
      new String(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
        0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte).map(_.toChar)),
      "RIFF", "FORM")
    for (m <- magics; i <- 0 until 60) {
      val tail = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(tail)
      assertNoThrow(s"magic '$m'[$i]",
        m.toCharArray.map(_.toByte) ++ tail)
    }
  }
}
