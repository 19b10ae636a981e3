package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, processed per-partition (the Scala
 * analogue of a batched Pandas UDF: one iterator per partition, codec
 * state initialized once per partition, records streamed through).
 *
 * Image decoding is REAL for all five mainstream raster families
 * (netpbm, BMP, PNG, GIF, baseline JPEG — see [[decodeRaster]]), as
 * is codec-free audio (WAV/AIFF/G.711). Audio/video transform codecs
 * (MP3/AAC/H.264) need ffmpeg-class libraries absent here, so
 * `decodeVideo` is a clearly-marked stub and `extractFeatures` uses a
 * deterministic byte-level fake — the Spark-side contract (binary
 * schema, partition iteration, typed output) is real and tested.
 */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)

  case class MediaFeatures(doc_id: Long, n_bytes: Int, head_byte: Int, content_md5: String)

  case class Frame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Audio/video transform codecs (MP3/AAC/video) would go here —
    * those need ffmpeg-class libraries, absent in this container.
    * Deliberately unimplemented. The IMAGE families are all real:
    * netpbm/BMP are codec-free, PNG inflates through the JDK's own
    * Inflater ([[decodePng]]), GIF's LZW and baseline JPEG's
    * Huffman+IDCT are implemented directly ([[decodeGif]],
    * [[Jpeg.decode]]); WAV/AIFF/G.711 cover the codec-free audio. */
  def decodeVideo(bytes: Array[Byte]): Nothing =
    throw new NotImplementedError(
      "decodeVideo: audio/video transform codecs unavailable in this environment (stub)")

  /** A decoded raster: interleaved unsigned bytes, `channels` per pixel. */
  case class ImageData(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /**
   * REAL decode for the codec-free netpbm formats — binary P5
   * (grayscale) / P6 (RGB) and ASCII P2 / P3, maxval ≤ 255: magic,
   * whitespace/comment tokens, width/height/maxval header, then raw
   * bytes (P5/P6) or whitespace-separated decimal samples (P2/P3).
   * Pure byte parsing, no library; untrusted-bytes contract — a digit
   * run longer than 9 chars or dimensions whose product overflows an
   * Int return None instead of throwing. Returns None for anything
   * else (video/audio payloads — see [[decodeVideo]]).
   */
  def decodeNetpbm(bytes: Array[Byte]): Option[ImageData] = {
    if (bytes == null || bytes.length < 2 || bytes(0) != 'P') return None
    val (channels, ascii) = bytes(1) match {
      case '2' => (1, true)
      case '3' => (3, true)
      case '5' => (1, false)
      case '6' => (3, false)
      case _   => return None
    }
    var i = 2
    def nextInt(): Option[Int] = {
      // skip whitespace and '#'-comments
      while (i < bytes.length &&
        (bytes(i).toChar.isWhitespace || bytes(i) == '#')) {
        if (bytes(i) == '#') while (i < bytes.length && bytes(i) != '\n') i += 1
        else i += 1
      }
      val start = i
      while (i < bytes.length && bytes(i).toChar.isDigit) i += 1
      // a crafted 10+-digit run would throw NumberFormatException
      if (i == start || i - start > 9) None
      else Some(new String(bytes, start, i - start).toInt)
    }
    for {
      w <- nextInt(); h <- nextInt(); maxval <- nextInt()
      if maxval > 0 && maxval <= 255 && w > 0 && h > 0
      nL = w.toLong * h * channels
      if nL <= Int.MaxValue
      n = nL.toInt
      // the declared pixel count must be plausible for the remaining
      // input BEFORE any allocation: a ~25-byte 'P2\n40000 40000\n255\n'
      // header would otherwise allocate 1.6 GB per task — each ASCII
      // sample needs at least one byte, raw samples exactly n
      if n <= bytes.length - i
      pixels <- {
        if (ascii) {
          // whitespace-separated decimal samples; each must exist and
          // fit the declared maxval
          val out = new Array[Byte](n)
          var k = 0
          var ok = true
          while (ok && k < n) {
            nextInt() match {
              case Some(v) if v >= 0 && v <= maxval => out(k) = v.toByte; k += 1
              case _ => ok = false
            }
          }
          if (ok) Some(out) else None
        } else if (i < bytes.length && bytes(i).toChar.isWhitespace &&
          bytes.length - (i + 1) >= n) {
          // exactly ONE whitespace byte separates header from raw samples
          Some(java.util.Arrays.copyOfRange(bytes, i + 1, i + 1 + n))
        } else None
      }
    } yield ImageData(w, h, channels, pixels)
  }

  /** Synthesize a P2 (ASCII grayscale) image with [[synthPgm]]'s exact
    * pixel pattern — (x+y+seed) mod 256 — so the two share an oracle. */
  def synthPgmAscii(seed: Long, w: Int, h: Int): Array[Byte] = {
    val sb = new StringBuilder(s"P2\n# ascii fixture\n$w $h\n255\n")
    for (y <- 0 until h; x <- 0 until w)
      sb.append(((x + y + seed) % 256 + 256) % 256).append(if (x == w - 1) "\n" else " ")
    sb.toString.getBytes("US-ASCII")
  }

  /** Synthesize a P3 (ASCII RGB) image with the same per-pixel value in
    * all three channels — luma sums are exactly 3× the P2 fixture's. */
  def synthPpmAscii(seed: Long, w: Int, h: Int): Array[Byte] = {
    val sb = new StringBuilder(s"P3\n$w $h\n255\n")
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((x + y + seed) % 256 + 256) % 256
      sb.append(v).append(' ').append(v).append(' ').append(v)
        .append(if (x == w - 1) "\n" else " ")
    }
    sb.toString.getBytes("US-ASCII")
  }

  /** Nearest-neighbor resize (the batched-preprocessing primitive). */
  def resizeNearest(img: ImageData, w: Int, h: Int): ImageData = {
    val out = new Array[Byte](w * h * img.channels)
    var y = 0
    while (y < h) {
      val sy = y * img.height / h
      var x = 0
      while (x < w) {
        val sx = x * img.width / w
        var c = 0
        while (c < img.channels) {
          out((y * w + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    ImageData(w, h, img.channels, out)
  }

  /** Synthesize a P5 gradient image (pixel (x,y) = (x+y+seed) mod 256)
    * — deterministic test/oracle fixture with a closed-form luma sum. */
  def synthPgm(seed: Long, w: Int, h: Int): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(header.length + y * w + x) = (((x + y + seed) % 256 + 256) % 256).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /**
   * REAL decode for uncompressed 24-bit BI_RGB Windows BMP — the
   * second codec-free raster family next to netpbm: LE header fields,
   * 4-byte row padding, bottom-up row order (top-down via negative
   * height), BGR sample order converted to the [[ImageData]] RGB
   * convention. Pure byte parsing, no library; anything else
   * (palettes, RLE, 16/32 bpp) returns None.
   */
  def decodeBmp(bytes: Array[Byte]): Option[ImageData] = {
    if (bytes == null || bytes.length < 54 ||
      bytes(0) != 'B' || bytes(1) != 'M') return None
    def le16(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def le32(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
      ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
    val off = le32(10)
    val w = le32(18)
    val hRaw = le32(22)
    val bpp = le16(28)
    val comp = le32(30)
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue || bpp != 24 || comp != 0) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    // all size arithmetic in Long: a crafted w near 2^31/3 overflows
    // the Int rowBytes to a small/negative value that would pass the
    // bounds check and then throw instead of returning None
    val rowBytesL = (w.toLong * 3 + 3) & ~3L
    val outLenL = w.toLong * h * 3
    if (off < 54 || outLenL > Int.MaxValue ||
      off.toLong + rowBytesL * h > bytes.length) return None
    val rowBytes = rowBytesL.toInt
    val out = new Array[Byte](outLenL.toInt)
    var y = 0
    while (y < h) {
      val srcRow = off + (if (topDown) y else h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3
        val d = (y * w + x) * 3
        out(d) = bytes(s + 2) // R (file order is BGR)
        out(d + 1) = bytes(s + 1)
        out(d + 2) = bytes(s)
        x += 1
      }
      y += 1
    }
    Some(ImageData(w, h, 3, out))
  }

  /**
   * REAL decode for 8-bit-depth non-interlaced PNG — gray, RGB,
   * gray+alpha, RGBA. PNG's only compression is zlib DEFLATE, which
   * the JDK itself ships (`java.util.zip.Inflater`), so unlike
   * JPEG/MP3 no external codec library is needed: parse the chunk
   * stream (CRC-32 verified per chunk), inflate the concatenated IDAT
   * payload, reverse the five per-row filters (None/Sub/Up/Average/
   * Paeth), and drop alpha to the [[ImageData]] gray/RGB convention.
   *
   * Untrusted-bytes contract (this runs on raw corpus bytes): bad
   * signature/CRC, short or negative chunk lengths, non-8-bit depth,
   * palette or interlaced images, dimension products that overflow an
   * Int, and decompression bombs (declared raw size implausible for
   * the available IDAT bytes — DEFLATE's hard ratio bound is 1032:1)
   * all return None before any large allocation, never throw.
   */
  def decodePng(bytes: Array[Byte]): Option[ImageData] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (bytes == null || bytes.length < 8 + 25 + 12 ||
      !sig.indices.forall(i => bytes(i) == sig(i))) return None
    def be32(i: Int): Long = ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
      ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    var pos = 8L
    var w, h, cIn = 0
    var sawIhdr, sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend) {
      if (pos + 12 > bytes.length) return None
      val len = be32(pos.toInt)
      if (len < 0 || pos + 12 + len > bytes.length) return None
      val typ = new String(bytes, pos.toInt + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos.toInt + 4, 4 + len.toInt)
      if (crc.getValue != be32((pos + 8 + len).toInt)) return None
      typ match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return None
          sawIhdr = true
          val d = pos.toInt + 8
          val wL = be32(d); val hL = be32(d + 4)
          val depth = bytes(d + 8) & 0xff
          val ctype = bytes(d + 9) & 0xff
          val comp = bytes(d + 10) & 0xff
          val filt = bytes(d + 11) & 0xff
          val ilace = bytes(d + 12) & 0xff
          cIn = ctype match {
            case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
            case _ => return None // palette (3) needs PLTE; reject
          }
          if (wL <= 0 || hL <= 0 || depth != 8 || comp != 0 || filt != 0 ||
            ilace != 0) return None
          // cap dims BEFORE the product so the Long guard itself
          // cannot overflow ((2^32*4+1)*2^32 wraps a Long)
          if (wL > (1 << 24) || hL > (1 << 24) ||
            (wL * cIn + 1) * hL > Int.MaxValue) return None
          w = wL.toInt; h = hL.toInt
        case "IDAT" =>
          if (!sawIhdr) return None
          idat.write(bytes, pos.toInt + 8, len.toInt)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      pos += 12 + len
    }
    if (!sawIhdr) return None
    val comp = idat.toByteArray
    val rowLen = w * cIn + 1
    val rawLen = rowLen * h
    // bomb guard BEFORE allocation: DEFLATE expands at most ~1032x
    if (rawLen.toLong > comp.length.toLong * 1040L + 4096L) return None
    val raw = new Array[Byte](rawLen)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(comp)
      var got = 0
      var stalled = false
      while (got < rawLen && !inf.finished() && !stalled) {
        val n = try inf.inflate(raw, got, rawLen - got)
        catch { case _: java.util.zip.DataFormatException => return None }
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
        got += n
      }
      if (got != rawLen) return None
    } finally inf.end()
    // reverse per-row filters in place (spec: recon bytes feed the
    // predictors of subsequent pixels/rows)
    val bpp = cIn
    var y = 0
    while (y < h) {
      val rs = y * rowLen
      val f = raw(rs) & 0xff
      if (f > 4) return None
      var x = 1
      while (x < rowLen) {
        val a = if (x > bpp) raw(rs + x - bpp) & 0xff else 0
        val b = if (y > 0) raw(rs - rowLen + x) & 0xff else 0
        val c = if (x > bpp && y > 0) raw(rs - rowLen + x - bpp) & 0xff else 0
        val rec = f match {
          case 0 => raw(rs + x) & 0xff
          case 1 => (raw(rs + x) & 0xff) + a
          case 2 => (raw(rs + x) & 0xff) + b
          case 3 => (raw(rs + x) & 0xff) + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            (raw(rs + x) & 0xff) + pred
        }
        raw(rs + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // drop alpha to the gray/RGB ImageData convention
    val cOut = if (cIn == 2) 1 else if (cIn == 4) 3 else cIn
    val out = new Array[Byte](w * h * cOut)
    var p = 0
    while (p < w * h) {
      val src = (p / w) * rowLen + 1 + (p % w) * cIn
      var ch = 0
      while (ch < cOut) { out(p * cOut + ch) = raw(src + ch); ch += 1 }
      p += 1
    }
    Some(ImageData(w, h, cOut, out))
  }

  /** Deterministic 8-bit PNG whose image row y holds (seed + y) % 256
    * in every color channel (alpha, when present, is 255 and dropped
    * by decode) — the synthBmp closed form, produced through a REAL
    * zlib Deflater stream with the row filter cycling 0..4 so every
    * unfilter branch is exercised. `colorType` ∈ {0 gray, 2 RGB,
    * 4 gray+alpha, 6 RGBA}. */
  def synthPng(seed: Long, w: Int, h: Int, colorType: Int = 2): Array[Byte] = {
    val cIn = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      case _ => throw new IllegalArgumentException(s"colorType $colorType")
    }
    val hasAlpha = colorType == 4 || colorType == 6
    val rowLen = w * cIn + 1
    val raw = new Array[Byte](rowLen * h)
    var y = 0
    while (y < h) {
      val v = (((seed + y) % 256 + 256) % 256).toInt
      val f = y % 5
      raw(y * rowLen) = f.toByte
      // build the RECON row, then filter it forward
      val recon = new Array[Int](w * cIn)
      var i = 0
      while (i < w * cIn) {
        recon(i) = if (hasAlpha && (i % cIn) == cIn - 1) 255 else v
        i += 1
      }
      val prev = new Array[Int](w * cIn)
      if (y > 0) {
        val pv = (((seed + y - 1) % 256 + 256) % 256).toInt
        var j = 0
        while (j < w * cIn) {
          prev(j) = if (hasAlpha && (j % cIn) == cIn - 1) 255 else pv
          j += 1
        }
      }
      var x = 0
      while (x < w * cIn) {
        val a = if (x >= cIn) recon(x - cIn) else 0
        val b = if (y > 0) prev(x) else 0
        val c = if (x >= cIn && y > 0) prev(x - cIn) else 0
        val filtered = f match {
          case 0 => recon(x)
          case 1 => recon(x) - a
          case 2 => recon(x) - b
          case 3 => recon(x) - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            recon(x) - pred
        }
        raw(y * rowLen + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val compBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) compBuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val comp = compBuf.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] = Array((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)
      out.write(be32(data.length))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue))
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >> 24).toByte; ihdr(1) = (w >> 16).toByte
    ihdr(2) = (w >> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >> 24).toByte; ihdr(5) = (h >> 16).toByte
    ihdr(6) = (h >> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = colorType.toByte; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk("IHDR", ihdr)
    chunk("IDAT", comp)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /**
   * REAL decode for GIF87a/GIF89a (first frame): LZW is plain integer
   * arithmetic — variable-width codes 3..12 bits LSB-first, a 4096-
   * entry string table with clear/EOI codes and the KwKwK case — so
   * like PNG no codec library is needed. Global and local color
   * tables, interlaced images (the 8/8/4/2 four-pass row order), and
   * sub-block framing are handled; palette indices expand to RGB.
   * Interop is pinned in the spec against the JDK's own javax.imageio
   * GIF reader/writer, not just this file's encoder.
   *
   * Untrusted-bytes contract: truncated streams, out-of-range codes,
   * palette-index overflow, oversized dimension products and
   * pixel-count mismatches all return None, never throw; the output
   * allocation is bounded by the declared frame size (≤ 2^24 pixels).
   */
  def decodeGif(bytes: Array[Byte]): Option[ImageData] = {
    if (bytes == null || bytes.length < 14) return None
    val magic = new String(bytes, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    def le16(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    val flags = bytes(10) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 3 * (1 << ((flags & 7) + 1))
      if (pos + n > bytes.length) return None
      gct = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
    }
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          var sz = if (pos < bytes.length) bytes(pos) & 0xff else return None
          while (sz != 0) {
            pos += 1 + sz
            if (pos >= bytes.length) return None
            sz = bytes(pos) & 0xff
          }
          pos += 1
        case 0x2c => // image descriptor
          if (pos + 10 > bytes.length) return None
          val iw = le16(pos + 5); val ih = le16(pos + 7)
          val iflags = bytes(pos + 9) & 0xff
          pos += 10
          if (iw <= 0 || ih <= 0 || iw.toLong * ih > (1 << 24)) return None
          var palette = gct
          if ((iflags & 0x80) != 0) {
            val n = 3 * (1 << ((iflags & 7) + 1))
            if (pos + n > bytes.length) return None
            palette = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
            pos += n
          }
          if (palette == null || pos >= bytes.length) return None
          val minCodeSize = bytes(pos) & 0xff; pos += 1
          // concat the LZW sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var sz = if (pos < bytes.length) bytes(pos) & 0xff else return None
          while (sz != 0) {
            if (pos + 1 + sz > bytes.length) return None
            data.write(bytes, pos + 1, sz)
            pos += 1 + sz
            if (pos >= bytes.length) return None
            sz = bytes(pos) & 0xff
          }
          val idx = lzwDecode(data.toByteArray, minCodeSize, iw * ih)
            .getOrElse(return None)
          val ordered =
            if ((iflags & 0x40) != 0) deinterlace(idx, iw, ih) else idx
          val entries = palette.length / 3
          val out = new Array[Byte](iw * ih * 3)
          var p = 0
          while (p < iw * ih) {
            val ci = ordered(p) & 0xff
            if (ci >= entries) return None
            out(p * 3) = palette(ci * 3)
            out(p * 3 + 1) = palette(ci * 3 + 1)
            out(p * 3 + 2) = palette(ci * 3 + 2)
            p += 1
          }
          return Some(ImageData(iw, ih, 3, out))
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }

  /** GIF interlace: sequential rows arrive in four passes (start 0
    * step 8, start 4 step 8, start 2 step 4, start 1 step 2). */
  private def deinterlace(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](idx.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) {
        System.arraycopy(idx, src * w, out, y * w, w)
        src += 1
        y += step
      }
    }
    out
  }

  /** GIF LZW decode: `minCodeSize`-rooted variable-width codes,
    * LSB-first bit order, clear/EOI, KwKwK. Returns exactly
    * `nPixels` index bytes or None. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
                        nPixels: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val first = new Array[Byte](4096)
    val len = new Array[Int](4096)
    var i = 0
    while (i < clear) { suffix(i) = i.toByte; first(i) = i.toByte; len(i) = 1; i += 1 }
    var width = minCodeSize + 1
    var next = eoi + 1
    val out = new Array[Byte](nPixels)
    var outPos = 0
    var bitPos = 0L
    val totalBits = data.length.toLong * 8
    def read(): Int = {
      if (bitPos + width > totalBits) return -1
      var v = 0
      var b = 0
      while (b < width) {
        val bit = (data(((bitPos + b) >> 3).toInt) >> ((bitPos + b) & 7).toInt) & 1
        v |= bit << b
        b += 1
      }
      bitPos += width
      v
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) {
        // stream ended without EOI: accept only a fully-filled frame
        return if (outPos == nPixels) Some(out) else None
      } else if (code == clear) {
        width = minCodeSize + 1; next = eoi + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else {
        val kwkwk = code == next && prev != -1
        if (code > next || (code == next && prev == -1)) return None
        // new entry = prevSeq + first(code) — for KwKwK first(code) is
        // first(prev) since the entry being defined IS prev+first(prev)
        val f = if (kwkwk) first(prev) else first(code)
        if (prev != -1 && next < 4096) {
          prefix(next) = prev; suffix(next) = f
          first(next) = first(prev); len(next) = len(prev) + 1
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        val l = len(code)
        if (outPos + l > nPixels) return None
        var j = outPos + l - 1
        var c = code
        while (c >= clear) { out(j) = suffix(c); j -= 1; c = prefix(c) }
        out(j) = suffix(c)
        outPos += l
        prev = code
      }
    }
    if (outPos == nPixels) Some(out) else None
  }

  /** GIF LZW encode (the dictionary-building encoder, not a
    * literal-spam shortcut): greedy longest-match against a chained
    * hash of (prefixCode, byte), clear-and-reset at 4096 entries,
    * code width growing in lockstep with the decoder's rule. */
  private[ops] def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L
    var curBits = 0
    var width = minCodeSize + 1
    def emit(code: Int): Unit = {
      cur |= code.toLong << curBits
      curBits += width
      while (curBits >= 8) { out.write((cur & 0xff).toInt); cur >>= 8; curBits -= 8 }
    }
    val dict = new java.util.HashMap[Long, Integer]()
    var next = eoi + 1
    emit(clear)
    var w = -1
    var i = 0
    while (i < indices.length) {
      val k = indices(i) & 0xff
      if (w < 0) w = k
      else {
        val key = w.toLong << 8 | k
        val hit = dict.get(key)
        if (hit != null) w = hit.intValue
        else {
          emit(w)
          if (next < 4096) {
            // the width check runs BEFORE the add (one step later in
            // stream time than a post-add check): the decoder learns
            // each entry one code later than the encoder creates it,
            // so the de facto GIF convention has the encoder keep the
            // old width for exactly one emission past the table
            // crossing 2^width — pinned by the ImageIO interop specs
            // (a post-add bump here desyncs every decoder at entry
            // 2^width and scrambles all later rows)
            if (next == (1 << width) && width < 12) width += 1
            dict.put(key, next)
            next += 1
          } else {
            emit(clear)
            dict.clear(); next = eoi + 1; width = minCodeSize + 1
          }
          w = k
        }
      }
      i += 1
    }
    if (w >= 0) emit(w)
    emit(eoi)
    if (curBits > 0) out.write((cur & 0xff).toInt)
    out.toByteArray
  }

  /** Deterministic first-frame GIF whose image row y holds
    * (seed + y) % 256 through a 256-entry grayscale palette — the
    * synthBmp/synthPng closed form, produced through the real LZW
    * encoder (row-constant data exercises the KwKwK path heavily). */
  def synthGif(seed: Long, w: Int, h: Int, interlaced: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0x80 | 0x07) // GCT present, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c); le16(0); le16(0); le16(w); le16(h)
    out.write(if (interlaced) 0x40 else 0x00)
    val rowFor = new Array[Int](h)
    if (interlaced) {
      var src = 0
      for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
        var y = start
        while (y < h) { rowFor(src) = y; src += 1; y += step }
      }
    } else (0 until h).foreach(y => rowFor(y) = y)
    val idx = new Array[Byte](w * h)
    var r = 0
    while (r < h) {
      val v = (((seed + rowFor(r)) % 256 + 256) % 256).toByte
      java.util.Arrays.fill(idx, r * w, (r + 1) * w, v)
      r += 1
    }
    out.write(8) // min LZW code size
    val lzw = lzwEncode(idx, 8)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b)
    out.toByteArray
  }

  /** Library-free raster dispatch: netpbm (P2/P3/P5/P6), uncompressed
    * 24-bit BMP, 8-bit PNG (DEFLATE via the JDK's own Inflater), GIF
    * (LZW integer arithmetic), baseline JPEG (Huffman + IDCT — see
    * [[Jpeg]]), or TIFF (none/PackBits — see [[Tiff]]) — every image
    * pipeline decodes through this, so a corpus can mix the six
    * families freely. */
  def decodeRaster(bytes: Array[Byte]): Option[ImageData] =
    decodeNetpbm(bytes).orElse(decodeBmp(bytes)).orElse(decodePng(bytes))
      .orElse(decodeGif(bytes)).orElse(Jpeg.decode(bytes))
      .orElse(Tiff.decode(bytes))

  /** Deterministic bottom-up 24-bit BMP whose image row y holds
    * (seed + y) % 256 in all three channels — closed-form sums for
    * the oracle while the engine really parses headers, padding, row
    * order, and BGR. */
  def synthBmp(seed: Long, w: Int, h: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val size = 54 + rowBytes * h
    val b = new Array[Byte](size)
    def putLe32(i: Int, v: Int): Unit = {
      b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
      b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLe16(i: Int, v: Int): Unit = {
      b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    putLe32(2, size); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, w); putLe32(22, h) // positive = bottom-up
    putLe16(26, 1); putLe16(28, 24); putLe32(30, 0)
    putLe32(34, rowBytes * h)
    var fy = 0
    while (fy < h) {
      val y = h - 1 - fy // bottom-up file order
      val v = (((seed + y) % 256 + 256) % 256).toByte
      val base = 54 + fy * rowBytes
      var x = 0
      while (x < w * 3) { b(base + x) = v; x += 1 }
      fy += 1
    }
    b
  }

  /** A decoded PCM clip: interleaved 16-bit samples. */
  case class AudioData(channels: Int, sampleRate: Int, samples: Array[Short])

  /** G.711 μ-law byte → 16-bit linear sample (the Sun/CCITT
    * ulaw2linear reference arithmetic): complement, split into
    * sign/exponent/mantissa, expand with the 0x84 bias. Max magnitude
    * ±32124; 0xFF decodes to 0. */
  def ulawToLinear(u: Byte): Short = {
    val b = (~u) & 0xff
    var t = ((b & 0x0f) << 3) + 0x84
    t <<= (b >> 4) & 0x07
    (if ((b & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** IMA/DVI ADPCM step-size table (89 entries) and index adjustments
    * — published constants (IMA ADPCM reference, Intel/DVI 1992). */
  private[graft] val imaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499,
    2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
    9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767)
  private[graft] val imaIndexAdj: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM nibble through the decoder state machine:
    * (newPred, newIndex). The magnitude reconstruction uses the
    * shift-add form (step/8 + bit-gated step, step/2, step/4) that is
    * exact for every table entry. */
  private[ops] def imaStepNibble(n: Int, pred: Int, index: Int): (Int, Int) = {
    val step = imaStep(index)
    var delta = step >> 3
    if ((n & 4) != 0) delta += step
    if ((n & 2) != 0) delta += step >> 1
    if ((n & 1) != 0) delta += step >> 2
    val p0 = if ((n & 8) != 0) pred - delta else pred + delta
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, index + imaIndexAdj(n & 7)))
    (p, i)
  }

  /** One IMA ADPCM ENCODER step: choose the nibble for `sample` given
    * (pred, index), return (nibble, newPred, newIndex). The decoder
    * run on the emitted nibbles reproduces exactly the encoder's
    * predictor sequence — which is what makes ADPCM oracle-able. */
  private[ops] def imaEncodeStep(sample: Int, pred: Int, index: Int): (Int, Int, Int) = {
    val step = imaStep(index)
    var diff = sample - pred
    var n = 0
    if (diff < 0) { n = 8; diff = -diff }
    if (diff >= step) { n |= 4; diff -= step }
    if (diff >= (step >> 1)) { n |= 2; diff -= step >> 1 }
    if (diff >= (step >> 2)) { n |= 1 }
    val (p, i) = imaStepNibble(n, pred, index)
    (n, p, i)
  }

  /** G.711 A-law → 16-bit linear (CCITT): invert the even bits
    * (XOR 0x55), then mantissa·16 (+8 bias in segment 0, +0x108 and a
    * segment-1 shift above); sign bit SET means positive. Extremes
    * ±32256. */
  def alawToLinear(a: Byte): Short = {
    val b = (a ^ 0x55) & 0xff
    val seg = (b >> 4) & 0x07
    val t0 = (b & 0x0f) << 4
    val t = if (seg == 0) t0 + 8 else (t0 + 0x108) << (seg - 1)
    (if ((b & 0x80) != 0) t else -t).toShort
  }

  /**
   * REAL decode for canonical WAV (RIFF/WAVE): fmt audioFormat=1
   * 16-bit linear PCM, or audioFormat=7 8-bit G.711 μ-law (telephony
   * audio — the one "compressed" family that needs arithmetic, not a
   * codec library; expanded through [[ulawToLinear]]). Pure byte
   * parsing of the chunk structure. Other compressed audio (MP3/AAC/
   * FLAC) would need codecs absent here.
   */
  def decodeWav(bytes: Array[Byte]): Option[AudioData] = {
    def le16(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def le32(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
      ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
    def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
    if (bytes == null || bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    // Long cursor + size>=0 guard: decoders run on UNTRUSTED corpus
    // bytes, and a crafted chunk size of -8/-9 (or one overflowing
    // i+8+size in Int) would otherwise stall the chunk walk in an
    // infinite loop or index out of bounds — contract is None on
    // anything malformed.
    var iL = 12L
    // format, channels, rate, bits, blockAlign
    var fmt: Option[(Int, Int, Int, Int, Int)] = None
    while (iL + 8 <= bytes.length) {
      val i = iL.toInt
      val id = tag(i); val size = le32(i + 4)
      if (size < 0) return None
      if (id == "fmt " && size >= 16 && iL + 8 + 16 <= bytes.length) {
        val f = le16(i + 8)
        // linear PCM, A-law, μ-law, IMA ADPCM
        if (f != 1 && f != 6 && f != 7 && f != 0x11) return None
        fmt = Some((f, le16(i + 10), le32(i + 12), le16(i + 22), le16(i + 20)))
      } else if (id == "data") {
        return fmt.collect {
          case (1, ch, rate, 16, _) if ch > 0 && iL + 8 + size <= bytes.length =>
            val n = size / 2
            val out = new Array[Short](n)
            var k = 0
            while (k < n) { out(k) = le16(i + 8 + 2 * k).toShort; k += 1 }
            AudioData(ch, rate, out)
          case (f, ch, rate, 8, _) if (f == 6 || f == 7) && ch > 0 &&
            iL + 8 + size <= bytes.length =>
            val out = new Array[Short](size)
            var k = 0
            while (k < size) {
              out(k) = if (f == 7) ulawToLinear(bytes(i + 8 + k))
                       else alawToLinear(bytes(i + 8 + k))
              k += 1
            }
            AudioData(ch, rate, out)
          case (0x11, 1, rate, 4, blockAlign) if blockAlign > 4 &&
            iL + 8 + size <= bytes.length =>
            // mono IMA ADPCM: per block a 4-byte header (int16 LE
            // predictor = first sample, uint8 step index, reserved),
            // then nibble pairs LOW FIRST — the DVI/WAV convention.
            // Sample count is computable per block (1 + 2·body), so
            // decode writes the Short array directly.
            val nFull = size / blockAlign
            val rem = size % blockAlign
            val total = nFull * ((blockAlign - 4) * 2 + 1) +
              (if (rem >= 4) 1 + 2 * (rem - 4) else 0)
            val samples = new Array[Short](total)
            var k = 0
            var pos = 0
            while (pos + 4 <= size) {
              var pred = le16(i + 8 + pos).toShort.toInt
              var index = math.max(0, math.min(88, bytes(i + 8 + pos + 2) & 0xff))
              samples(k) = pred.toShort; k += 1
              val body = math.min(blockAlign, size - pos) - 4
              var b = 0
              while (b < body) {
                val byte = bytes(i + 8 + pos + 4 + b) & 0xff
                var half = 0
                while (half < 2) {
                  val n = if (half == 0) byte & 0x0f else byte >> 4
                  val (p2, i2) = imaStepNibble(n, pred, index)
                  pred = p2; index = i2
                  samples(k) = pred.toShort; k += 1
                  half += 1
                }
                b += 1
              }
              pos += blockAlign
            }
            AudioData(1, rate, samples)
        }
      }
      iL += 8L + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /**
   * REAL decode for uncompressed AIFF (IFF FORM/AIFF, COMM + SSND
   * chunks, 16-bit PCM) — the big-endian audio family next to WAV:
   * BE chunk sizes with word alignment, the COMM sample rate as an
   * 80-bit extended float (sign/15-bit exponent/64-bit mantissa,
   * parsed by integer shifts — no FP), SSND offset honored, BE
   * samples. Pure byte parsing; AIFC/compressed variants return None.
   */
  def decodeAiff(bytes: Array[Byte]): Option[AudioData] = {
    def be16(i: Int) = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    def be32(i: Int) = ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
      ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
    def ext80(i: Int): Int = { // 80-bit extended -> integer sample rate
      val se = be16(i)
      val exp = se & 0x7fff
      var mant = 0L
      var k = 0
      while (k < 8) { mant = (mant << 8) | (bytes(i + 2 + k) & 0xff); k += 1 }
      if (mant == 0) 0
      else {
        val shift = exp - 16383 - 63
        val v = if (shift >= 0) mant << shift else mant >>> -shift
        (if ((se & 0x8000) != 0) -v else v).toInt
      }
    }
    if (bytes == null || bytes.length < 12 ||
      tag(0) != "FORM" || tag(8) != "AIFF") return None
    // Long cursor + size/offset guards: same untrusted-bytes contract
    // as decodeWav — a negative BE chunk size or SSND offset must
    // yield None, never a hung executor or an AIOOBE.
    var iL = 12L
    var comm: Option[(Int, Int, Int)] = None // channels, rate, bits
    var ssnd: Option[(Int, Int)] = None // sample start, byte length
    while (iL + 8 <= bytes.length) {
      val i = iL.toInt
      val id = tag(i); val size = be32(i + 4)
      if (size < 0) return None
      if (id == "COMM" && size >= 18 && iL + 8 + 18 <= bytes.length)
        comm = Some((be16(i + 8), ext80(i + 16), be16(i + 14)))
      else if (id == "SSND" && size >= 8 && iL + 8 + size <= bytes.length) {
        val offset = be32(i + 8)
        if (offset < 0 || offset > size - 8) return None
        ssnd = Some((i + 16 + offset, size - 8 - offset))
      }
      iL += 8L + size + (size & 1)
    }
    for {
      (ch, rate, bits) <- comm
      (start, len) <- ssnd
      if bits == 16 && ch > 0 && len >= 0 && start.toLong + len <= bytes.length
    } yield {
      val n = len / 2
      val out = new Array[Short](n)
      var k = 0
      while (k < n) { out(k) = be16(start + 2 * k).toShort; k += 1 }
      AudioData(ch, rate, out)
    }
  }

  /** Codec-free PCM dispatch: WAV (RIFF, LE) or AIFF (IFF, BE) —
    * every audio pipeline decodes through this. */
  def decodePcm(bytes: Array[Byte]): Option[AudioData] =
    decodeWav(bytes).orElse(decodeAiff(bytes))

  /** Synthesize a mono 16-bit AIFF with the SAME sample pattern as
    * [[synthWav]] (sample(i) = ((i·7+seed) mod 65536) − 32768), so the
    * two families share one closed-form oracle; the sample rate round-
    * trips through a real 80-bit extended encoding. */
  def synthAiff(seed: Long, nSamples: Int, sampleRate: Int = 16000): Array[Byte] = {
    val dataSize = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(12 + 26 + 16 + dataSize)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put("FORM".getBytes("US-ASCII")).putInt(4 + 26 + 16 + dataSize)
      .put("AIFF".getBytes("US-ASCII"))
    bb.put("COMM".getBytes("US-ASCII")).putInt(18)
      .putShort(1).putInt(nSamples).putShort(16)
    // 80-bit extended sample rate by integer normalization
    val nlz = java.lang.Long.numberOfLeadingZeros(sampleRate.toLong)
    bb.putShort((16383 + 63 - nlz).toShort).putLong(sampleRate.toLong << nlz)
    bb.put("SSND".getBytes("US-ASCII")).putInt(8 + dataSize)
      .putInt(0).putInt(0)
    var k = 0
    while (k < nSamples) {
      bb.putShort(((((k * 7 + seed) % 65536 + 65536) % 65536) - 32768).toShort)
      k += 1
    }
    bb.array()
  }

  /** Synthesize a mono 8-bit G.711 μ-law WAV (audioFormat=7): code
    * byte i = (i·7+seed) mod 256 — the decoded samples are
    * `ulawToLinear` of a closed-form byte stream, restatable in
    * oracle SQL as pure integer arithmetic. */
  def synthUlawWav(seed: Long, nSamples: Int, sampleRate: Int = 16000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + nSamples)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(7).putShort(1).putInt(sampleRate)
      .putInt(sampleRate).putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(nSamples)
    var k = 0
    while (k < nSamples) {
      bb.put(((((k * 7 + seed) % 256 + 256) % 256) & 0xff).toByte)
      k += 1
    }
    bb.array()
  }

  /** Synthesize a mono 8-bit G.711 A-law WAV (audioFormat=6): code
    * byte (i*7+seed) mod 256 — the synthUlawWav fixture shape with
    * the other companding law. */
  def synthAlawWav(seed: Long, nSamples: Int, sampleRate: Int = 16000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + nSamples)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(6).putShort(1).putInt(sampleRate)
      .putInt(sampleRate).putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(nSamples)
    var k = 0
    while (k < nSamples) {
      bb.put(((((k * 7 + seed) % 256 + 256) % 256) & 0xff).toByte)
      k += 1
    }
    bb.array()
  }

  /** Mono IMA ADPCM WAV through the REAL encoder: source sample k =
    * ((k·327+seed) mod 65536) − 32768, quantized block by block
    * (4-byte header: int16 predictor = the block's first sample,
    * step index, reserved; then nibble pairs LOW FIRST). Decoding
    * reproduces the encoder's predictor sequence exactly, which is
    * what lets a recursive-CTE oracle re-derive every decoded sample
    * from doc_id alone. fmt is the 20-byte ADPCM shape (cbSize=2,
    * samplesPerBlock). */
  def synthImaAdpcmWav(seed: Long, nBlocks: Int = 1, sampleRate: Int = 16000,
                       blockAlign: Int = 36): Array[Byte] = {
    require(nBlocks >= 1 && blockAlign > 4)
    val spb = (blockAlign - 4) * 2 + 1
    val dataSize = nBlocks * blockAlign
    def src(k: Int): Int = (((k * 327 + seed) % 65536 + 65536) % 65536 - 32768).toInt
    val bb = java.nio.ByteBuffer.allocate(48 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(40 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * blockAlign / spb).putShort(blockAlign.toShort).putShort(4)
      .putShort(2).putShort(spb.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var index = 0
    var k = 0
    var blk = 0
    while (blk < nBlocks) {
      var pred = src(k)
      bb.putShort(pred.toShort).put(index.toByte).put(0.toByte)
      k += 1
      var b = 0
      while (b < blockAlign - 4) {
        val (lo, p1, i1) = imaEncodeStep(src(k), pred, index)
        pred = p1; index = i1; k += 1
        val (hi, p2, i2) = imaEncodeStep(src(k), pred, index)
        pred = p2; index = i2; k += 1
        bb.put(((hi << 4) | lo).toByte)
        b += 1
      }
      blk += 1
    }
    bb.array()
  }

  /** Synthesize a mono 16-bit PCM WAV: sample(i) = ((i*7+seed) mod
    * 65536) − 32768 — deterministic fixture with closed-form stats. */
  def synthWav(seed: Long, nSamples: Int, sampleRate: Int = 16000): Array[Byte] = {
    val dataSize = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var k = 0
    while (k < nSamples) {
      bb.putShort(((((k * 7 + seed) % 65536 + 65536) % 65536) - 32768).toShort)
      k += 1
    }
    bb.array()
  }

  case class AudioFeatures(doc_id: Long, channels: Int, sample_rate: Int,
                           n_samples: Int, decoded: Boolean, sum_sq: Long)

  /** Per-partition REAL WAV decode → exact integer energy features. */
  def audioFeatures(df: DataFrame, idCol: String, contentCol: String): Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodePcm(bytes) match {
            case Some(a) =>
              var s = 0L
              var k = 0
              while (k < a.samples.length) {
                val v = a.samples(k).toLong; s += v * v; k += 1
              }
              AudioFeatures(id, a.channels, a.sampleRate, a.samples.length,
                decoded = true, s)
            case None => AudioFeatures(id, -1, -1, -1, decoded = false, 0L)
          }
        }
      }
  }

  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                           channels: Int, decoded: Boolean, sum_luma: Long)

  /** Per-partition REAL decode → integer features (sum of unsigned
    * sample bytes — exact, engine-portable). Undecodable payloads keep
    * their row with decoded=false. */
  def imageFeatures(df: DataFrame, idCol: String, contentCol: String): Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeRaster(bytes) match {
            case Some(img) =>
              var s = 0L
              var i = 0
              while (i < img.pixels.length) { s += img.pixels(i) & 0xff; i += 1 }
              ImageFeatures(id, img.width, img.height, img.channels, decoded = true, s)
            case None =>
              ImageFeatures(id, -1, -1, -1, decoded = false, 0L)
          }
        }
      }
  }

  case class EdgeEnergy(doc_id: Long, width: Int, height: Int,
                        decoded: Boolean, edge_energy: Long)

  /**
   * Integer Sobel edge energy: Σ over interior pixels of |Gx| + |Gy|
   * with the standard 3×3 kernels, over the grayscale image (RGB →
   * integer luma via [[grayResize]] at native size). Exact integer
   * math end to end, so a closed-form synthetic fixture oracles the
   * REAL decode+convolve path. The edge-density feature is the
   * classic blur / blank / synthetic-image triage signal for
   * multimodal corpus curation. Row-local `mapPartitions` — zero
   * shuffle at any scale. Images without interior pixels (w or h < 3)
   * decode with energy 0; undecodable payloads keep their row with
   * decoded=false.
   */
  def imageEdgeEnergy(df: DataFrame, idCol: String, contentCol: String): Dataset[EdgeEnergy] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeRaster(bytes) match {
            case Some(img) =>
              val w = img.width; val h = img.height
              val g = grayResize(img, w, h)
              def p(x: Int, y: Int): Long = g(y * w + x).toLong
              var e = 0L
              var y = 1
              while (y < h - 1) {
                var x = 1
                while (x < w - 1) {
                  val gx = (p(x + 1, y - 1) + 2 * p(x + 1, y) + p(x + 1, y + 1)) -
                    (p(x - 1, y - 1) + 2 * p(x - 1, y) + p(x - 1, y + 1))
                  val gy = (p(x - 1, y + 1) + 2 * p(x, y + 1) + p(x + 1, y + 1)) -
                    (p(x - 1, y - 1) + 2 * p(x, y - 1) + p(x + 1, y - 1))
                  e += math.abs(gx) + math.abs(gy)
                  x += 1
                }
                y += 1
              }
              EdgeEnergy(id, w, h, decoded = true, e)
            case None => EdgeEnergy(id, -1, -1, decoded = false, 0L)
          }
        }
      }
  }

  /**
   * Per-partition feature extraction over a binary content column.
   * Deterministic byte-level features stand in for codec output; the
   * MessageDigest is allocated once per partition (the pattern a real
   * decoder handle would use).
   */
  def extractFeatures(df: DataFrame, idCol: String, contentCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          md.reset()
          val digest = md.digest(if (bytes == null) Array.emptyByteArray else bytes)
          MediaFeatures(
            doc_id = id,
            n_bytes = if (bytes == null) 0 else bytes.length,
            head_byte = if (bytes != null && bytes.nonEmpty) bytes(0) & 0xff else -1,
            content_md5 = digest.map("%02x".format(_)).mkString)
        }
      }
  }

  // ------------------------------------------------------------------
  // Perceptual image hashing (near-duplicate image detection)
  // ------------------------------------------------------------------

  /** Nearest-neighbor grayscale downsample to w×h integer luma values
    * (RGB → (299r+587g+114b)/1000, integer math — engine-portable). */
  def grayResize(img: ImageData, w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val sy = y * img.height / h
      var x = 0
      while (x < w) {
        val sx = x * img.width / w
        val base = (sy * img.width + sx) * img.channels
        out(y * w + x) =
          if (img.channels == 3)
            ((img.pixels(base) & 0xff) * 299 + (img.pixels(base + 1) & 0xff) * 587 +
              (img.pixels(base + 2) & 0xff) * 114) / 1000
          else img.pixels(base) & 0xff
        x += 1
      }
      y += 1
    }
    out
  }

  /** dHash: 9×8 grayscale grid, bit k (= y*8+x) set iff
    * p(y,x) < p(y,x+1) — the standard gradient perceptual hash
    * (robust to brightness/contrast shifts; 64-bit Hamming space). */
  def dHash64(img: ImageData): Long = {
    val g = grayResize(img, 9, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) < g(y * 9 + x + 1)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** aHash: 8×8 grayscale grid, bit i set iff pixel i > integer mean. */
  def aHash64(img: ImageData): Long = {
    val g = grayResize(img, 8, 8)
    var s = 0
    var i = 0
    while (i < 64) { s += g(i); i += 1 }
    val mean = s / 64
    var bits = 0L
    i = 0
    while (i < 64) { if (g(i) > mean) bits |= 1L << i; i += 1 }
    bits
  }

  /** Synthesize a 9×8 P5 image whose [[dHash64]] is EXACTLY `bits`:
    * each row starts at luma 128 and steps +1 where the corresponding
    * bit is set, −1 where clear (drift stays in [120,136]) — the
    * closed-form fixture for oracle-checked image near-dup queries. */
  def synthPgmBits(bits: Long): Array[Byte] = {
    val header = "P5\n9 8\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 72)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < 8) {
      var p = 128
      out(header.length + y * 9) = p.toByte
      var x = 0
      while (x < 8) {
        p += (if (((bits >>> (y * 8 + x)) & 1L) == 1L) 1 else -1)
        out(header.length + y * 9 + x + 1) = p.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64-bit audio gradient hash — the PCM analogue of [[dHash64]]:
    * the sample stream splits into 65 equal windows; bit k is set iff
    * the integer mean of window k is below that of window k+1. Robust
    * to gain changes the way dHash is to brightness; integer division
    * keeps it engine-portable. Clips shorter than 65 samples hash 0. */
  def audioHash64(a: AudioData): Long = {
    val n = a.samples.length
    if (n < 65) return 0L
    val means = new Array[Long](65)
    var w = 0
    while (w < 65) {
      val lo = w * n / 65
      val hi = (w + 1) * n / 65
      var s = 0L
      var i = lo
      while (i < hi) { s += a.samples(i); i += 1 }
      means(w) = s / (hi - lo)
      w += 1
    }
    var bits = 0L
    var k = 0
    while (k < 64) { if (means(k) < means(k + 1)) bits |= 1L << k; k += 1 }
    bits
  }

  /** Goertzel single-bin DFT power of a PCM clip at frequency
    * `hz` — the classic O(n)-per-bin tone detector (Goertzel 1958;
    * the DTMF-decoding standard): s[k] = x[k] + 2cos(ω)·s[k−1] −
    * s[k−2], power = s1² + s2² − 2cos(ω)·s1·s2. Pure double
    * recurrence over int16 samples — deterministic on a fixed JVM. */
  def goertzelPower(a: AudioData, hz: Int): Double = {
    val omega = 2.0 * math.Pi * hz / a.sampleRate
    val coeff = 2.0 * math.cos(omega)
    var s1 = 0.0; var s2 = 0.0
    var k = 0
    while (k < a.samples.length) {
      val s0 = a.samples(k).toDouble + coeff * s1 - s2
      s2 = s1; s1 = s0; k += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  /** The default probe bank: octave-spaced speech/music landmarks
    * below the 16 kHz corpus's Nyquist. */
  val defaultProbeHz: Seq[Int] = Seq(250, 500, 1000, 2000, 4000)

  case class AudioSpectrum(doc_id: Long, decoded: Boolean,
                           probe_hz: Array[Int], power: Array[Double],
                           dominant_hz: Int)

  /**
   * Per-clip dominant-frequency detection: Goertzel power at a fixed
   * probe bank, argmax with a lower-frequency tie-break — tone /
   * beep / test-signal triage for audio corpora without an FFT
   * library (each probe is O(n), the bank is O(bank·n), and a 100 TB
   * corpus runs it row-locally inside `mapPartitions` — no shuffle at
   * all; undecodable payloads keep their row with decoded=false, the
   * [[audioFeatures]] contract).
   */
  def dominantFrequency(df: DataFrame, idCol: String, contentCol: String,
                        probes: Seq[Int] = defaultProbeHz): Dataset[AudioSpectrum] = {
    val spark = df.sparkSession
    import spark.implicits._
    val bank = probes.toArray
    df.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodePcm(bytes) match {
            case Some(a) if a.samples.nonEmpty =>
              val pw = bank.map(hz => goertzelPower(a, hz))
              var best = 0
              var i = 1
              while (i < pw.length) { if (pw(i) > pw(best)) best = i; i += 1 }
              AudioSpectrum(id, decoded = true, bank, pw, bank(best))
            case _ => AudioSpectrum(id, decoded = false, bank,
              new Array[Double](bank.length), -1)
          }
        }
      }
  }

  /** Synthesize a mono PCM sine WAV at `hz` — the closed-form fixture
    * for [[dominantFrequency]] (its Goertzel peak is `hz`'s bin). */
  def synthSineWav(hz: Int, nSamples: Int, sampleRate: Int = 16000,
                   amplitude: Int = 30000): Array[Byte] = {
    val dataSize = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var k = 0
    while (k < nSamples) {
      bb.putShort((amplitude * math.sin(2.0 * math.Pi * hz * k / sampleRate)).toShort)
      k += 1
    }
    bb.array()
  }

  /** Synthesize a mono PCM WAV whose [[audioHash64]] is EXACTLY
    * `bits`: 65 constant 4-sample windows stepping +1 where the bit is
    * set, −1 where clear — the closed-form fixture for oracle-checked
    * audio near-dup queries. */
  def synthWavBits(bits: Long, sampleRate: Int = 16000): Array[Byte] = {
    val nSamples = 65 * 4
    val dataSize = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var v = 0
    var w = 0
    while (w < 65) {
      var i = 0
      while (i < 4) { bb.putShort(v.toShort); i += 1 }
      if (w < 64) v += (if (((bits >>> w) & 1L) == 1L) 1 else -1)
      w += 1
    }
    bb.array()
  }

  case class AudioHashes(doc_id: Long, decoded: Boolean, ahash64: Long)

  /** Per-partition real WAV decode → audio gradient hash. */
  def audioPerceptualHashes(df: DataFrame, idCol: String,
                            contentCol: String): Dataset[AudioHashes] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodePcm(bytes) match {
            case Some(a) => AudioHashes(id, decoded = true, audioHash64(a))
            case None    => AudioHashes(id, decoded = false, 0L)
          }
        }
      }
  }

  /** Near-duplicate AUDIO pairs: real decode → gradient hash → the
    * same banded pigeonhole Hamming join as images/text. */
  def audioNearDupPairs(df: DataFrame, idCol: String, contentCol: String,
                        maxHamming: Int = 3, bands: Int = 4,
                        maxBucketSize: Int = 10000): DataFrame = {
    val sigs = audioPerceptualHashes(df, idCol, contentCol).toDF()
      .filter(col("decoded"))
      .select(col("doc_id").as("id"), col("ahash64").as("simhash"))
    Dedup.hammingBandPairs(sigs, 64, maxHamming, bands, maxBucketSize)
  }

  case class ImageHashes(doc_id: Long, decoded: Boolean, dhash: Long, ahash: Long)

  /** Per-partition real decode → perceptual hashes. Undecodable
    * payloads keep their row with decoded=false (hashes 0). */
  def imagePerceptualHashes(df: DataFrame, idCol: String,
                            contentCol: String): Dataset[ImageHashes] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeRaster(bytes) match {
            case Some(img) => ImageHashes(id, decoded = true, dHash64(img), aHash64(img))
            case None      => ImageHashes(id, decoded = false, 0L, 0L)
          }
        }
      }
  }

  /**
   * Near-duplicate IMAGE pairs: real decode → dHash → banded pigeonhole
   * Hamming join ([[Dedup.hammingBandPairs]] — the same machinery as
   * text simhash). Complete for hamming ≤ maxHamming when
   * maxHamming < bands; one shuffle on (band, 16-bit slice), never a
   * cross join — the hash index is 16 bytes/row at any corpus size.
   */
  def imageNearDupPairs(df: DataFrame, idCol: String, contentCol: String,
                        maxHamming: Int = 3, bands: Int = 4,
                        maxBucketSize: Int = 10000): DataFrame = {
    val sigs = imagePerceptualHashes(df, idCol, contentCol).toDF()
      .filter(col("decoded"))
      .select(col("doc_id").as("id"), col("dhash").as("simhash"))
    Dedup.hammingBandPairs(sigs, 64, maxHamming, bands, maxBucketSize)
  }

  /**
   * Deterministic "frame sampling": split the payload into `frames`
   * contiguous byte slices (the partitioning/batching shape of real
   * video frame extraction; the decode itself is the stubbed part).
   */
  def sampleFrames(df: DataFrame, idCol: String, contentCol: String, frames: Int): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val step = math.max(1, bytes.length / frames)
          (0 until frames).iterator
            .map(i => (i, i * step))
            .takeWhile(_._2 < bytes.length)
            .map { case (i, off) =>
              Frame(id, i, java.util.Arrays.copyOfRange(bytes, off, math.min(off + step, bytes.length)))
            }
        }
      }
  }
}
