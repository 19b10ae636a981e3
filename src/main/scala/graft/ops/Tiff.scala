package graft.ops

import Multimodal.ImageData

/**
 * Baseline TIFF decode — pure byte parsing, no library: both byte
 * orders (II/MM), the IFD tag walk, strip assembly, 8-bit gray
 * (either photometric polarity), RGB, and RGBA (alpha dropped), with
 * Compression = none (1) or PackBits (32773 — the trivial RLE every
 * fax-era TIFF uses). Rejected with None: tiled images, LZW/Deflate/
 * JPEG compression, palettes, planar configuration 2, non-8-bit
 * depths, and anything structurally out of bounds.
 *
 * Interop is pinned in the spec against the JDK's own javax.imageio
 * TIFF plugin (present since JDK 9) in both directions and both
 * compressions.
 *
 * Untrusted-bytes contract: every offset/count is bounds-checked and
 * the output allocation capped by the declared dimension product
 * (≤ 2^24 pixels) before anything is read; malformed input returns
 * None, never throws.
 */
object Tiff {

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  def decode(bytes: Array[Byte]): Option[ImageData] = {
    if (bytes == null || bytes.length < 8) return None
    val le =
      if (bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 && bytes(3) == 0) true
      else if (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 42) false
      else return None
    try Some(decodeImpl(bytes, le))
    catch {
      case _: Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  private def decodeImpl(b: Array[Byte], le: Boolean): ImageData = {
    def u8(i: Int) = { if (i < 0 || i >= b.length) fail(); b(i) & 0xff }
    def u16(i: Int) = if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) u16(i).toLong | (u16(i + 2).toLong << 16)
      else (u16(i).toLong << 16) | u16(i + 2).toLong
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) fail()
    val n = u16(ifd.toInt)
    var w = 0
    var h = 0
    var bits = Seq(8)
    var comp = 1
    var photo = -1
    var spp = 1
    var rowsPerStrip = Int.MaxValue
    var stripOffsets = Seq.empty[Long]
    var stripCounts = Seq.empty[Long]
    var planar = 1
    var tiled = false
    // one IFD entry value: SHORT(3)/LONG(4) scalar or array, inline if
    // it fits 4 bytes, else at the pointed offset
    def values(entry: Int): Seq[Long] = {
      val typ = u16(entry + 2)
      val cnt = u32(entry + 4)
      if (cnt > 65536) fail()
      val unit = typ match {
        case 3 => 2
        case 4 => 4
        case 1 => 1
        case _ => return Seq.empty // irrelevant type for the tags we read
      }
      val total = unit * cnt
      val base = if (total <= 4) entry + 8 else {
        val off = u32(entry + 8)
        if (off + total > b.length) fail()
        off.toInt
      }
      (0 until cnt.toInt).map { k =>
        unit match {
          case 1 => u8(base + k).toLong
          case 2 => u16(base + 2 * k).toLong
          case _ => u32(base + 4 * k)
        }
      }
    }
    var e = 0
    while (e < n) {
      val entry = ifd.toInt + 2 + 12 * e
      u16(entry) match {
        case 256 => w = values(entry).headOption.getOrElse(fail()).toInt
        case 257 => h = values(entry).headOption.getOrElse(fail()).toInt
        case 258 => bits = values(entry).map(_.toInt)
        case 259 => comp = values(entry).headOption.getOrElse(fail()).toInt
        case 262 => photo = values(entry).headOption.getOrElse(fail()).toInt
        case 273 => stripOffsets = values(entry)
        case 277 => spp = values(entry).headOption.getOrElse(fail()).toInt
        case 278 => rowsPerStrip = values(entry).headOption.getOrElse(fail()).toInt
        case 279 => stripCounts = values(entry)
        case 284 => planar = values(entry).headOption.getOrElse(fail()).toInt
        case 322 | 323 | 324 | 325 => tiled = true
        case 320 => fail() // palette
        case _ => ()
      }
      e += 1
    }
    if (tiled || planar != 1) fail()
    if (comp != 1 && comp != 32773) fail()
    if (w <= 0 || h <= 0 || w.toLong * h > (1 << 24)) fail()
    if (!(spp == 1 || spp == 3 || spp == 4) || bits.size < spp ||
      bits.take(spp).exists(_ != 8)) fail()
    if (photo != 0 && photo != 1 && photo != 2) fail()
    if (photo == 2 && spp < 3) fail()
    if (stripOffsets.isEmpty || stripCounts.size != stripOffsets.size) fail()
    if (rowsPerStrip <= 0) fail()
    val raw = new Array[Byte](w * h * spp)
    var written = 0
    stripOffsets.indices.foreach { s =>
      val off = stripOffsets(s)
      val cnt = stripCounts(s)
      if (off < 0 || cnt < 0 || off + cnt > b.length) fail()
      if (comp == 1) {
        if (written + cnt > raw.length) fail()
        System.arraycopy(b, off.toInt, raw, written, cnt.toInt)
        written += cnt.toInt
      } else { // PackBits
        var p = off.toInt
        val end = off.toInt + cnt.toInt
        while (p < end) {
          val ctl = b(p).toInt
          p += 1
          if (ctl >= 0) {
            val run = ctl + 1
            if (p + run > end || written + run > raw.length) fail()
            System.arraycopy(b, p, raw, written, run)
            p += run
            written += run
          } else if (ctl != -128) {
            val run = 1 - ctl
            if (p >= end || written + run > raw.length) fail()
            java.util.Arrays.fill(raw, written, written + run, b(p))
            p += 1
            written += run
          } // -128: noop
        }
      }
    }
    if (written != raw.length) fail()
    val cOut = if (spp == 1) 1 else 3
    val out =
      if (spp == cOut && photo != 0) raw
      else {
        val o = new Array[Byte](w * h * cOut)
        var p = 0
        while (p < w * h) {
          var c = 0
          while (c < cOut) {
            val v = raw(p * spp + c) & 0xff
            o(p * cOut + c) = (if (photo == 0) 255 - v else v).toByte
            c += 1
          }
          p += 1
        }
        o
      }
    ImageData(w, h, cOut, out)
  }

  /** Deterministic little-endian grayscale TIFF whose image row y
    * holds (seed + y) % 256 — the shared row-constant closed form —
    * PackBits-compressed (row-constant data is the RLE best case, so
    * the decode path exercised is the compressed one). Tags ascend as
    * the spec requires; single strip. */
  def synth(seed: Long, w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && h >= 1)
    val strip = new java.io.ByteArrayOutputStream()
    var y = 0
    while (y < h) {
      val v = (((seed + y) % 256 + 256) % 256).toInt
      var left = w
      while (left > 0) {
        val run = math.min(128, left)
        strip.write(-(run - 1) & 0xff)
        strip.write(v)
        left -= run
      }
      y += 1
    }
    val data = strip.toByteArray
    val nTags = 9
    val dataOff = 8 + 2 + nTags * 12 + 4
    val out = java.nio.ByteBuffer.allocate(dataOff + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    out.putShort(nTags.toShort)
    def entry(tag: Int, typ: Int, cnt: Int, v: Int): Unit = {
      out.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt).putInt(v); ()
    }
    entry(256, 3, 1, w); entry(257, 3, 1, h); entry(258, 3, 1, 8)
    entry(259, 3, 1, 32773); entry(262, 3, 1, 1); entry(273, 4, 1, dataOff)
    entry(277, 3, 1, 1); entry(278, 3, 1, h); entry(279, 4, 1, data.length)
    out.putInt(0)
    out.put(data)
    out.array()
  }
}
