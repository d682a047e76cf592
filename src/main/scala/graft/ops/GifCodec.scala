package graft.ops

/** Pure-JVM GIF LZW codec over 8-bit indexed rasters — the third real
  * image-decode leg (after [[PngCodec]] and [[Vp8lCodec]]): GIF's LZW is
  * fully specified and deterministic across decoders (GIF89a
  * specification, CompuServe 1990, Appendix F — public), so decoded
  * pixels can feed an oracle hash, unlike the lossy codecs (JPEG/VP8)
  * whose outputs carry no cross-implementation contract.
  *
  * Original implementation from the published spec: own LSB-first bit
  * I/O, sub-block framing, and the variable-width LZW dictionary pair —
  * the DECODER accepts the general format (87a/89a, interlace, local
  * palettes, deferred clear on a full dictionary, missing EOI when the
  * pixel count is already satisfied, foreign streams), while the ENCODER
  * is deliberately canonical for fixture determinism: grayscale global
  * palette (index == luminance), no interlace, clear code first,
  * dictionary reset exactly when it fills. Corrupt streams (code beyond
  * the dictionary, truncated bits, short rasters) refuse loudly with
  * None; the raster ceiling refuses before allocation.
  *
  * Code-width law (derived, round-trip- and cross-decoder-tested): the
  * decoder trails the encoder's dictionary by one entry, so the encoder
  * widens after its add when `avail == (1 << width) + 1` and the decoder
  * after ITS add when `avail == (1 << width)` — both capped at 12 bits.
  */
object GifCodec {

  /** 8-bit indexed raster; `pixels(y*width + x)` is the palette index.
    * Under the canonical grayscale palette, index == luminance.
    */
  final case class Indexed(width: Int, height: Int, pixels: Array[Byte])

  /** Refuse-before-allocation ceiling (pixels) — the [[Vp8lCodec]]
    * contract: a crafted header must not size a buffer.
    */
  val MaxPixels: Int = 1 << 24

  private val MaxCode = 4096

  // ── decode ──────────────────────────────────────────────────────────

  def decode(p: Array[Byte]): Option[Indexed] =
    // a stream truncated mid-structure (header, descriptor, palette) is
    // corrupt like any other: the loud-None contract, not an index error
    try decodeUnsafe(p)
    catch { case _: ArrayIndexOutOfBoundsException => None }

  private def decodeUnsafe(p: Array[Byte]): Option[Indexed] = {
    if (p.length < 13) return None
    val sig = new String(p.slice(0, 6), "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    var i = 6
    def u16(): Int = { val v = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8); i += 2; v }
    u16(); u16() // logical screen dims — the image descriptor's dims rule
    val flags = p(i) & 0xff; i += 3 // flags, bg index, aspect
    if ((flags & 0x80) != 0) i += 3 * (1 << ((flags & 7) + 1)) // global palette
    while (i < p.length) {
      (p(i) & 0xff) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label, then sub-blocks to a 0 terminator
          i += 2
          while (i < p.length && (p(i) & 0xff) != 0) i += 1 + (p(i) & 0xff)
          i += 1
        case 0x2c =>
          i += 1
          u16(); u16() // left, top — the raster is the image's own grid
          val w = u16(); val h = u16()
          if (i >= p.length) return None
          val iflags = p(i) & 0xff; i += 1
          if ((iflags & 0x80) != 0) i += 3 * (1 << ((iflags & 7) + 1)) // local palette
          val interlaced = (iflags & 0x40) != 0
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
          if (i >= p.length) return None
          val minCode = p(i) & 0xff; i += 1
          if (minCode < 2 || minCode > 8) return None
          // concatenate the data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (i < p.length && (p(i) & 0xff) != 0) {
            val n = p(i) & 0xff
            if (i + 1 + n > p.length) return None
            data.write(p, i + 1, n)
            i += 1 + n
          }
          val seq = lzwDecode(data.toByteArray, minCode, w * h).getOrElse(return None)
          return Some(Indexed(w, h, if (interlaced) deinterlace(seq, w, h) else seq))
        case _ => return None
      }
    }
    None
  }

  /** GIF interlace: sequential decoded rows land on rows 0,8,16…, then
    * 4,12…, then 2,6,10…, then 1,3,5… (spec §23).
    */
  private def deinterlace(seq: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](seq.length)
    val passes = Seq((0, 8), (4, 8), (2, 4), (1, 2))
    var src = 0
    for ((start, step) <- passes; y <- start until h by step) {
      System.arraycopy(seq, src * w, out, y * w, w)
      src += 1
    }
    out
  }

  private def lzwDecode(data: Array[Byte], minCode: Int,
                        expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    var width = minCode + 1
    val prefix = new Array[Int](MaxCode)
    val suffix = new Array[Byte](MaxCode)
    var avail = eoi + 1
    var prev = -1
    val out = new Array[Byte](expected)
    var outN = 0
    var bit = 0
    val totalBits = data.length * 8
    val stack = new Array[Byte](MaxCode + 2) // longest chain + the KwKwK byte

    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    def writeString(code: Int, extra: Int): Boolean = {
      var n = 0
      if (extra >= 0) { stack(n) = extra.toByte; n += 1 }
      var c = code
      while (c >= clear) { stack(n) = suffix(c); n += 1; c = prefix(c) }
      stack(n) = c.toByte; n += 1
      if (outN + n > expected) return false // longer than the raster: corrupt
      var j = n - 1
      while (j >= 0) { out(outN) = stack(j); outN += 1; j -= 1 }
      true
    }

    while (outN < expected) {
      if (bit + width > totalBits) return None // truncated mid-stream
      var code = 0
      var k = 0
      while (k < width) {
        code |= ((data((bit + k) >> 3) >> ((bit + k) & 7)) & 1) << k
        k += 1
      }
      bit += width
      if (code == clear) {
        width = minCode + 1; avail = eoi + 1; prev = -1
      } else if (code == eoi) {
        return if (outN == expected) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a root
        out(outN) = code.toByte; outN += 1
        prev = code
      } else if (code <= avail && !(code == avail && avail >= MaxCode)) {
        val ok =
          if (code == avail) writeString(prev, firstByte(prev) & 0xff) // KwKwK
          else writeString(code, -1)
        if (!ok) return None
        if (avail < MaxCode) {
          prefix(avail) = prev
          suffix(avail) = if (code == avail) firstByte(prev) else firstByte(code)
          avail += 1
          if (avail == (1 << width) && width < 12) width += 1
        }
        prev = code
      } else return None // code beyond the dictionary: corrupt
    }
    // raster complete — some writers omit the EOI; accept either way
    Some(out)
  }

  // ── encode (canonical) ──────────────────────────────────────────────

  def encode(img: Indexed): Array[Byte] = {
    require(img.pixels.length == img.width * img.height,
      s"raster size ${img.pixels.length} != ${img.width}x${img.height}")
    require(img.width > 0 && img.width < 65536 && img.height > 0 &&
      img.height < 65536, s"dims out of GIF range: ${img.width}x${img.height}")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(img.width); u16(img.height)
    out.write(0xf7) // global palette, 8-bit, 256 entries
    out.write(0); out.write(0) // bg index, aspect
    for (g <- 0 until 256) { out.write(g); out.write(g); out.write(g) } // gray
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(img.width); u16(img.height)
    out.write(0) // no local palette, not interlaced
    out.write(8) // LZW min code size
    val lzw = lzwEncode(img.pixels, 8)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  private def lzwEncode(pixels: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0 // pending byte accumulator
    var curBits = 0
    var width = minCode + 1
    def emit(code: Int): Unit = {
      cur |= code << curBits
      curBits += width
      while (curBits >= 8) {
        out.write(cur & 0xff); cur >>>= 8; curBits -= 8
      }
    }
    // (prevCode, byte) → code; fits comfortably in a hash map at 4096
    var dict = new java.util.HashMap[Integer, Integer](8192)
    var avail = eoi + 1
    def reset(): Unit = { dict = new java.util.HashMap[Integer, Integer](8192); avail = eoi + 1 }
    emit(clear)
    if (pixels.isEmpty) { emit(eoi); } else {
      var prev: Int = pixels(0) & 0xff
      var i = 1
      while (i < pixels.length) {
        val b = pixels(i) & 0xff
        val key = (prev << 8) | b
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          emit(prev)
          dict.put(key, avail)
          avail += 1
          if (avail == (1 << width) + 1 && width < 12) width += 1
          if (avail == MaxCode) { // dictionary full: clear and restart
            emit(clear)
            width = minCode + 1
            reset()
          }
          prev = b
        }
        i += 1
      }
      emit(prev)
      emit(eoi)
    }
    if (curBits > 0) out.write(cur & 0xff)
    out.toByteArray
  }
}
