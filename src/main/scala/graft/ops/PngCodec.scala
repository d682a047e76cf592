package graft.ops

/** Pure-JDK PNG pixel codec — the round-7 replacement for the multimodal
  * pixel-decode stub (MultimodalOps kept format/width/height real but left
  * pixel access stubbed; this closes that for PNG, the one container whose
  * full decode needs no codec library: zlib inflate is java.util.zip and
  * the five row filters are published arithmetic).
  *
  * Decoder scope (honest contract): 8-bit depth, color types 0 (gray),
  * 2 (RGB), 6 (RGBA), no interlace. 16-bit, palette and Adam7 return None
  * — at 100 TB those rows route to the quarantine/codec path exactly like
  * non-PNG payloads, they do not silently produce wrong stats. Chunk CRCs
  * are verified (a bit-flipped payload must not decode into plausible
  * stats), IDAT may span multiple chunks, and the inflater is bounded by
  * the IHDR-derived raster size so a crafted bomb cannot balloon memory.
  *
  * The encoder exists for the fixture + tests: it applies REAL filtering
  * (encode side of the same five filters) and real deflate, so a decoder
  * that mis-implements any unfilter branch fails the round-trip loudly.
  *
  * Reference behavior: the spec'd PNG container layout (public W3C spec);
  * mirrors the reference engine's opaque-binary media columns
  * (media/loader.py:41-66 treats payloads as bytes + typed metadata).
  */
object PngCodec {

  /** Decoded raster: interleaved 8-bit samples, `channels` per pixel. */
  final case class Raster(width: Int, height: Int, channels: Int,
                          samples: Array[Byte])

  private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
      ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // gray
    case 2 => 3 // rgb
    case 6 => 4 // rgba
    case _ => -1 // palette (3) / gray+alpha (4) out of scope
  }

  /** Full pixel decode. None = not a PNG this decoder covers (caller
    * routes to the codec-bound path); corrupt streams (bad CRC, short
    * IDAT, bad filter byte) are also None — never a half-decoded raster.
    */
  def decode(p: Array[Byte]): Option[Raster] = {
    if (p.length < 45 || !Sig.indices.forall(i => (p(i) & 0xff) == Sig(i)))
      return None
    // IHDR must be first (also what parseHeader enforces)
    if (be32(p, 8) != 13 || !chunkTypeIs(p, 12, "IHDR")) return None
    if (!crcOk(p, 12, 13)) return None
    val w = be32(p, 16)
    val h = be32(p, 20)
    val depth = p(24) & 0xff
    val ch = channelsOf(p(25) & 0xff)
    val interlace = p(28) & 0xff
    if (w <= 0 || h <= 0 || depth != 8 || ch < 0 || interlace != 0) return None
    // raster size guard: pixel stats over payload columns run inside
    // executor tasks — a crafted IHDR must not allocate unbounded memory
    val rowBytes = 1L + w.toLong * ch
    val rasterBytes = rowBytes * h
    if (rasterBytes > (64L << 20)) return None
    // walk chunks: concatenate IDAT payloads (may span chunks), stop at IEND
    val idat = new java.io.ByteArrayOutputStream()
    var i = 33
    var ended = false
    while (!ended && i + 8 <= p.length) {
      val len = be32(p, i)
      if (len < 0 || i + 12 + len > p.length) return None
      if (!crcOk(p, i + 4, len)) return None
      if (chunkTypeIs(p, i + 4, "IDAT")) idat.write(p, i + 8, len)
      else if (chunkTypeIs(p, i + 4, "IEND")) ended = true
      i += 12 + len
    }
    if (!ended || idat.size() == 0) return None
    // zlib inflate, output bounded by the IHDR-derived filtered size
    val filtered = new Array[Byte](rasterBytes.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < filtered.length && !inf.finished()) {
        val n = inf.inflate(filtered, off, filtered.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off != filtered.length) return None
      // a stream with MORE data than the raster is corrupt/crafted
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) > 0) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    unfilter(filtered, w, h, ch).map(Raster(w, h, ch, _))
  }

  private def chunkTypeIs(p: Array[Byte], i: Int, t: String): Boolean =
    p(i) == t.charAt(0) && p(i + 1) == t.charAt(1) &&
      p(i + 2) == t.charAt(2) && p(i + 3) == t.charAt(3)

  /** CRC32 over chunk type + data, compared to the trailing field. */
  private def crcOk(p: Array[Byte], typeOff: Int, dataLen: Int): Boolean = {
    val crc = new java.util.zip.CRC32()
    crc.update(p, typeOff, 4 + dataLen)
    crc.getValue == (be32(p, typeOff + 4 + dataLen).toLong & 0xffffffffL)
  }

  /** Reverse the per-row filter: each row starts with a filter-type byte,
    * then `w*ch` filtered samples. a = left neighbor (same channel),
    * b = above, c = above-left; all zero beyond the raster edge.
    */
  private def unfilter(f: Array[Byte], w: Int, h: Int,
                       ch: Int): Option[Array[Byte]] = {
    val stride = w * ch
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val rf = f(y * (stride + 1)) & 0xff
      if (rf > 4) return None
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val raw = f(src + x) & 0xff
        val a = if (x >= ch) out(dst + x - ch) & 0xff else 0
        val b = if (y > 0) out(dst - stride + x) & 0xff else 0
        val c = if (y > 0 && x >= ch) out(dst - stride + x - ch) & 0xff else 0
        val v = rf match {
          case 0 => raw
          case 1 => raw + a
          case 2 => raw + b
          case 3 => raw + ((a + b) >> 1)
          case 4 => raw + paeth(a, b, c)
        }
        out(dst + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val pp = a + b - c
    val pa = math.abs(pp - a)
    val pb = math.abs(pp - b)
    val pc = math.abs(pp - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode a raster as a real PNG: per-row filter type `(filterSeed + y)
    * % 5` (every decoder branch exercised across a corpus), real deflate,
    * real CRCs. Fixture + tests only — the engine's job is decode.
    */
  def encode(r: Raster, filterSeed: Int = 0): Array[Byte] = {
    require(r.samples.length == r.width * r.height * r.channels,
      s"raster size ${r.samples.length} != ${r.width}x${r.height}x${r.channels}")
    val colorType = r.channels match {
      case 1 => 0
      case 3 => 2
      case 4 => 6
      case n => throw new IllegalArgumentException(s"unsupported channels $n")
    }
    val stride = r.width * r.channels
    val filtered = new Array[Byte]((stride + 1) * r.height)
    var y = 0
    while (y < r.height) {
      val ft = math.floorMod(filterSeed + y, 5)
      filtered(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val raw = r.samples(y * stride + x) & 0xff
        val a = if (x >= r.channels) r.samples(y * stride + x - r.channels) & 0xff else 0
        val b = if (y > 0) r.samples((y - 1) * stride + x) & 0xff else 0
        val c = if (y > 0 && x >= r.channels)
          r.samples((y - 1) * stride + x - r.channels) & 0xff else 0
        val enc = ft match {
          case 0 => raw
          case 1 => raw - a
          case 2 => raw - b
          case 3 => raw - ((a + b) >> 1)
          case 4 => raw - paeth(a, b, c)
        }
        filtered(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(filtered); d.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
      d.end()
      buf.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig.map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(tb, 0, 4)
      out.write(data, 0, len)
      val cv = crc.getValue
      out.write(Array((cv >>> 24).toByte, (cv >>> 16).toByte,
        (cv >>> 8).toByte, cv.toByte), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(r.width).putInt(r.height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", deflated)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
