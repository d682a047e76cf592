package graft.ops

/** Pure-JVM WebP-lossless (VP8L) codec — the published bitstream layout
  * (RFC 9649) implemented directly, closing the one decode leg that was
  * stubbed for want of a codec library: LSB-first bit I/O, the RIFF/VP8L
  * container, canonical prefix codes (both the simple 1-2-symbol form and
  * the full code-length-code machinery with 16/17/18 repeats), the LZ77
  * length/distance prefix value coding with the 2D neighbor-distance map,
  * and the color-cache hash — the same deflate-family entropy toolbox as
  * [[PngCodec]], at the bit- rather than byte-level.
  *
  * The ENCODER emits a deliberately canonical stream — no transforms, no
  * color cache, no meta-prefix image, fixed complete code lengths
  * (232×8 + 48×9 for the 280-symbol green alphabet, flat 8-bit for
  * r/b/a, single-symbol simple code for distances) — which keeps it
  * byte-deterministic for the oracle while exercising every decoder
  * branch a literal-only stream reaches. The DECODER implements the
  * general layout (arbitrary canonical codes, repeats, simple codes,
  * single-symbol zero-bit codes, LZ77 back-references, color cache), not
  * just the encoder's subset; lossy VP8 stays out of scope (its
  * probability-adaptive arithmetic coder has no cross-implementation
  * determinism contract — the same reason JPEG features are rows-only).
  *
  * Reference behavior modeled on the public spec; reference repo has no
  * media path at all (its transforms are ~18 SQL operators) — this
  * operator family is part of the training-data mission, not a port.
  */
object Vp8lCodec {

  /** Decoded image: ARGB per pixel, row-major. */
  final case class Argb(width: Int, height: Int, pixels: Array[Int])

  private val CodeLengthCodeOrder = Array(
    17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // ---------------- bit I/O (LSB-first, prefix codes MSB-first) --------

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var bitPos = 0
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= bytes.length)
          throw new IllegalArgumentException("vp8l: truncated stream")
        v |= ((bytes(pos) >> bitPos) & 1) << i
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; pos += 1 }
        i += 1
      }
      v
    }
    def readBit(): Int = readBits(1)
  }

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
        i += 1
      }
    }
    /** A canonical prefix code is written MSB of the code first (the
      * deflate convention VP8L inherits).
      */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (nBits > 0) { buf.write(cur); cur = 0; nBits = 0 }
      buf.toByteArray
    }
  }

  // ---------------- canonical prefix codes ----------------------------

  /** Canonical code assignment from lengths (deflate rule: by length,
    * then symbol order). Returns (codes, maxLen); zero-length symbols get
    * code -1.
    */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val maxLen = lengths.max
    val blCount = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 1)
    var code = 0
    for (l <- 1 to maxLen) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
    }
    lengths.map { l =>
      if (l == 0) -1
      else { val c = nextCode(l); nextCode(l) += 1; c }
    }
  }

  /** Decode-side code: walk bits MSB-first through the canonical
    * assignment. Single-symbol codes read ZERO bits (the spec's trivial
    * code — produced by 1-symbol simple codes and by degenerate length
    * sets).
    */
  private final class PrefixCode(lengths: Array[Int],
                                 explicit: Map[Int, Int] = Map.empty) {
    private val nSyms = lengths.count(_ > 0)
    private val trivial: Int =
      if (nSyms == 1) lengths.indexWhere(_ > 0) else -1
    // (code << 4 | len) -> symbol, len ≤ 15 per spec. `explicit` maps
    // code → symbol directly for the simple 2-symbol form, whose code
    // assignment follows TRANSMISSION order (first-read symbol = code 0),
    // not the canonical by-symbol-value order.
    private val table: java.util.HashMap[Integer, Integer] = {
      val m = new java.util.HashMap[Integer, Integer]()
      if (trivial < 0) {
        if (explicit.nonEmpty)
          explicit.foreach { case (code, sym) => m.put((code << 4) | 1, sym) }
        else {
          // Kraft completeness gate: an over-subscribed length set would
          // assign COLLIDING canonical codes (silent table overwrite →
          // wrong pixels, not the documented loud failure); an incomplete
          // one consumes bits without a match only on some inputs. The
          // spec's sole sub-complete form is the single-symbol trivial
          // code handled above, so anything off exactly 1 is corrupt.
          val maxLen = lengths.max
          var kraft = 0L
          lengths.foreach(l => if (l > 0) kraft += 1L << (maxLen - l))
          require(kraft == (1L << maxLen),
            s"vp8l: corrupt prefix code — Kraft sum $kraft/${1L << maxLen}")
          val codes = canonicalCodes(lengths)
          var s = 0
          while (s < lengths.length) {
            if (lengths(s) > 0) m.put((codes(s) << 4) | lengths(s), s)
            s += 1
          }
        }
      }
      m
    }
    def read(br: BitReader): Int = {
      if (trivial >= 0) return trivial
      var code = 0
      var len = 0
      while (len <= 15) {
        code = (code << 1) | br.readBit()
        len += 1
        val hit = table.get((code << 4) | len)
        if (hit != null) return hit
      }
      throw new IllegalArgumentException("vp8l: invalid prefix code")
    }
  }

  /** Read one prefix code (simple or full form) for `alphabetSize`. */
  private def readPrefixCode(br: BitReader, alphabetSize: Int): PrefixCode = {
    val lengths = new Array[Int](alphabetSize)
    if (br.readBit() == 1) { // simple: 1 or 2 symbols
      val numSymbols = br.readBits(1) + 1
      val first =
        if (br.readBit() == 1) br.readBits(8) else br.readBits(1)
      lengths(first) = 1
      if (numSymbols == 2) {
        val second = br.readBits(8)
        lengths(second) = 1
        // simple-form codes follow transmission order: first → code 0,
        // second → code 1 (NOT the canonical by-value assignment)
        new PrefixCode(lengths, explicit = Map(0 -> first, 1 -> second))
      } else new PrefixCode(lengths) // single symbol: trivial zero-bit code
    } else {
      val clcLengths = new Array[Int](19)
      val numCodeLengths = 4 + br.readBits(4)
      var i = 0
      while (i < numCodeLengths) {
        clcLengths(CodeLengthCodeOrder(i)) = br.readBits(3)
        i += 1
      }
      val clc = new PrefixCode(clcLengths)
      // optional cap on transmitted symbols
      var maxSymbol =
        if (br.readBit() == 1) {
          val lengthNBits = 2 + 2 * br.readBits(3)
          2 + br.readBits(lengthNBits)
        } else alphabetSize
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val codeLen = clc.read(br)
        if (codeLen < 16) {
          lengths(symbol) = codeLen
          symbol += 1
          if (codeLen != 0) prevLen = codeLen
        } else {
          val (repeatVal, extra, base) = codeLen match {
            case 16 => (prevLen, 2, 3)
            case 17 => (0, 3, 3)
            case _ => (0, 7, 11)
          }
          var rep = base + br.readBits(extra)
          while (rep > 0 && symbol < alphabetSize) {
            lengths(symbol) = repeatVal
            symbol += 1
            rep -= 1
          }
        }
      }
      new PrefixCode(lengths)
    }
  }

  /** LZ77 prefix-coded value: codes 0-3 are 1-4; beyond, an exponential
    * ladder with explicit extra bits.
    */
  private def lz77Value(br: BitReader, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extraBits = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extraBits
      offset + br.readBits(extraBits) + 1
    }

  /** The 2D neighbor map for distance codes 1..120 (spec table): (dx, dy)
    * pairs scanned in the published order; code > 120 → linear distance.
    */
  private val NeighborDistances: Array[(Int, Int)] = {
    // the spec's fixed 120-entry table: offsets within an 8-wide window
    val raw = Array(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
      (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
      (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
      (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
      (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
      (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
      (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
      (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
      (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
      (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
      (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
      (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
      (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
      (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))
    raw
  }

  private def planeCodeToDistance(width: Int, code: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = NeighborDistances(code - 1)
      math.max(1, dy * width + dx)
    }

  // ---------------- decode --------------------------------------------

  /** Decode a VP8L WebP payload to ARGB. None when the payload is not a
    * RIFF/WEBP/VP8L stream; throws on a corrupt stream (callers on the
    * fixture path treat that as a loud failure, like [[PngCodec]]).
    */
  def decode(payload: Array[Byte]): Option[Argb] = {
    if (payload.length < 30) return None
    if (!(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
        payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'E' &&
        payload(10) == 'B' && payload(11) == 'P' && payload(12) == 'V' &&
        payload(13) == 'P' && payload(14) == '8' && payload(15) == 'L'))
      return None
    if ((payload(20) & 0xff) != 0x2f) return None
    val br = new BitReader(payload, 21)
    val width = 1 + br.readBits(14)
    val height = 1 + br.readBits(14)
    // refuse-before-allocation (the MultimodalOps raster-guard contract):
    // 14-bit dims allow 16384² = 268M pixels = a 1 GiB int array — a
    // crafted header must not drive that allocation. Same ceiling as
    // MultimodalOps.MaxDecodePixels (2^24), checked on the dims the
    // DECODER will allocate from, before any pixel work.
    if (width.toLong * height > (1L << 24))
      throw new IllegalArgumentException(
        s"vp8l: raster ${width}x$height exceeds the decode ceiling")
    br.readBits(1) // alpha hint
    val version = br.readBits(3)
    if (version != 0)
      throw new IllegalArgumentException(s"vp8l: unknown version $version")
    // transforms: this decoder supports the untransformed stream (the
    // encoder never emits transforms; a foreign stream with one fails
    // loudly rather than decoding wrong pixels)
    if (br.readBit() == 1)
      throw new IllegalArgumentException("vp8l: transforms not supported")
    // color cache
    val cacheBits = if (br.readBit() == 1) br.readBits(4) else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = new Array[Int](math.max(cacheSize, 1))
    // meta-prefix image (one code group when absent)
    if (br.readBit() == 1)
      throw new IllegalArgumentException("vp8l: meta-prefix not supported")
    val green = readPrefixCode(br, 256 + 24 + cacheSize)
    val red = readPrefixCode(br, 256)
    val blue = readPrefixCode(br, 256)
    val alpha = readPrefixCode(br, 256)
    val dist = readPrefixCode(br, 40)

    val n = width * height
    val px = new Array[Int](n)
    var i = 0
    def insertCache(argb: Int): Unit =
      if (cacheBits > 0)
        cache(((argb * 0x1e35a7bd) >>> (32 - cacheBits))) = argb
    while (i < n) {
      val g = green.read(br)
      if (g < 256) {
        val r = red.read(br)
        val b = blue.read(br)
        val a = alpha.read(br)
        val argb = (a << 24) | (r << 16) | (g << 8) | b
        px(i) = argb
        insertCache(argb)
        i += 1
      } else if (g < 280) {
        val length = lz77Value(br, g - 256)
        val distCode = dist.read(br)
        val distance = planeCodeToDistance(width, lz77Value(br, distCode))
        if (distance > i)
          throw new IllegalArgumentException("vp8l: backref before start")
        var k = 0
        while (k < length && i < n) {
          px(i) = px(i - distance)
          insertCache(px(i))
          i += 1
          k += 1
        }
      } else {
        if (cacheBits == 0)
          throw new IllegalArgumentException("vp8l: cache hit without cache")
        px(i) = cache(g - 280)
        i += 1
      }
    }
    Some(Argb(width, height, px))
  }

  // ---------------- encode --------------------------------------------

  /** Fixed complete green-code lengths: symbols 0..231 at 8 bits,
    * 232..279 at 9 (Kraft: 232/256 + 48/512 = 1). Literals above 231 pay
    * one extra bit; the 24 LZ77 length symbols land in the 9-bit tail
    * unused.
    */
  private val GreenLengths: Array[Int] =
    Array.tabulate(280)(s => if (s < 232) 8 else 9)
  private val FlatLengths: Array[Int] = Array.fill(256)(8)

  /** Emit a full-form prefix code whose code-length sequence is `runs` of
    * identical lengths, using a 2-symbol code-length code (each length
    * gets 1 bit). `usedLens` must be exactly the two distinct lengths.
    */
  private def writeTwoLengthCode(bw: BitWriter, lengths: Array[Int],
                                 lenA: Int, lenB: Int): Unit = {
    bw.writeBits(0, 1) // full form
    val maxOrderIdx = CodeLengthCodeOrder.indexOf(math.max(lenA, lenB))
    val numCodeLengths = maxOrderIdx + 1
    bw.writeBits(numCodeLengths - 4, 4)
    var i = 0
    while (i < numCodeLengths) {
      val sym = CodeLengthCodeOrder(i)
      bw.writeBits(if (sym == lenA || sym == lenB) 1 else 0, 3)
      i += 1
    }
    bw.writeBits(0, 1) // no max-symbol cap
    // clc canonical: smaller symbol -> 0, larger -> 1 (both length 1)
    val (lo, hi) = (math.min(lenA, lenB), math.max(lenA, lenB))
    lengths.foreach { l =>
      require(l == lo || l == hi, s"unexpected code length $l")
      bw.writeBits(if (l == lo) 0 else 1, 1)
    }
  }

  /** Encode an ARGB raster as a real VP8L stream (no transforms, no
    * cache, no meta-prefix, fixed complete codes — see the object doc).
    */
  def encode(img: Argb): Array[Byte] = {
    require(img.width >= 1 && img.width <= (1 << 14) &&
      img.height >= 1 && img.height <= (1 << 14), "vp8l: dims out of range")
    val bw = new BitWriter
    bw.writeBits(img.width - 1, 14)
    bw.writeBits(img.height - 1, 14)
    bw.writeBits(0, 1) // alpha hint
    bw.writeBits(0, 3) // version
    bw.writeBits(0, 1) // no transforms
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(0, 1) // no meta-prefix
    writeTwoLengthCode(bw, GreenLengths, 8, 9)
    // r/b/a: flat 8-bit codes written with a {0,8} two-symbol clc (the
    // zero keeps the clc complete; no symbol actually uses length 0)
    def writeFlat(): Unit = {
      bw.writeBits(0, 1)
      val numCodeLengths = CodeLengthCodeOrder.indexOf(8) + 1
      bw.writeBits(numCodeLengths - 4, 4)
      var i = 0
      while (i < numCodeLengths) {
        val sym = CodeLengthCodeOrder(i)
        bw.writeBits(if (sym == 0 || sym == 8) 1 else 0, 3)
        i += 1
      }
      bw.writeBits(0, 1) // no cap
      // clc canonical over {0, 8}: 0 -> code 0, 8 -> code 1
      var s = 0
      while (s < 256) { bw.writeBits(1, 1); s += 1 }
    }
    writeFlat(); writeFlat(); writeFlat()
    // distance: single-symbol simple code (never read back)
    bw.writeBits(1, 1) // simple
    bw.writeBits(0, 1) // one symbol
    bw.writeBits(0, 1) // 1-bit symbol form
    bw.writeBits(0, 1) // symbol 0
    // literals
    val greenCodes = canonicalCodes(GreenLengths)
    img.pixels.foreach { p =>
      val a = (p >>> 24) & 0xff
      val r = (p >>> 16) & 0xff
      val g = (p >>> 8) & 0xff
      val b = p & 0xff
      bw.writeCode(greenCodes(g), GreenLengths(g))
      bw.writeCode(r, 8)
      bw.writeCode(b, 8)
      bw.writeCode(a, 8)
    }
    val body = bw.toBytes
    // container: RIFF size = 4 (WEBP) + 8 (chunk hdr) + payload (padded)
    val chunkLen = 1 + body.length
    val padded = chunkLen + (chunkLen & 1)
    val out = java.nio.ByteBuffer.allocate(12 + 8 + padded)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + padded)
      .put("WEBP".getBytes("US-ASCII"))
      .put("VP8L".getBytes("US-ASCII")).putInt(chunkLen)
      .put(0x2f.toByte).put(body)
    out.array()
  }
}
