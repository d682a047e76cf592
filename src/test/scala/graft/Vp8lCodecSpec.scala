package graft

import graft.ops.Vp8lCodec
import org.scalatest.funsuite.AnyFunSuite

/** Bit-level contract of the VP8L codec: encode→decode round-trips, the
  * general decoder paths the canonical encoder never emits (LZ77
  * back-references, color cache) via hand-packed streams, and loud
  * failures on truncation/foreign payloads.
  */
class Vp8lCodecSpec extends AnyFunSuite {

  /** Minimal LSB-first bit packer for hand-crafting decoder-path streams
    * (mirrors the codec's write convention: value bits LSB-first, prefix
    * CODES MSB-first).
    */
  private final class W {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def bits(v: Int, len: Int): W = {
      var i = 0
      while (i < len) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i += 1
      }
      this
    }
    def code(c: Int, len: Int): W = {
      var i = len - 1
      while (i >= 0) { bits((c >> i) & 1, 1); i -= 1 }
      this
    }
    def riffVp8l(): Array[Byte] = {
      if (n > 0) { out.write(cur); cur = 0; n = 0 }
      val body = out.toByteArray
      val chunkLen = 1 + body.length
      val padded = chunkLen + (chunkLen & 1)
      val bb = java.nio.ByteBuffer.allocate(12 + 8 + padded)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(4 + 8 + padded).put("WEBP".getBytes)
        .put("VP8L".getBytes).putInt(chunkLen).put(0x2f.toByte).put(body)
      bb.array()
    }
  }

  private def header(w: W, width: Int, height: Int): W =
    w.bits(width - 1, 14).bits(height - 1, 14)
      .bits(0, 1) // alpha hint
      .bits(0, 3) // version
      .bits(0, 1) // no transforms

  /** Two-symbol (each length 1) full-form green code over symbols a < b,
    * alphabet 280 (+cache): clc = {0:1, 1:1} is NOT usable (values are
    * lengths, not symbols) — transmit lengths via clc over {0, 1}: length
    * symbols 0 (unused) and 1 (the two live symbols).
    */
  private def greenTwoSymbol(w: W, a: Int, b: Int, alphabet: Int): Unit = {
    w.bits(0, 1) // full form
    // clc lengths: need symbols 0 and 1 → order [17,18,0,1] → 4 entries
    w.bits(0, 4) // num_code_lengths = 4
    w.bits(0, 3) // 17 → 0
    w.bits(0, 3) // 18 → 0
    w.bits(1, 3) // 0 → len 1
    w.bits(1, 3) // 1 → len 1
    w.bits(0, 1) // no max-symbol cap
    // clc canonical: 0→code 0, 1→code 1; emit `alphabet` entries
    var s = 0
    while (s < alphabet) {
      w.bits(if (s == a || s == b) 1 else 0, 1)
      s += 1
    }
  }

  /** Simple single-symbol code (zero-bit reads). */
  private def simple1(w: W, sym: Int): Unit = {
    w.bits(1, 1) // simple
    w.bits(0, 1) // one symbol
    if (sym < 2) { w.bits(0, 1); w.bits(sym, 1) }
    else { w.bits(1, 1); w.bits(sym, 8) }
  }

  test("encode/decode round-trip: doc-arithmetic and adversarial rasters") {
    // full byte range incl. >231 literals (9-bit green tail) and alpha<255
    val cases = Seq((1, 1), (3, 2), (16, 16), (13, 7))
    for ((wd, ht) <- cases) {
      val px = Array.tabulate(wd * ht) { i =>
        val v = (i * 37 + 11) % 256
        ((255 - (i % 7)) << 24) | (((v + 123) % 256) << 16) | (v << 8) |
          ((v * 5 + 250) % 256)
      }
      val bytes = Vp8lCodec.encode(Vp8lCodec.Argb(wd, ht, px))
      val dec = Vp8lCodec.decode(bytes)
      assert(dec.isDefined, s"decode failed for ${wd}x$ht")
      assert(dec.get.width == wd && dec.get.height == ht)
      assert(dec.get.pixels.toSeq == px.toSeq, s"pixels differ for ${wd}x$ht")
    }
  }

  test("decoder: LZ77 back-reference (linear distance) copies pixels") {
    // 3x1: literal ARGB(255, 7, 42, 9), then backref len 2 dist 1
    val w = new W
    header(w, 3, 1)
    w.bits(0, 1) // no color cache
    w.bits(0, 1) // no meta-prefix
    // green: symbols {42, 256} len 1 → 42→code0, 256→code1
    greenTwoSymbol(w, 42, 256, 280)
    simple1(w, 7) // red
    simple1(w, 9) // blue
    simple1(w, 255) // alpha
    // distance: single symbol 13 (value range 97..128 with 5 extra bits)
    simple1(w, 13)
    // pixel 0: literal 42 (code 0); r/b/a are zero-bit
    w.code(0, 1)
    // pixels 1-2: green 256 (code 1) → length code 0 → len 1... but we
    // need len 2: symbol 256 means length prefix code 0 → lz77Value=1.
    // Emit the backref twice (len 1 each), dist = 97 + 24 = 121 → 1
    w.code(1, 1); w.bits(24, 5)
    w.code(1, 1); w.bits(24, 5)
    val dec = Vp8lCodec.decode(w.riffVp8l())
    assert(dec.isDefined)
    val expected = (255 << 24) | (7 << 16) | (42 << 8) | 9
    assert(dec.get.pixels.toSeq == Seq(expected, expected, expected))
  }

  test("decoder: color cache round-trips a repeated pixel") {
    val argb = (255 << 24) | (7 << 16) | (42 << 8) | 9
    val cacheBits = 1
    val idx = (argb * 0x1e35a7bd) >>> (32 - cacheBits)
    val w = new W
    header(w, 2, 1)
    w.bits(1, 1).bits(cacheBits, 4) // color cache on, 1 bit → 2 entries
    w.bits(0, 1) // no meta-prefix
    // green alphabet 256+24+2: symbols {42, 280+idx}
    greenTwoSymbol(w, 42, 280 + idx, 282)
    simple1(w, 7); simple1(w, 9); simple1(w, 255) // r/b/a
    simple1(w, 0) // distance (unused)
    w.code(0, 1) // literal 42 → cache insert
    w.code(1, 1) // cache hit
    val dec = Vp8lCodec.decode(w.riffVp8l())
    assert(dec.isDefined)
    assert(dec.get.pixels.toSeq == Seq(argb, argb))
  }

  test("decoder: simple 2-symbol codes assign codes in TRANSMISSION order, " +
      "not canonical symbol order") {
    // red channel: simple code transmitting symbols (200, 10) — code 0
    // must decode to 200 (the first-read symbol) even though canonical
    // by-value assignment would give 10 the zero code
    val w = new W
    header(w, 1, 1)
    w.bits(0, 1) // no color cache
    w.bits(0, 1) // no meta-prefix
    greenTwoSymbol(w, 42, 256, 280) // green: literal 42 (code 0)
    // red: simple, 2 symbols, 8-bit form: first=200, second=10
    w.bits(1, 1).bits(1, 1).bits(1, 1).bits(200, 8).bits(10, 8)
    simple1(w, 9) // blue
    simple1(w, 255) // alpha
    simple1(w, 0) // distance (unused)
    w.code(0, 1) // green literal 42
    w.bits(0, 1) // red code 0 → MUST be 200
    val dec = Vp8lCodec.decode(w.riffVp8l())
    assert(dec.isDefined)
    val p = dec.get.pixels(0)
    assert(((p >>> 16) & 0xff) == 200,
      s"simple-code order broken: red = ${(p >>> 16) & 0xff}")
  }

  test("refuse-before-allocation: a crafted header claiming a huge raster " +
      "is rejected before any pixel allocation") {
    // 16384x16384 claimed dims = 268M pixels = a 1 GiB int array if decoded
    val w = new W
    header(w, 16384, 16384)
    w.bits(0, 64) // filler past the container minimum — never read
    val ex = intercept[IllegalArgumentException] {
      Vp8lCodec.decode(w.riffVp8l())
    }
    assert(ex.getMessage.contains("ceiling"))
  }

  test("foreign payloads return None; truncation fails loudly") {
    assert(Vp8lCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    // a VP8X (extended) WebP is not a VP8L stream
    val vp8x = graft.ops.MultimodalOps.craftHeader("webp", 10, 10)
    assert(Vp8lCodec.decode(vp8x).isEmpty)
    // truncated mid-pixels: encode then cut
    val px = Array.tabulate(64)(i => (255 << 24) | (i << 8))
    val full = Vp8lCodec.encode(Vp8lCodec.Argb(8, 8, px))
    intercept[IllegalArgumentException] {
      Vp8lCodec.decode(full.take(full.length - 20))
    }
  }
}
