package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed per-partition in batches.
  *
  * Format/width/height come from REAL byte-level header parsing
  * (PNG/BMP/JPEG container layouts, no codec dependency). Pixel decode is
  * REAL for PNG ([[PngCodec]]: zlib inflate + the five row filters),
  * WebP-lossless ([[Vp8lCodec]]: canonical prefix codes + LZ77 + color
  * cache, pure JVM), GIF ([[GifCodec]]: variable-width LZW + sub-block
  * framing + interlace, pure JVM, oracle-gated via q_gif_pixel_stats
  * and cross-validated against the JDK's own reader) and JPEG/BMP (the
  * JDK's built-in ImageIO). The
  * one STUB left, clearly marked below, is the model-inference feature
  * vector for payloads with no deterministic decode (lossy VP8's
  * adaptive arithmetic coder — the same cross-implementation
  * nondeterminism that keeps JPEG features rows-only — and non-media
  * bytes). Everything else — binary schema, partition batching, typed
  * output encoders, the mapPartitions shape that amortizes per-batch
  * library init — is the real, tested scale path.
  */
object MultimodalOps {

  final case class MediaRow(docId: Long, payload: Array[Byte])
  final case class MediaMeta(
      docId: Long, nBytes: Int, format: String, width: Int, height: Int,
      features: Array[Float])

  /** Real byte-level header parsing for PNG / BMP / JPEG / GIF / WebP /
    * TIFF — no codec dependency, just the published container layouts.
    * Returns (format, width, height); None when the payload is not one of
    * the six (or is truncated mid-header).
    */
  private[graft] def parseHeader(p: Array[Byte]): Option[(String, Int, Int)] =
    parsePng(p).orElse(parseBmp(p)).orElse(parseJpeg(p))
      .orElse(parseGif(p)).orElse(parseWebp(p)).orElse(parseTiff(p))

  private def be32(p: Array[Byte], i: Int): Long =
    ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
      ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)

  private def le32(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)

  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)

  private def le24(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) | ((p(i + 2) & 0xff) << 16)

  /** PNG: 8-byte signature, then the IHDR chunk MUST be first — width and
    * height are the two big-endian u32s at offsets 16 and 20.
    */
  private def parsePng(p: Array[Byte]): Option[(String, Int, Int)] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (p.length < 24 || !sig.indices.forall(i => (p(i) & 0xff) == sig(i)))
      return None
    // chunk type at 12..15 must literally be "IHDR"
    if (!(p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R'))
      return None
    Some(("png", be32(p, 16).toInt, be32(p, 20).toInt))
  }

  /** BMP: "BM" magic; BITMAPINFOHEADER width/height are little-endian
    * i32s at offsets 18 and 22. Height may be negative (top-down rows).
    * A 2-byte magic alone misfires on text starting "BM…", so the DIB
    * header size at offset 14 must be one of the published 32-bit-dims
    * header lengths, and the dims must be sane (w > 0, h ≠ 0).
    */
  private val BmpDibSizes = Set(40, 52, 56, 64, 108, 124)
  private def parseBmp(p: Array[Byte]): Option[(String, Int, Int)] = {
    if (p.length < 26 || p(0) != 'B' || p(1) != 'M') return None
    if (!BmpDibSizes(le32(p, 14))) return None
    val w = le32(p, 18)
    val h = le32(p, 22)
    if (w <= 0 || h == 0) return None
    Some(("bmp", w, math.abs(h)))
  }

  /** JPEG: SOI then a marker walk — each segment is FF <marker> <len:be16>;
    * the SOFn frame header (C0-CF minus C4/C8/CC) carries height then
    * width as big-endian u16s after the length and precision bytes.
    */
  private def parseJpeg(p: Array[Byte]): Option[(String, Int, Int)] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < p.length) {
      if ((p(i) & 0xff) != 0xff) return None
      val marker = p(i + 1) & 0xff
      if (marker == 0xff) i += 1 // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9))
        i += 2 // standalone markers carry no length
      else {
        val sof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (sof) {
          if (i + 9 > p.length) return None
          val h = ((p(i + 5) & 0xff) << 8) | (p(i + 6) & 0xff)
          val w = ((p(i + 7) & 0xff) << 8) | (p(i + 8) & 0xff)
          return Some(("jpeg", w, h))
        }
        i += 2 + (((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff))
      }
    }
    None
  }

  /** GIF: "GIF87a"/"GIF89a" signature; the logical-screen width and height
    * are little-endian u16s at offsets 6 and 8. Zero dims rejected (a text
    * payload starting "GIF89a" followed by NULs must not sniff).
    */
  private def parseGif(p: Array[Byte]): Option[(String, Int, Int)] = {
    if (p.length < 10) return None
    val sig = new String(p.slice(0, 6), "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(p, 6)
    val h = le16(p, 8)
    if (w == 0 || h == 0) None else Some(("gif", w, h))
  }

  /** WebP: RIFF container ("RIFF" <size:le32> "WEBP"), then the first
    * chunk's FourCC picks the variant — VP8X extended (24-bit canvas dims
    * stored minus one at offsets 24/27), VP8L lossless (0x2F signature
    * then two 14-bit dims-minus-one packed little-endian bit-first), or
    * VP8 lossy (3-byte frame tag, 9D 01 2A sync code, then 14-bit dims in
    * little-endian u16s).
    */
  private def parseWebp(p: Array[Byte]): Option[(String, Int, Int)] = {
    if (p.length < 30) return None
    if (!(p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'E' && p(10) == 'B' && p(11) == 'P')) return None
    new String(p.slice(12, 16), "US-ASCII") match {
      case "VP8X" =>
        Some(("webp", 1 + le24(p, 24), 1 + le24(p, 27)))
      case "VP8L" =>
        if ((p(20) & 0xff) != 0x2f) return None
        val b = Array.tabulate(4)(i => p(21 + i) & 0xff)
        val w = 1 + (b(0) | ((b(1) & 0x3f) << 8))
        val h = 1 + ((b(1) >> 6) | (b(2) << 2) | ((b(3) & 0x0f) << 10))
        Some(("webp", w, h))
      case "VP8 " =>
        if ((p(23) & 0xff) != 0x9d || (p(24) & 0xff) != 0x01 ||
          (p(25) & 0xff) != 0x2a) return None
        Some(("webp", le16(p, 26) & 0x3fff, le16(p, 28) & 0x3fff))
      case _ => None
    }
  }

  /** TIFF: "II*\0" (little-endian) or "MM\0*" (big-endian) magic with the
    * first-IFD offset at 4; IFD entries are 12 bytes of (tag, type, count,
    * value) — tags 256/257 carry ImageWidth/ImageLength as SHORT(3) or
    * LONG(4), the value left-justified in its 4-byte field.
    */
  private def parseTiff(p: Array[Byte]): Option[(String, Int, Int)] = {
    if (p.length < 8) return None
    val le = p(0) == 'I' && p(1) == 'I' && (p(2) & 0xff) == 0x2a && p(3) == 0
    val be = p(0) == 'M' && p(1) == 'M' && p(2) == 0 && (p(3) & 0xff) == 0x2a
    if (!le && !be) return None
    def u16(i: Int) = if (le) le16(p, i) else ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
    def u32(i: Int) = if (le) le32(p, i).toLong & 0xffffffffL else be32(p, i)
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > p.length) return None
    val n = u16(ifd.toInt)
    var w = -1
    var h = -1
    for (k <- 0 until n; e = ifd.toInt + 2 + k * 12 if e + 12 <= p.length) {
      val v = u16(e + 2) match {
        case 3 => u16(e + 8) // SHORT: first 2 bytes of the value field
        case 4 => u32(e + 8).toInt // LONG
        case _ => -1
      }
      u16(e) match {
        case 256 => w = v
        case 257 => h = v
        case _ => ()
      }
    }
    if (w > 0 && h > 0) Some(("tiff", w, h)) else None
  }

  /** ==== audio/video containers ==== — same pure-byte discipline as the
    * image parsers: WAV (RIFF/WAVE chunk walk) and MP4 (ISO-BMFF box walk)
    * yield (format, duration_ms, sample_rate, channels); video/audio
    * DECODE stays stubbed (no codecs here), the container metadata is
    * real.
    */

  /** WAV: "RIFF" <size> "WAVE", then chunks of [fourcc, le32 size]. The
    * "fmt " chunk carries channels (le16 at +2), sample rate (le32 at +4)
    * and byte rate (le32 at +8); the "data" chunk's SIZE over the byte
    * rate is the duration. Chunks are word-aligned (odd sizes pad 1).
    */
  private def parseWav(p: Array[Byte]): Option[(String, Long, Int, Int)] = {
    if (p.length < 12 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
      p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E') return None
    var i = 12
    var channels = -1
    var sampleRate = -1
    var byteRate = -1L
    var dataSize = -1L
    while (i + 8 <= p.length && (channels < 0 || dataSize < 0)) {
      val id = new String(p.slice(i, i + 4), "US-ASCII")
      val sz = le32(p, i + 4).toLong & 0xffffffffL
      // a corrupt/crafted size past the payload would truncate to a
      // negative Int and stall or crash the cursor advance — reject
      if (sz > p.length) return None
      if (id == "fmt " && sz >= 16 && i + 24 <= p.length) {
        channels = le16(p, i + 10)
        sampleRate = le32(p, i + 12)
        byteRate = le32(p, i + 16).toLong & 0xffffffffL
      } else if (id == "data") dataSize = sz
      i += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (channels <= 0 || sampleRate <= 0 || byteRate <= 0 || dataSize < 0) None
    else Some(("wav", dataSize * 1000L / byteRate, sampleRate, channels))
  }

  /** MP4 (ISO base media): top-level boxes of [be32 size, fourcc] — `ftyp`
    * authenticates the container, `moov`/`mvhd` carries the movie
    * timescale and duration (version 0: u32s at +20/+24 past the box
    * header; version 1: u64 duration at +32 past 8-byte times). Trailing
    * non-box bytes are never reached: the walk stops once both boxes are
    * seen or a size field goes invalid.
    */
  private def parseMp4(p: Array[Byte]): Option[(String, Long, Int, Int)] = {
    if (p.length < 16) return None
    var i = 0
    var sawFtyp = false
    var duration = -1L
    while (i + 8 <= p.length && !(sawFtyp && duration >= 0)) {
      val sz = be32(p, i)
      val typ = new String(p.slice(i + 4, i + 8), "US-ASCII")
      // the loop guard already exited when both boxes were found, so an
      // invalid size here can only mean trailing non-box bytes: stop
      if (sz < 8 || i + sz > p.length) return None
      typ match {
        case "ftyp" => sawFtyp = true
        case "moov" =>
          var j = i + 8
          while (j + 8 <= i + sz && duration < 0) {
            val bsz = be32(p, j)
            if (bsz < 8 || j + bsz > i + sz) return None
            // field reads are bounded by the mvhd box's OWN size — a
            // short box must not read the sibling box's bytes as fields
            if (new String(p.slice(j + 4, j + 8), "US-ASCII") == "mvhd"
                && bsz >= 9) {
              val v = p(j + 8) & 0xff
              if (v == 0 && bsz >= 28) {
                val timescale = be32(p, j + 20)
                if (timescale > 0)
                  duration = be32(p, j + 24) * 1000L / timescale
              } else if (v == 1 && bsz >= 40) {
                val timescale = be32(p, j + 28)
                val dur = (be32(p, j + 32) << 32) | be32(p, j + 36)
                if (timescale > 0) duration = dur * 1000L / timescale
              }
            }
            j += bsz.toInt
          }
        case _ => ()
      }
      i += sz.toInt
    }
    if (sawFtyp && duration >= 0) Some(("mp4", duration, 0, 0)) else None
  }

  /** Real byte-level AV header parsing — (format, duration_ms,
    * sample_rate, channels); audio-only fields are 0 for video containers.
    */
  private[graft] def parseAvHeader(p: Array[Byte]): Option[(String, Long, Int, Int)] =
    parseWav(p).orElse(parseMp4(p))

  /** The WAV data chunk as signed 16-bit LE samples (the format the
    * [[craftAvHeader]] header declares): chunk walk as in [[parseWav]]
    * but stricter — a chunk whose declared size exceeds the REMAINING
    * bytes (EOF-truncated, not merely absurd) is also refused, because
    * this path reads the payload, not just the header. Trailing odd byte
    * dropped (a 16-bit frame needs both halves). None for a non-WAV or
    * truncated container.
    */
  private[graft] def wavPcm(p: Array[Byte]): Option[Array[Int]] = {
    if (p.length < 12 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
      p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E') return None
    var i = 12
    while (i + 8 <= p.length) {
      val id = new String(p.slice(i, i + 4), "US-ASCII")
      val sz = le32(p, i + 4).toLong & 0xffffffffL
      if (i + 8 + sz > p.length) return None
      if (id == "data") {
        val end = i + 8 + sz.toInt
        val n = (end - (i + 8)) / 2
        val out = new Array[Int](n)
        var j = 0
        while (j < n) {
          val lo = p(i + 8 + 2 * j) & 0xff
          val hi = p(i + 8 + 2 * j + 1) & 0xff
          val v = lo + (hi << 8)
          out(j) = if (v >= 32768) v - 65536 else v
          j += 1
        }
        return Some(out)
      }
      i += 8 + sz.toInt + (sz.toInt & 1)
    }
    None
  }

  /** Audio feature extraction over REAL PCM — the audio leg of the
    * feature-extract quartet: each WAV fixture's data chunk (the document
    * text's UTF-8 bytes, by construction) parses as the declared signed
    * 16-bit LE stream and reduces to the classic integer DSP signals —
    * energy (Σ s²), peak |s|, and strict sign-flip zero crossings
    * (s_{i−1}·s_i < 0 — zeros break runs identically in both engines).
    * All integers, so the DuckDB oracle replays the byte-pair decode and
    * every feature exactly (hex-digit fold over the text bytes). A WAV
    * that fails to parse emits the loud n_samples = −1 row; MP4 docs are
    * out of scope by the fixture's even/odd split.
    */
  def audioFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    avFromDocuments(s, d)
      .filter((r: MediaRow) => r.docId % 2 == 0)
      .mapPartitions { rows =>
        rows.map { r =>
          wavPcm(r.payload) match {
            case Some(smp) =>
              var sq = 0L
              var peak = 0
              var zc = 0L
              var i = 0
              while (i < smp.length) {
                val v = smp(i)
                sq += v.toLong * v
                if (math.abs(v) > peak) peak = math.abs(v)
                if (i > 0 && smp(i - 1).toLong * v < 0) zc += 1
                i += 1
              }
              (r.docId, smp.length.toLong, sq, peak, zc)
            case None => (r.docId, -1L, 0L, 0, 0L)
          }
        }
      }
      .toDF("doc_id", "n_samples", "sq_sum", "peak", "zero_cross")
      .orderBy("doc_id")
  }

  /** Crafted AV container headers (fixture + parser tests share these).
    * WAV: the caller appends `dataLen` payload bytes after the header —
    * the data chunk size covers exactly them. MP4: a minimal ftyp+moov;
    * trailing payload bytes are never parsed.
    */
  private[graft] def craftAvHeader(fmt: String, a: Long, b: Long,
                                   dataLen: Int = 0): Array[Byte] = fmt match {
    case "wav" => // a = sample rate, b = channels
      val byteRate = a.toInt * b.toInt * 2
      val bb = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(b.toShort)
        .putInt(a.toInt)
        .putInt(byteRate)
        .putShort((b * 2).toShort) // block align
        .putShort(16) // bits/sample
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      bb.array()
    case "mp4" => // a = timescale, b = duration (media units)
      val bb = java.nio.ByteBuffer.allocate(16 + 8 + 108) // ftyp + moov(mvhd)
      bb.putInt(16).put("ftyp".getBytes("US-ASCII"))
        .put("isom".getBytes("US-ASCII")).putInt(0x200)
      bb.putInt(8 + 108).put("moov".getBytes("US-ASCII"))
      bb.putInt(108).put("mvhd".getBytes("US-ASCII"))
        .putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // ctime, mtime
        .putInt(a.toInt).putInt(b.toInt) // timescale, duration
      // rest of the 108-byte mvhd (rate, volume, matrix, next-track) stays 0
      bb.array()
    case other => throw new IllegalArgumentException(s"unknown av format: $other")
  }

  /** Minimal valid header bytes for each format with the given dimensions —
    * the fixture-enrichment writer ([[mediaFromDocuments]]) and the parser
    * tests share this so the parsed dimensions are real round-trips.
    */
  private[graft] def craftHeader(fmt: String, w: Int, h: Int): Array[Byte] = fmt match {
    case "png" =>
      val b = java.nio.ByteBuffer.allocate(24)
      b.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      b.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
      b.array()
    case "bmp" =>
      val b = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).position(14)
      b.putInt(40) // BITMAPINFOHEADER — the parser validates the DIB size
      b.putInt(w).putInt(h)
      b.array()
    case "jpeg" =>
      // SOI, empty APP0 (skipped by the marker walk), SOF0 with dims
      val b = java.nio.ByteBuffer.allocate(2 + 2 + 2 + 2 + 2 + 1 + 2 + 2)
      b.putShort(0xffd8.toShort)
      b.putShort(0xffe0.toShort).putShort(2) // APP0, len counts itself only
      b.putShort(0xffc0.toShort).putShort(7) // SOF0: len + prec + h + w
      b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      b.array()
    case "gif" =>
      val b = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("GIF89a".getBytes("US-ASCII")).putShort(w.toShort).putShort(h.toShort)
      b.array()
    case "webp" =>
      // RIFF/WEBP with a VP8X chunk: canvas dims stored minus one as le24
      val b = java.nio.ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(22).put("WEBP".getBytes("US-ASCII"))
      b.put("VP8X".getBytes("US-ASCII")).putInt(10)
      b.putInt(0) // flags + reserved
      def p24(v: Int): Unit = {
        b.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
        b.put(((v >> 16) & 0xff).toByte)
      }
      p24(w - 1); p24(h - 1)
      b.array()
    case "tiff" =>
      // little-endian, one IFD: ImageWidth/ImageLength as LONGs
      val b = java.nio.ByteBuffer.allocate(8 + 2 + 2 * 12 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
      b.putShort(2)
      b.putShort(256).putShort(4).putInt(1).putInt(w)
      b.putShort(257).putShort(4).putInt(1).putInt(h)
      b.putInt(0) // no next IFD
      b.array()
    case other => throw new IllegalArgumentException(s"unknown format: $other")
  }

  /** ==== STUB ==== deterministic fallback for payloads that are not
    * parseable media (real pipeline: quarantine or route to a codec that
    * sniffs further formats). Format is the sentinel "unknown" — never a
    * real container name, so consumers can always tell genuinely parsed
    * headers from pseudo-metadata. Dims are stable hashes of the bytes so
    * the plumbing stays testable on arbitrary payloads.
    */
  private[ops] def decodeStub(payload: Array[Byte]): (String, Int, Int) = {
    val h = payload.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
    ("unknown", 64 + math.abs(h % 1024).toInt, 64 + math.abs((h / 1024) % 1024).toInt)
  }

  /** Per-channel pixel means of a decodable PNG, normalized to [0,1] —
    * the REAL feature leg for the one format this container can fully
    * decode. None routes the caller to [[featuresStub]].
    */
  private[graft] def pngFeatures(payload: Array[Byte]): Option[Array[Float]] =
    PngCodec.decode(payload).map { r =>
      val sums = new Array[Long](r.channels)
      var i = 0
      while (i < r.samples.length) {
        sums(i % r.channels) += r.samples(i) & 0xff
        i += 1
      }
      val n = (r.width.toLong * r.height).toFloat
      sums.map(s => s / n / 255f)
    }

  /** Real JPEG pixel decode via the JDK's BUILT-IN ImageIO codec
    * (java.desktop module — no external dependency): per-channel RGB
    * means normalized to [0,1], one bulk getRGB call (per-pixel calls pay
    * a color-model conversion each). DETERMINISM CAVEAT, and why this leg
    * stays off the oracle surface: JPEG inverse-DCT output is bit-stable
    * within one JDK but not specified across decoder implementations —
    * so JPEG features remain rows-only like every feature vector, while
    * the pixel DECODE itself is now real (the stub below is left only
    * for WebP/unknown payloads, honestly labeled). None on anything
    * ImageIO can't decode routes to the stub.
    */
  /** Formats the JDK's ImageIO decodes that [[extractMeta]] routes through
    * the real leg. PNG is deliberately absent — it takes the hand-rolled
    * bit-deterministic [[PngCodec]] (the oracle-gradable path); GIF/BMP
    * decode LOSSLESSLY in ImageIO (LZW / raw raster — deterministic),
    * JPEG within its cross-implementation DCT caveat.
    */
  private[graft] val ImageIoFormats: Set[String] = Set("jpeg", "gif", "bmp")

  /** Raster-size ceiling for the ImageIO decode leg — the same
    * refuse-before-allocation contract [[PngCodec]] enforces (and its
    * spec tests): a crafted header claiming a huge raster must not drive
    * ImageIO into a multi-GB allocation whose OOME would poison the
    * executor. 2^24 pixels ≈ a 4096×4096 image ≈ 64 MB of int ARGB.
    */
  private[graft] val MaxDecodePixels: Long = 1L << 24

  private[graft] def jpegFeatures(payload: Array[Byte]): Option[Array[Float]] = {
    import scala.util.control.NonFatal
    // The raster ceiling must gate the dims the DECODER will allocate, not
    // the container header's claim: a GIF's logical-screen descriptor (what
    // parseHeader reads) can be tiny while a per-frame image descriptor
    // declares an arbitrarily larger raster that ImageIO.read would size
    // the BufferedImage from. reader.getWidth/getHeight(0) parse only the
    // frame header — no pixel allocation — so checking them here closes
    // that bypass. NonFatal keeps OutOfMemoryError propagating: swallowing
    // it would leave the executor silently poisoned.
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) None
            else Option(reader.read(0)).map { img =>
              val rgb = img.getRGB(0, 0, w, h, null, 0, w)
              val sums = new Array[Long](3)
              var i = 0
              while (i < rgb.length) {
                val p = rgb(i)
                sums(0) += (p >> 16) & 0xff
                sums(1) += (p >> 8) & 0xff
                sums(2) += p & 0xff
                i += 1
              }
              val n = (w.toLong * h).toFloat
              sums.map(s => s / n / 255f)
            }
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case NonFatal(_) => None }
  }

  /** Per-channel RGB means of a VP8L (lossless WebP) payload through the
    * REAL bit-level decode ([[Vp8lCodec]]) — same contract as
    * [[pngFeatures]]; None (lossy VP8, VP8X, corrupt stream) routes to
    * the stub.
    */
  private[graft] def vp8lFeatures(payload: Array[Byte]): Option[Array[Float]] =
    scala.util.Try(Vp8lCodec.decode(payload)).toOption.flatten.map { img =>
      val sums = new Array[Long](3)
      img.pixels.foreach { p =>
        sums(0) += (p >>> 16) & 0xff
        sums(1) += (p >>> 8) & 0xff
        sums(2) += p & 0xff
      }
      val n = (img.width.toLong * img.height).toFloat
      sums.map(s => s / n / 255f)
    }

  /** ==== STUB ==== deterministic fake feature vector for CODEC-BOUND
    * formats this JVM has no decoder for (lossy VP8's adaptive arithmetic
    * coder; true model inference); PNG takes [[pngFeatures]], VP8L WebP
    * takes [[vp8lFeatures]], JPEG/GIF/BMP take [[jpegFeatures]].
    */
  private[ops] def featuresStub(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var acc = 1469598103934665603L // FNV offset basis — any fixed seed works
    var i = 0
    while (i < payload.length) {
      acc = (acc ^ (payload(i) & 0xff)) * 1099511628211L
      out(i % dim) += ((acc >>> 32).toInt / Int.MaxValue.toFloat)
      i += 1
    }
    out
  }

  /** Decode + feature-extract over binary payloads, batched per partition —
    * the per-partition iterator is where a real codec/model is initialized
    * once and reused across the batch (never per row).
    */
  def extractMeta(media: Dataset[MediaRow],
                  withFeatures: Boolean = true): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: open codec / load model HERE, once per partition.
      // withFeatures=false skips the (expensive) feature pass — Catalyst
      // cannot prune columns out of opaque typed code, so metadata-only
      // callers must opt out explicitly.
      rows.map { r =>
        // real header parse first; the stub only catches non-media payloads
        val (fmt, w, h) = parseHeader(r.payload).getOrElse(decodeStub(r.payload))
        // real pixel decode where a JVM codec exists (PNG: PngCodec;
        // JPEG/GIF/BMP: built-in ImageIO, gated on the header so ImageIO
        // never sniffs arbitrary bytes); stub only for genuinely
        // codec-bound payloads (WebP, non-media)
        // refuse-before-allocation, two layers: the container header's
        // claimed raster pre-gates the leg here, and jpegFeatures re-checks
        // the READER's frame dims (GIF frames may exceed the logical
        // screen) before any pixel allocation — a crafted 26-byte BMP
        // claiming 20000x20000 must not drive a ~1.6 GB decode attempt
        val decodable = ImageIoFormats(fmt) &&
          w.toLong * h <= MaxDecodePixels && w > 0 && h > 0
        val feats =
          if (!withFeatures) Array.empty[Float]
          else pngFeatures(r.payload)
            .orElse(if (fmt == "webp" &&
              w.toLong * h <= MaxDecodePixels) vp8lFeatures(r.payload)
            else None)
            .orElse(if (decodable) jpegFeatures(r.payload) else None)
            .getOrElse(featuresStub(r.payload))
        MediaMeta(r.docId, r.payload.length, fmt, w, h, feats)
      }
    }
  }

  /** Deterministic frame sampling: n evenly-spaced fixed-size byte slices
    * (stand-in for video frame extraction; slicing logic is the real
    * contract, the "frame" is the stubbed part).
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int, frameSize: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.payload.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val off = if (n == 1) 0 else (i.toLong * math.max(len - frameSize, 0) / math.max(n - 1, 1)).toInt
        (r.docId, i, r.payload.slice(off, math.min(off + frameSize, len)))
      }
    }.toDF("doc_id", "frame_idx", "frame_bytes")
  }

  /** Registry entry: typed metadata over the binary corpus. Oracle-gated
    * since round 7: every fixture payload parses through the REAL header
    * parsers (the decode stub never fires on this corpus), and nBytes is
    * the crafted header's compile-time length plus the text's UTF-8 byte
    * length — all doc_id/text arithmetic DuckDB recomputes.
    */
  def multimodalMeta(s: SparkSession, d: String): DataFrame =
    extractMeta(mediaFromDocuments(s, d), withFeatures = false)
      .select(col("docId").as("doc_id"), col("nBytes").as("n_bytes"),
        col("format"), col("width"), col("height"))
      .orderBy("doc_id")

  /** Fixture adapter: documents.text wrapped in a REAL crafted media header
    * (the offline harness has no true media files, but the headers are
    * bit-valid PNG/BMP/JPEG containers), format and dimensions derived
    * deterministically from doc_id — so [[extractMeta]] exercises the real
    * parser end-to-end and reports true dimensions.
    */
  def mediaFromDocuments(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.t(s, d, "documents")
      .select(col("doc_id").as("docId"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
      .map { r =>
        val fmt = FixtureFormats((r.docId % FixtureFormats.length).toInt)
        val w = 16 + (r.docId * 7 % 2048).toInt
        val h = 16 + (r.docId * 13 % 2048).toInt
        MediaRow(r.docId, craftHeader(fmt, w, h) ++ r.payload)
      }
  }

  /** doc_id % 6 → container format in the crafted fixture — mirrored by
    * the q_multimodal_header oracle SQL, which recomputes the same mapping
    * so the real parsers' output is hash-compared against DuckDB.
    */
  private[graft] val FixtureFormats =
    Vector("png", "bmp", "jpeg", "gif", "webp", "tiff")

  /** Full-PNG fixture: every document becomes a real, fully-decodable PNG
    * (signature, IHDR, deflated+filtered IDAT, CRCs — [[PngCodec.encode]])
    * whose dimensions, channel count and pixel values are doc_id
    * arithmetic. Pixel (x, y, channel c) = base + x + y + 3c with
    * base = doc_id % 200 and dims ≤ 16 — bounded under 256, so the raster
    * never wraps and per-channel sum/min/max have the closed forms the
    * oracle recomputes. Row filters cycle `(doc_id + y) % 5`, so across
    * the corpus every unfilter branch (None/Sub/Up/Average/Paeth) is on
    * the oracle-gated path, not just unit-tested.
    */
  def pngFromDocuments(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.t(s, d, "documents")
      .select(col("doc_id").as("docId"), lit(Array.emptyByteArray).as("payload"))
      .as[MediaRow]
      .map { r =>
        val w = 4 + (r.docId * 7 % 13).toInt
        val h = 4 + (r.docId * 13 % 11).toInt
        val ch = (r.docId % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
        val base = (r.docId % 200).toInt
        val samples = new Array[Byte](w * h * ch)
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < ch) {
              samples(i) = (base + x + y + 3 * c).toByte
              i += 1
              c += 1
            }
            x += 1
          }
          y += 1
        }
        MediaRow(r.docId,
          PngCodec.encode(PngCodec.Raster(w, h, ch, samples), r.docId.toInt))
      }
  }

  /** Per-channel pixel statistics through the REAL decode path (inflate +
    * unfilter): one output row per (doc, channel). A fixture payload that
    * fails to decode emits a loud channel = -1 row — it would hash-mismatch
    * the oracle instead of silently disappearing.
    */
  def pngPixelStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pngFromDocuments(s, d)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          PngCodec.decode(r.payload) match {
            case Some(rst) =>
              val n = rst.width * rst.height
              val sums = new Array[Long](rst.channels)
              val mins = Array.fill(rst.channels)(255)
              val maxs = new Array[Int](rst.channels)
              var i = 0
              while (i < rst.samples.length) {
                val c = i % rst.channels
                val v = rst.samples(i) & 0xff
                sums(c) += v
                if (v < mins(c)) mins(c) = v
                if (v > maxs(c)) maxs(c) = v
                i += 1
              }
              (0 until rst.channels).iterator.map(c =>
                (r.docId, c, n.toLong, sums(c), mins(c), maxs(c)))
            case None =>
              Iterator.single((r.docId, -1, 0L, 0L, 0, 0))
          }
        }
      }
      .toDF("doc_id", "channel", "n_px", "px_sum", "px_min", "px_max")
      .orderBy("doc_id", "channel")
  }

  /** Full-WebP-lossless fixture: every document becomes a real VP8L
    * stream ([[Vp8lCodec.encode]] — canonical prefix codes, LSB-first bit
    * packing, RIFF container) whose pixels are doc_id arithmetic:
    * R/G/B (x, y) = base + x + y + 3c for c = 0/1/2 with base =
    * doc_id % 200 and dims ≤ 15 (bounded under 256, no wrap), alpha
    * constant 255. The closed forms mirror [[pngFromDocuments]] so the
    * oracle recomputes per-channel sum/min/max exactly.
    */
  def vp8lFromDocuments(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.t(s, d, "documents")
      .select(col("doc_id").as("docId"), lit(Array.emptyByteArray).as("payload"))
      .as[MediaRow]
      .map { r =>
        val w = 4 + (r.docId * 5 % 12).toInt
        val h = 4 + (r.docId * 11 % 9).toInt
        val base = (r.docId % 200).toInt
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = base + x + y
            px(y * w + x) = (0xff << 24) | (v << 16) | ((v + 3) << 8) | (v + 6)
            x += 1
          }
          y += 1
        }
        MediaRow(r.docId, Vp8lCodec.encode(Vp8lCodec.Argb(w, h, px)))
      }
  }

  /** Per-channel pixel statistics through the REAL VP8L decode path
    * (canonical prefix decode of every literal) — channel 0/1/2 = R/G/B,
    * 3 = alpha. Decode failure emits the loud channel = -1 row, same
    * contract as [[pngPixelStats]].
    */
  def vp8lPixelStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    vp8lFromDocuments(s, d)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          scala.util.Try(Vp8lCodec.decode(r.payload)).toOption.flatten match {
            case Some(img) =>
              val n = img.width.toLong * img.height
              val sums = new Array[Long](4)
              val mins = Array.fill(4)(255)
              val maxs = new Array[Int](4)
              img.pixels.foreach { p =>
                val ch = Array((p >>> 16) & 0xff, (p >>> 8) & 0xff,
                  p & 0xff, (p >>> 24) & 0xff)
                var c = 0
                while (c < 4) {
                  sums(c) += ch(c)
                  if (ch(c) < mins(c)) mins(c) = ch(c)
                  if (ch(c) > maxs(c)) maxs(c) = ch(c)
                  c += 1
                }
              }
              (0 until 4).iterator.map(c =>
                (r.docId, c, n, sums(c), mins(c), maxs(c)))
            case None =>
              Iterator.single((r.docId, -1, 0L, 0L, 0, 0))
          }
        }
      }
      .toDF("doc_id", "channel", "n_px", "px_sum", "px_min", "px_max")
      .orderBy("doc_id", "channel")
  }

  /** Nearest-neighbor thumbnail through the REAL decode path — the
    * "resize" leg of the multimodal toolkit (decode / feature-extract /
    * resize / frame-sample): each PNG fixture decodes (inflate +
    * unfilter), downsamples to a [[side]]×[[side]] thumbnail with the
    * exact integer index map src = (dst · src_dim) div side (floor — the
    * same op in every engine, so the DuckDB oracle replays WHICH source
    * pixels the thumbnail keeps, not just their statistics), and reports
    * per-channel sum/min/max over the thumbnail samples. Decode failure
    * emits the loud channel = -1 row ([[pngPixelStats]]'s contract).
    *
    * Scale shape: per-row mapPartitions decode (a Catalyst expression
    * genuinely doesn't fit raster work), output rows = docs × channels —
    * the thumbnail itself never leaves the executor.
    */
  def pngThumbnailStats(s: SparkSession, d: String, side: Int = 8): DataFrame = {
    import s.implicits._
    pngFromDocuments(s, d)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          PngCodec.decode(r.payload) match {
            case Some(rst) =>
              val ch = rst.channels
              val sums = new Array[Long](ch)
              val mins = Array.fill(ch)(255)
              val maxs = new Array[Int](ch)
              var dy = 0
              while (dy < side) {
                val sy = dy * rst.height / side
                var dx = 0
                while (dx < side) {
                  val sx = dx * rst.width / side
                  var c = 0
                  while (c < ch) {
                    val v = rst.samples((sy * rst.width + sx) * ch + c) & 0xff
                    sums(c) += v
                    if (v < mins(c)) mins(c) = v
                    if (v > maxs(c)) maxs(c) = v
                    c += 1
                  }
                  dx += 1
                }
                dy += 1
              }
              (0 until ch).iterator.map(c =>
                (r.docId, c, (side.toLong * side), sums(c), mins(c), maxs(c)))
            case None =>
              Iterator.single((r.docId, -1, 0L, 0L, 0, 0))
          }
        }
      }
      .toDF("doc_id", "channel", "n_px", "px_sum", "px_min", "px_max")
      .orderBy("doc_id", "channel")
  }

  /** GIF fixture: every document becomes a REAL GIF89a stream
    * ([[GifCodec.encode]] — LZW with the canonical policy, grayscale
    * palette) whose indexed pixels are doc_id arithmetic:
    * v(x, y) = base + x + y with base = doc_id % 200 and dims bounded
    * under 256 (no wrap). Dims deliberately differ from the PNG/VP8L
    * fixtures so a codec cross-wiring bug cannot cancel out.
    */
  def gifFromDocuments(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.t(s, d, "documents")
      .select(col("doc_id").as("docId"), lit(Array.emptyByteArray).as("payload"))
      .as[MediaRow]
      .map { r =>
        val w = 4 + (r.docId * 3 % 14).toInt
        val h = 4 + (r.docId * 17 % 9).toInt
        val base = (r.docId % 200).toInt
        val px = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(y * w + x) = (base + x + y).toByte; x += 1 }
          y += 1
        }
        MediaRow(r.docId, GifCodec.encode(GifCodec.Indexed(w, h, px)))
      }
  }

  /** Pixel statistics through the REAL GIF decode path (sub-block
    * reassembly + variable-width LZW): one row per doc, channel 0 (the
    * indexed plane — index == luminance under the canonical grayscale
    * palette). Decode failure emits the loud channel = -1 row
    * ([[pngPixelStats]]'s contract).
    */
  def gifPixelStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    gifFromDocuments(s, d)
      .mapPartitions { rows =>
        rows.map { r =>
          GifCodec.decode(r.payload) match {
            case Some(img) =>
              var sum = 0L
              var mn = 255
              var mx = 0
              img.pixels.foreach { b =>
                val v = b & 0xff
                sum += v
                if (v < mn) mn = v
                if (v > mx) mx = v
              }
              (r.docId, 0, img.pixels.length.toLong, sum, mn, mx)
            case None => (r.docId, -1, 0L, 0L, 0, 0)
          }
        }
      }
      .toDF("doc_id", "channel", "n_px", "px_sum", "px_min", "px_max")
      .orderBy("doc_id")
  }

  /** 64-bit average hash (aHash — the classic image-dedup perceptual
    * hash) of a decoded raster: grayscale 8×8 nearest-neighbor thumbnail
    * (integer luma (299r + 587g + 114b) div 1000 for color; the raw
    * sample for grayscale; alpha ignored), each cell strictly brighter
    * than the integer floor mean → bit (row-major bit i = dy·8 + dx).
    * Returned as two 32-bit halves (hi, lo): bit 63 as a BIGINT weight
    * would flip the sign in one engine and overflow the addition in the
    * other — two non-negative halves stay exact everywhere.
    */
  private[graft] def aHash(rst: PngCodec.Raster, side: Int = 8): (Long, Long) = {
    val grid = new Array[Int](side * side)
    var dy = 0
    while (dy < side) {
      val sy = dy * rst.height / side
      var dx = 0
      while (dx < side) {
        val sx = dx * rst.width / side
        val o = (sy * rst.width + sx) * rst.channels
        grid(dy * side + dx) =
          if (rst.channels == 1) rst.samples(o) & 0xff
          else ((rst.samples(o) & 0xff) * 299 + (rst.samples(o + 1) & 0xff) * 587
            + (rst.samples(o + 2) & 0xff) * 114) / 1000
        dx += 1
      }
      dy += 1
    }
    val mean = grid.sum / grid.length
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < grid.length) {
      if (grid(i) > mean) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo)
  }

  /** Image dedup by perceptual hash — exact-dup keep-lowest over aHash
    * identity, through the REAL decode path: visually identical images
    * (same brighter-than-mean pattern) collapse to one canonical survivor
    * regardless of brightness offset (the mean subtracts any constant
    * shift — the fixture's doc-arithmetic rasters collide exactly this
    * way across different `base` values). The hash-groupBy shape is the
    * text exact-dup scale posture: one exchange on the 64-bit key, never
    * image×image pairs; hamming-near-dup banding over the same bits would
    * reuse the simhash band machinery ([[graft.ops.TextOps]]).
    * Decode failure emits the loud (−1, −1) hash ([[pngPixelStats]]'s
    * contract).
    */
  def imageDedupPhash(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ahash_hi", "ahash_lo")
    imageHashes(s, d)
      .withColumn("canonical_id",
        org.apache.spark.sql.functions.min("doc_id").over(w))
      .withColumn("survives",
        (col("doc_id") === col("canonical_id")).cast("int"))
      .orderBy("doc_id")
  }

  /** (doc_id, ahash_hi, ahash_lo) through the real decode — the shared
    * front half of the phash dedup and the hamming near-dup. Decode
    * failures carry the loud (−1, −1) hash.
    */
  private[graft] def imageHashes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pngFromDocuments(s, d)
      .mapPartitions { rows =>
        rows.map { r =>
          PngCodec.decode(r.payload) match {
            case Some(rst) =>
              val (hi, lo) = aHash(rst)
              (r.docId, hi, lo)
            case None => (r.docId, -1L, -1L)
          }
        }
      }
      .toDF("doc_id", "ahash_hi", "ahash_lo")
  }

  /** Bit budget for the hamming near-dup: with the 64 hash bits split
    * into 4 bands of 16, any pair within this distance shares at least
    * one identical band (pigeonhole, budget = bands − 1), so the banded
    * candidate join is EXACT — the result set equals all-pairs
    * hamming ≤ budget, which is what the oracle replays.
    */
  val ImageHammingMax = 3

  /** Near-duplicate images by aHash hamming distance — the simhash
    * banding machinery over pixels: 4×16-bit band keys → equi-join
    * candidates (never image × image), exact bit_count confirm. Runs
    * over the EXACT-DUP SURVIVORS (one keep-lowest representative per
    * hash — [[imageDedupPhash]]'s canon, derived here as a groupBy):
    * identical-image clusters would otherwise quadratically inflate both
    * the banded candidates and the confirmed pairs (every 0-distance
    * pair inside a cluster) — the compose-after-exact-dedup posture
    * every near-dup family documents. Decode failures are excluded (a
    * payload that didn't decode has no visual identity to compare —
    * unlike the dedup canon, where the loud (−1,−1) group surfaces
    * them).
    */
  def imageNearDup(s: SparkSession, d: String): DataFrame = {
    // the survivor-hash frame feeds three branches (band keys + both
    // confirm sides); persisting it decodes each raster ONCE instead of
    // three times, and the frame is bounded by the hash-class count
    val hashes = PlanCache.swap("image-near-dup-hashes",
      imageHashes(s, d).filter(col("ahash_hi") >= 0)
        .groupBy("ahash_hi", "ahash_lo")
        .agg(org.apache.spark.sql.functions.min("doc_id").as("doc_id")))
    // (band index, band value) key: posexplode gives both in one pass
    val keyed = hashes.select(col("doc_id"), posexplode(array(
      col("ahash_lo") % 65536,
      expr("ahash_lo div 65536"), // integer div — `/` would go double
      col("ahash_hi") % 65536,
      expr("ahash_hi div 65536"))).as(Seq("band", "v")))
    val cands = keyed.as("x").join(keyed.as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val a = hashes.select(col("doc_id").as("id_a"),
      col("ahash_hi").as("hi_a"), col("ahash_lo").as("lo_a"))
    val b = hashes.select(col("doc_id").as("id_b"),
      col("ahash_hi").as("hi_b"), col("ahash_lo").as("lo_b"))
    cands.join(a, "id_a").join(b, "id_b")
      .withColumn("hamming",
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b")))
          + bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("int"))
      .filter(col("hamming") <= ImageHammingMax)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  final case class AvMeta(docId: Long, format: String, durationMs: Long,
                          sampleRate: Int, channels: Int)

  /** AV fixture: WAV for even doc_id (the text bytes ARE the data chunk,
    * so the parsed duration is a real size/byte-rate quotient), MP4 for
    * odd (text rides as trailing bytes the box walk never reaches). The
    * rate/timescale/duration derivations are doc_id arithmetic the
    * q_av_meta oracle recomputes.
    */
  def avFromDocuments(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.t(s, d, "documents")
      .select(col("doc_id").as("docId"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
      .map { r =>
        val header =
          if (r.docId % 2 == 0)
            craftAvHeader("wav", 8000 + r.docId * 37 % 40000,
              1 + (r.docId / 2) % 2, r.payload.length)
          else craftAvHeader("mp4", 1000 + r.docId % 9000, r.docId * 13 % 100000)
        MediaRow(r.docId, header ++ r.payload)
      }
  }

  /** Typed AV metadata over binary payloads — same per-partition batching
    * contract as [[extractMeta]].
    */
  def extractAvMeta(media: Dataset[MediaRow]): Dataset[AvMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (fmt, dur, sr, ch) =
          parseAvHeader(r.payload).getOrElse(("unknown", -1L, 0, 0))
        AvMeta(r.docId, fmt, dur, sr, ch)
      }
    }
  }

  /** Oracle-gated AV leg: real WAV/MP4 container parsing round-trips the
    * crafted fixture; DuckDB recomputes the doc_id-derived rate, channel
    * and duration values (incl. the data-size/byte-rate division).
    */
  def avMeta(s: SparkSession, d: String): DataFrame =
    extractAvMeta(avFromDocuments(s, d))
      .select(col("docId").as("doc_id"), col("format"),
        col("durationMs").as("duration_ms"),
        col("sampleRate").as("sample_rate"), col("channels"))
      .orderBy("doc_id")

  /** Oracle-gated header leg: the fixture's crafted containers round-trip
    * through the REAL byte parsers, so format/width/height are exactly the
    * doc_id-derived values the DuckDB oracle recomputes. nBytes and the
    * labeled feature stub stay in [[multimodalMeta]] (rows-only).
    */
  def multimodalHeader(s: SparkSession, d: String): DataFrame =
    extractMeta(mediaFromDocuments(s, d), withFeatures = false)
      .select(col("docId").as("doc_id"), col("format"), col("width"), col("height"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- video
  // Frame sampling from the MP4 sample tables — the video leg's primitive
  // without touching H.264: stts (decode deltas, run-length) gives every
  // sample's timestamp, stsz its byte size, stsc+stco its file offset
  // (chunk base + intra-chunk prefix sum). ISO/IEC 14496-12 box layout.

  final case class FrameRow(docId: Long, frameIdx: Long, tsMs: Long,
                            offset: Long, size: Long)

  /** Craft an MP4 with a full sample-table track:
    * ftyp + moov{mvhd, trak{mdia{mdhd, minf{stbl{stts, stsc, stsz,
    * stco}}}}}. All parameters are doc_id arithmetic the oracle
    * recomputes: n samples, two stts runs (d1 then d1+25), per-sample
    * sizes, a constant samples-per-chunk stsc, and stco offsets laid out
    * contiguously from `base`.
    */
  private[graft] def craftMp4Track(docId: Long): Array[Byte] = {
    val n = (5 + docId % 40).toInt
    val spc = (2 + docId % 3).toInt
    val tsc = (1000 + docId % 9000).toInt
    val d1 = (100 + docId % 50).toInt
    val base = (48 + docId % 64).toInt
    val run1 = (n + 1) / 2
    val sizes = (0 until n).map(i => (100 + (docId + i) % 37).toInt)
    val nChunks = (n + spc - 1) / spc
    val chunkOff = (0 until nChunks).map { c =>
      base + sizes.take(c * spc).sum
    }
    def box(typ: String, payload: java.nio.ByteBuffer): Array[Byte] = {
      val p = payload.array().take(payload.position())
      val bb = java.nio.ByteBuffer.allocate(8 + p.length)
      bb.putInt(8 + p.length).put(typ.getBytes("US-ASCII")).put(p)
      bb.array()
    }
    def fullBoxHeader(bb: java.nio.ByteBuffer): java.nio.ByteBuffer = {
      bb.putInt(0); bb // version 0 + flags
    }
    val stts = {
      val bb = fullBoxHeader(java.nio.ByteBuffer.allocate(256))
      if (run1 == n) { bb.putInt(1); bb.putInt(n).putInt(d1) }
      else {
        bb.putInt(2)
        bb.putInt(run1).putInt(d1)
        bb.putInt(n - run1).putInt(d1 + 25)
      }
      box("stts", bb)
    }
    val stsc = {
      val bb = fullBoxHeader(java.nio.ByteBuffer.allocate(32))
      bb.putInt(1) // one run: every chunk holds spc samples
      bb.putInt(1).putInt(spc).putInt(1)
      box("stsc", bb)
    }
    val stsz = {
      val bb = fullBoxHeader(java.nio.ByteBuffer.allocate(12 + 4 * n))
      bb.putInt(0).putInt(n) // per-sample sizes
      sizes.foreach(bb.putInt)
      box("stsz", bb)
    }
    val stco = {
      val bb = fullBoxHeader(java.nio.ByteBuffer.allocate(8 + 4 * nChunks))
      bb.putInt(nChunks)
      chunkOff.foreach(bb.putInt)
      box("stco", bb)
    }
    // sync-sample table: every j-th sample is a keyframe; docs with
    // docId % 5 == 0 OMIT the box — the ISO default (no stss = every
    // sample is sync) must round-trip too
    val stssOpt: Array[Byte] =
      if (docId % 5 == 0) Array.emptyByteArray
      else {
        val j = (2 + docId % 4).toInt
        val syncs = (0 until n by j).map(_ + 1) // 1-based sample numbers
        val bb = fullBoxHeader(java.nio.ByteBuffer.allocate(8 + 4 * syncs.length))
        bb.putInt(syncs.length)
        syncs.foreach(bb.putInt)
        box("stss", bb)
      }
    val stbl = {
      val payload = stts ++ stsc ++ stsz ++ stco ++ stssOpt
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put("stbl".getBytes("US-ASCII"))
        .put(payload)
      bb.array()
    }
    def wrap(typ: String, inner: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + inner.length)
      bb.putInt(8 + inner.length).put(typ.getBytes("US-ASCII")).put(inner)
      bb.array()
    }
    val mdhd = {
      val bb = fullBoxHeader(java.nio.ByteBuffer.allocate(24))
      bb.putInt(0).putInt(0) // ctime, mtime
      bb.putInt(tsc)         // media timescale — the sample-time base
      bb.putInt(0)           // duration (unused by the walk)
      box("mdhd", bb)
    }
    val minf = wrap("minf", stbl)
    val mdia = wrap("mdia", mdhd ++ minf)
    val trak = wrap("trak", mdia)
    val mvhd = {
      val bb = fullBoxHeader(java.nio.ByteBuffer.allocate(100))
      bb.putInt(0).putInt(0).putInt(tsc).putInt(0)
      box("mvhd", bb)
    }
    val moov = wrap("moov", mvhd ++ trak)
    val ftyp = {
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putInt(16).put("ftyp".getBytes("US-ASCII"))
        .put("isom".getBytes("US-ASCII")).putInt(0x200)
      bb.array()
    }
    ftyp ++ moov
  }

  /** Walk the sample tables of an MP4: media timescale (mdhd) plus every
    * sample's (decode-time units, size, file offset). The offset is the
    * real two-level derivation — stsc runs expanded against the stco
    * chunk list, intra-chunk offsets accumulated from stsz — not a layout
    * assumption. None (loud, never a guess) for a non-MP4, a truncated
    * box, or a table combination the walk can't prove consistent.
    */
  private[graft] def mp4SampleTable(p: Array[Byte])
      : Option[(Int, IndexedSeq[(Long, Int, Long, Boolean)])] = {
    def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        var i = lo
        var dead = false
        def hasNext: Boolean = !dead && i + 8 <= hi
        def next(): (String, Int, Int) = {
          val sz = be32(p, i)
          if (sz < 8 || i + sz > hi) { dead = true; ("", 0, 0) }
          else {
            val r = (new String(p.slice(i + 4, i + 8), "US-ASCII"),
              i + 8, (i + sz).toInt)
            i += sz.toInt
            r
          }
        }
      }
    if (p.length < 16 || be32(p, 0) < 8) return None
    val top = boxes(0, p.length).toSeq
    if (!top.exists(_._1 == "ftyp")) return None
    val moov = top.find(_._1 == "moov").getOrElse(return None)
    def child(range: (String, Int, Int), typ: String): Option[(String, Int, Int)] =
      boxes(range._2, range._3).find(_._1 == typ)
    val trak = child(moov, "trak").getOrElse(return None)
    val mdia = child(trak, "mdia").getOrElse(return None)
    val mdhd = child(mdia, "mdhd").getOrElse(return None)
    if (mdhd._3 - mdhd._2 < 16) return None
    // version-0 layouts only, checked EXPLICITLY on every full box the
    // walk reads fields from: a version-1 mdhd carries 64-bit times and
    // its timescale sits at +20, not +12 — reading it as v0 would yield a
    // garbage timescale silently. Loud refusal over a guess.
    def v0(box: (String, Int, Int)): Boolean = p(box._2) == 0
    if (!v0(mdhd)) return None
    val tsc = be32(p, mdhd._2 + 12).toInt
    if (tsc <= 0) return None
    val minf = child(mdia, "minf").getOrElse(return None)
    val stbl = child(minf, "stbl").getOrElse(return None)
    val stts = child(stbl, "stts").getOrElse(return None)
    val stsc = child(stbl, "stsc").getOrElse(return None)
    val stsz = child(stbl, "stsz").getOrElse(return None)
    // chunk offsets: stco (32-bit) or co64 (64-bit — files past 4 GiB,
    // the form a real 100 TB-scale video corpus actually carries)
    val stco = child(stbl, "stco").orElse(child(stbl, "co64"))
      .getOrElse(return None)
    val co64 = stco._1 == "co64"
    if (!v0(stts) || !v0(stsc) || !v0(stsz) || !v0(stco)) return None
    // stts → per-sample decode deltas. Run counts are summed against a
    // refuse-before-allocation ceiling (the codec-family contract): a
    // crafted count must be rejected BEFORE Seq.fill materializes it.
    val MaxSamples = 1 << 22
    val sttsN = be32(p, stts._2 + 4).toInt
    if (stts._2 + 8 + 8L * sttsN > stts._3) return None
    val runTotal = (0 until sttsN).foldLeft(0L) { (acc, e) =>
      acc + (be32(p, stts._2 + 8 + 8 * e).toLong & 0xffffffffL)
    }
    if (runTotal > MaxSamples) return None
    val deltas = (0 until sttsN).flatMap { e =>
      val cnt = be32(p, stts._2 + 8 + 8 * e).toInt
      val d = be32(p, stts._2 + 12 + 8 * e)
      if (cnt < 0) return None
      Seq.fill(cnt)(d)
    }
    // stsz → per-sample sizes (constant or table)
    val szConst = be32(p, stsz._2 + 4)
    val szN = be32(p, stsz._2 + 8).toInt
    if (szN != deltas.length) return None
    val sizes =
      if (szConst != 0) IndexedSeq.fill(szN)(szConst.toInt)
      else {
        if (stsz._2 + 12 + 4L * szN > stsz._3) return None
        (0 until szN).map(i => be32(p, stsz._2 + 12 + 4 * i).toInt)
      }
    // stco → chunk bases; stsc runs → samples per chunk
    val stcoN = be32(p, stco._2 + 4).toInt
    val offW = if (co64) 8 else 4
    if (stco._2 + 8 + offW.toLong * stcoN > stco._3) return None
    val chunkBase = (0 until stcoN).map { i =>
      if (co64) (be32(p, stco._2 + 8 + 8 * i) << 32) |
        be32(p, stco._2 + 12 + 8 * i)
      else be32(p, stco._2 + 8 + 4 * i)
    }
    // stss (optional): 1-based sync-sample numbers. ABSENT means every
    // sample is a sync sample (ISO 14496-12 §8.6.2) — the default must
    // not be confused with "no keyframes".
    val sync: Int => Boolean = child(stbl, "stss") match {
      case None => _ => true
      case Some(stss) =>
        if (!v0(stss)) return None
        val nSync = be32(p, stss._2 + 4).toInt
        if (stss._2 + 8 + 4L * nSync > stss._3) return None
        val nums = (0 until nSync).map(i => be32(p, stss._2 + 8 + 4 * i).toInt)
        if (nums.exists(x => x < 1)) return None
        val set = nums.map(_ - 1).toSet
        set.contains _
    }
    val stscN = be32(p, stsc._2 + 4).toInt
    if (stsc._2 + 8 + 12L * stscN > stsc._3) return None
    val runs = (0 until stscN).map { e =>
      (be32(p, stsc._2 + 8 + 12 * e).toInt,   // first_chunk (1-based)
        be32(p, stsc._2 + 12 + 12 * e).toInt) // samples_per_chunk
    }
    if (runs.isEmpty || runs.head._1 != 1) return None
    val perChunk = (1 to stcoN).map { c =>
      runs.takeWhile(_._1 <= c).lastOption.map(_._2).getOrElse(return None)
    }
    if (perChunk.sum < szN) return None
    // assemble (pts units, size, offset, sync) per sample
    val out = IndexedSeq.newBuilder[(Long, Int, Long, Boolean)]
    var sample = 0
    var pts = 0L
    var chunk = 0
    while (sample < szN) {
      var off = chunkBase(chunk)
      var inChunk = 0
      while (sample < szN && inChunk < perChunk(chunk)) {
        out += ((pts, sizes(sample), off, sync(sample)))
        pts += deltas(sample)
        off += sizes(sample)
        sample += 1
        inChunk += 1
      }
      chunk += 1
    }
    Some((tsc, out.result()))
  }

  /** Crafted video fixture: every document becomes a sample-table MP4. */
  def videoFromDocuments(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.t(s, d, "documents")
      .select(col("doc_id").as("docId"))
      .as[Long]
      .map(id => MediaRow(id, craftMp4Track(id)))
  }

  /** Deterministic every-k-th frame sampling (k = 1 + doc_id % 4) over
    * the REAL sample-table walk: per selected frame its index, media
    * timestamp in ms (integer μdiv), file offset and byte size — the
    * columns a decode stage would seek on. Per-row decode, zero
    * shuffles before the output sort; the DuckDB oracle replays the
    * run-length, prefix-sum and chunk arithmetic from the doc_id
    * formulas.
    */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    videoFromDocuments(s, d)
      .flatMap { r =>
        val k = 1 + (r.docId % 4).toInt
        mp4SampleTable(r.payload) match {
          case None => Seq(FrameRow(r.docId, -1L, -1L, -1L, -1L)) // loud
          case Some((tsc, samples)) =>
            samples.zipWithIndex.collect {
              case ((pts, sz, off, _), i) if i % k == 0 =>
                FrameRow(r.docId, i.toLong, pts * 1000L / tsc, off, sz.toLong)
            }
        }
      }
      .select(col("docId").as("doc_id"), col("frameIdx").as("frame_idx"),
        col("tsMs").as("ts_ms"), col("offset"), col("size"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Keyframe (sync-sample) extraction over the stss table — the
    * vision-training sampling primitive: decode stages seek keyframes
    * because only they decode standalone. Emits every sync sample's seek
    * columns; a container WITHOUT an stss box yields every sample (the
    * ISO default — all samples sync), never zero rows. Same per-row walk
    * and loud-refusal contract as [[frameSample]].
    */
  def keyframeSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    videoFromDocuments(s, d)
      .flatMap { r =>
        mp4SampleTable(r.payload) match {
          case None => Seq(FrameRow(r.docId, -1L, -1L, -1L, -1L)) // loud
          case Some((tsc, samples)) =>
            samples.zipWithIndex.collect {
              case ((pts, sz, off, sync), i) if sync =>
                FrameRow(r.docId, i.toLong, pts * 1000L / tsc, off, sz.toLong)
            }
        }
      }
      .select(col("docId").as("doc_id"), col("frameIdx").as("frame_idx"),
        col("tsMs").as("ts_ms"), col("offset"), col("size"))
      .orderBy("doc_id", "frame_idx")
  }
}
