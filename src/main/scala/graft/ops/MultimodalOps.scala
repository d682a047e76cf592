package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed per-partition in batches.
  *
  * Format/width/height come from REAL byte-level header parsing
  * (PNG/BMP/JPEG container layouts, no codec dependency). Two pieces remain
  * STUBS, clearly marked below: full pixel decode for payloads the header
  * parser doesn't recognize (this container has no codecs) and the feature
  * vector (real path: batched model inference). Everything else — binary
  * schema, partition batching, typed output encoders, the mapPartitions
  * shape that amortizes per-batch library init — is the real, tested scale
  * path.
  */
object MultimodalOps {

  final case class MediaRow(docId: Long, payload: Array[Byte])
  final case class MediaMeta(
      docId: Long, nBytes: Int, format: String, width: Int, height: Int,
      features: Array[Float])

  /** Real byte-level header parsing for PNG / BMP / JPEG — no codec
    * dependency, just the published container layouts. Returns
    * (format, width, height); None when the payload is not one of the
    * three (or is truncated mid-header).
    */
  private[graft] def parseHeader(p: Array[Byte]): Option[(String, Int, Int)] =
    parsePng(p).orElse(parseBmp(p)).orElse(parseJpeg(p))

  private def be32(p: Array[Byte], i: Int): Long =
    ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
      ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)

  private def le32(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)

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

  /** ==== STUB ==== deterministic fake feature vector (real path: model
    * inference batched per partition).
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
        val feats = if (withFeatures) featuresStub(r.payload) else Array.empty[Float]
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

  /** Registry entry: typed metadata over the binary corpus (rows-only
    * check — the decode stub's outputs are engine-internal, but fully
    * deterministic; see OpsPropertySpec).
    */
  def multimodalMeta(s: SparkSession, d: String): DataFrame =
    extractMeta(mediaFromDocuments(s, d), withFeatures = false)
      .select("docId", "nBytes", "format", "width", "height")
      .orderBy("docId")

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
        val fmt = (r.docId % 3) match {
          case 0 => "png"; case 1 => "bmp"; case _ => "jpeg"
        }
        val w = 16 + (r.docId * 7 % 2048).toInt
        val h = 16 + (r.docId * 13 % 2048).toInt
        MediaRow(r.docId, craftHeader(fmt, w, h) ++ r.payload)
      }
  }
}
