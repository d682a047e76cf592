package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed per-partition in batches.
  *
  * The decode step is a STUB (this container has no image/audio codecs): a
  * deterministic fake derived from the payload bytes, clearly marked below.
  * Everything around it — binary schema, partition batching, typed output
  * encoders, the mapPartitions shape that amortizes per-batch library init —
  * is the real, tested scale path. Swapping `decodeStub` for a JNI/codec
  * call is a one-function change; partitioning and schema are already right.
  */
object MultimodalOps {

  final case class MediaRow(docId: Long, payload: Array[Byte])
  final case class MediaMeta(
      docId: Long, nBytes: Int, format: String, width: Int, height: Int,
      features: Array[Float])

  /** ==== STUB ==== deterministic fake decode. A real implementation opens
    * the codec once per partition and decodes each payload; this derives
    * stable pseudo-metadata from the bytes so plumbing is testable.
    */
  private[ops] def decodeStub(payload: Array[Byte]): (String, Int, Int) = {
    val h = payload.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
    val fmt = (h % 3).toInt match {
      case 0 => "png"; case 1 => "jpeg"; case _ => "webp"
    }
    (fmt, 64 + math.abs(h % 1024).toInt, 64 + math.abs((h / 1024) % 1024).toInt)
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
        val (fmt, w, h) = decodeStub(r.payload)
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

  /** Fixture adapter: documents.text as the opaque payload (the offline
    * harness has no true media files).
    */
  def mediaFromDocuments(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.t(s, d, "documents")
      .select(col("doc_id").as("docId"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }
}
