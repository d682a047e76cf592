package graft.oracle

import graft.OracleInputs
import graft.ops
import graft.ops._
import Ctes._

/** DuckDB oracle SQL — Multimodal family (pure move from SparkEntry.scala;
  * see SURVEY.md §2.5 for the declared query inventory).
  */
object MultimodalOracles {
  // silence the unused-import warning for fragments that need no helper
  private val _ = (OracleInputs, Ctes)

  val sql: Map[String, String] = Map(
    // MP4 frame sampling: the engine walks the REAL crafted sample
    // tables (stts run-length decode, stsz sizes, stsc×stco chunk
    // offsets); the oracle replays the same arithmetic from the fixture's
    // doc_id formulas — run-length pts, per-doc prefix-sum offsets,
    // every-k-th selection, integer ms division
    "q_frame_sample" ->
      """WITH par AS (
        |    SELECT doc_id, 5 + doc_id % 40 AS n,
        |           1000 + doc_id % 9000 AS tsc,
        |           100 + doc_id % 50 AS d1,
        |           48 + doc_id % 64 AS base,
        |           1 + doc_id % 4 AS k
        |    FROM documents
        |), s AS (
        |    SELECT doc_id, unnest(range(0, n)) AS i, n, tsc, d1, base, k
        |    FROM par
        |), e AS (
        |    SELECT *, (n + 1) // 2 AS run1,
        |           100 + ((doc_id + i) % 37) AS sz
        |    FROM s
        |), f AS (
        |    SELECT *,
        |           CASE WHEN i < run1 THEN i * d1
        |                ELSE run1 * d1 + (i - run1) * (d1 + 25) END AS pts,
        |           COALESCE(SUM(sz) OVER (PARTITION BY doc_id ORDER BY i
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) AS presum
        |    FROM e
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |       CAST(pts * 1000 // tsc AS BIGINT) AS ts_ms,
        |       CAST(base + presum AS BIGINT) AS "offset",
        |       CAST(sz AS BIGINT) AS size
        |FROM f WHERE i % k = 0 ORDER BY doc_id, frame_idx""".stripMargin,
    // keyframe extraction: the engine reads the REAL stss sync-sample
    // box (absent box = ISO default, every sample sync); the oracle
    // replays the stride rule from the fixture formulas — docs with
    // doc_id % 5 = 0 craft no stss and must yield every sample
    "q_keyframe_sample" ->
      """WITH par AS (
        |    SELECT doc_id, 5 + doc_id % 40 AS n,
        |           1000 + doc_id % 9000 AS tsc,
        |           100 + doc_id % 50 AS d1,
        |           48 + doc_id % 64 AS base,
        |           2 + doc_id % 4 AS j
        |    FROM documents
        |), s AS (
        |    SELECT doc_id, unnest(range(0, n)) AS i, n, tsc, d1, base, j
        |    FROM par
        |), e AS (
        |    SELECT *, (n + 1) // 2 AS run1,
        |           100 + ((doc_id + i) % 37) AS sz
        |    FROM s
        |), f AS (
        |    SELECT *,
        |           CASE WHEN i < run1 THEN i * d1
        |                ELSE run1 * d1 + (i - run1) * (d1 + 25) END AS pts,
        |           COALESCE(SUM(sz) OVER (PARTITION BY doc_id ORDER BY i
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) AS presum
        |    FROM e
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |       CAST(pts * 1000 // tsc AS BIGINT) AS ts_ms,
        |       CAST(base + presum AS BIGINT) AS "offset",
        |       CAST(sz AS BIGINT) AS size
        |FROM f WHERE doc_id % 5 = 0 OR i % j = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // the fixture crafts REAL container headers with doc_id-derived format
    // and dimensions; the Spark side recovers them with byte-level parsers,
    // so recomputing the derivation here hash-checks the parser round-trip
    "q_multimodal_header" ->
      """SELECT doc_id,
        |       CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
        |            WHEN 2 THEN 'jpeg' WHEN 3 THEN 'gif'
        |            WHEN 4 THEN 'webp' ELSE 'tiff' END AS format,
        |       CAST(16 + (doc_id * 7 % 2048) AS INTEGER) AS width,
        |       CAST(16 + (doc_id * 13 % 2048) AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // typed-metadata leg over the same crafted containers: nBytes is the
    // crafted header's compile-time length (per-format CASE) plus the
    // text payload's UTF-8 byte length — the decode stub never fires on
    // this fixture, so the whole projection is oracle arithmetic
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(CASE doc_id % 6 WHEN 0 THEN 24 WHEN 1 THEN 26
        |            WHEN 2 THEN 15 WHEN 3 THEN 10
        |            WHEN 4 THEN 30 ELSE 38 END
        |            + octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |       CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
        |            WHEN 2 THEN 'jpeg' WHEN 3 THEN 'gif'
        |            WHEN 4 THEN 'webp' ELSE 'tiff' END AS format,
        |       CAST(16 + (doc_id * 7 % 2048) AS INTEGER) AS width,
        |       CAST(16 + (doc_id * 13 % 2048) AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // full-PNG pixel round-trip: the engine deflates+filters a doc_id-
    // derived raster into a REAL PNG and decodes it back (Inflater + all
    // five unfilter branches); pixel (x,y,c) = base + x + y + 3c is bounded
    // under 256, so per-channel sum/min/max have these closed forms — any
    // unfilter or inflate defect breaks the sums
    "q_png_pixel_stats" ->
      """WITH d AS (
        |    SELECT doc_id,
        |           4 + (doc_id * 7 % 13) AS w,
        |           4 + (doc_id * 13 % 11) AS h,
        |           CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS nch,
        |           doc_id % 200 AS base
        |    FROM documents
        |), ch AS (SELECT unnest([0, 1, 2, 3]) AS c)
        |SELECT doc_id, CAST(c AS INTEGER) AS channel,
        |       CAST(w * h AS BIGINT) AS n_px,
        |       CAST(w * h * (base + 3 * c)
        |            + h * (w * (w - 1) // 2)
        |            + w * (h * (h - 1) // 2) AS BIGINT) AS px_sum,
        |       CAST(base + 3 * c AS INTEGER) AS px_min,
        |       CAST(base + 3 * c + (w - 1) + (h - 1) AS INTEGER) AS px_max
        |FROM d JOIN ch ON c < nch
        |ORDER BY doc_id, channel""".stripMargin,
    // nearest-neighbor resize through the REAL decode: the oracle
    // enumerates the 8×8 destination grid and replays the exact integer
    // index map src = (dst · src_dim) // 8 — a resize that picked
    // different source pixels (round instead of floor, off-by-one grid)
    // hash-mismatches even when coarse statistics survive
    "q_image_resize_stats" ->
      """WITH d AS (
        |    SELECT doc_id,
        |           4 + (doc_id * 7 % 13) AS w,
        |           4 + (doc_id * 13 % 11) AS h,
        |           CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS nch,
        |           doc_id % 200 AS base
        |    FROM documents
        |), g AS (SELECT unnest(range(0, 8)) AS dx),
        |gy AS (SELECT unnest(range(0, 8)) AS dy),
        |ch AS (SELECT unnest([0, 1, 2, 3]) AS c),
        |px AS (
        |    SELECT d.doc_id, c,
        |           d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8 + 3 * c AS v
        |    FROM d, g, gy, ch
        |    WHERE c < d.nch
        |)
        |SELECT doc_id, CAST(c AS INTEGER) AS channel,
        |       CAST(64 AS BIGINT) AS n_px,
        |       CAST(SUM(v) AS BIGINT) AS px_sum,
        |       CAST(MIN(v) AS INTEGER) AS px_min,
        |       CAST(MAX(v) AS INTEGER) AS px_max
        |FROM px GROUP BY doc_id, c
        |ORDER BY doc_id, channel""".stripMargin,
    // audio feature-extract over the REAL PCM path: the WAV data chunk is
    // the text's UTF-8 bytes by construction, so the oracle re-derives
    // every signed 16-bit LE sample from a hex-digit fold over
    // encode(text) and replays energy/peak/zero-crossings exactly
    "q_audio_features" ->
      """WITH w AS (
        |    SELECT doc_id, hex(encode(text)) AS hx,
        |           octet_length(encode(text)) AS nb
        |    FROM documents WHERE doc_id % 2 = 0
        |), b AS (
        |    SELECT doc_id,
        |           list_transform(range(1, nb + 1), i ->
        |             (strpos('0123456789ABCDEF',
        |                     substr(hx, CAST(2*i-1 AS INTEGER), 1)) - 1) * 16
        |             + (strpos('0123456789ABCDEF',
        |                       substr(hx, CAST(2*i AS INTEGER), 1)) - 1)) AS bytes
        |    FROM w
        |), s AS (
        |    SELECT doc_id,
        |           list_transform(range(1, len(bytes) // 2 + 1), i ->
        |             CASE WHEN bytes[2*i-1] + 256 * bytes[2*i] >= 32768
        |                  THEN bytes[2*i-1] + 256 * bytes[2*i] - 65536
        |                  ELSE bytes[2*i-1] + 256 * bytes[2*i] END) AS smp
        |    FROM b
        |)
        |SELECT doc_id,
        |       CAST(len(smp) AS BIGINT) AS n_samples,
        |       CAST(list_reduce(
        |              list_prepend(0, list_transform(smp, x -> x * x)),
        |              (a, b) -> a + b) AS BIGINT) AS sq_sum,
        |       CAST(COALESCE(list_max(list_transform(smp, x -> abs(x))), 0)
        |            AS INTEGER) AS peak,
        |       CAST(list_reduce(
        |              list_prepend(0, list_transform(range(2, len(smp) + 1),
        |                i -> CASE WHEN smp[i-1] * smp[i] < 0 THEN 1 ELSE 0 END)),
        |              (a, b) -> a + b) AS BIGINT) AS zero_cross
        |FROM s ORDER BY doc_id""".stripMargin,
    // perceptual-hash image dedup: the oracle replays the whole aHash —
    // thumbnail index map, integer luma, floor mean, strict
    // brighter-than-mean bits as two 32-bit halves — then the keep-lowest
    // canon; doc-arithmetic rasters collide across brightness offsets, so
    // the survivor set is a REAL dedup, not a per-doc identity
    "q_image_dedup_phash" ->
      """WITH d AS (
        |    SELECT doc_id,
        |           4 + (doc_id * 7 % 13) AS w,
        |           4 + (doc_id * 13 % 11) AS h,
        |           CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS nch,
        |           doc_id % 200 AS base
        |    FROM documents
        |), g AS (SELECT unnest(range(0, 8)) AS dx),
        |gy AS (SELECT unnest(range(0, 8)) AS dy),
        |cell AS (
        |    SELECT d.doc_id, gy.dy * 8 + g.dx AS i,
        |           CASE WHEN d.nch = 1
        |                THEN d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8
        |                ELSE ((d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8) * 299
        |                      + (d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8 + 3) * 587
        |                      + (d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8 + 6) * 114)
        |                     // 1000
        |           END AS v
        |    FROM d, g, gy
        |), m AS (
        |    SELECT doc_id, SUM(v) // 64 AS mean FROM cell GROUP BY doc_id
        |), bits AS (
        |    SELECT c.doc_id,
        |           CAST(SUM(CASE WHEN c.v > m.mean AND c.i >= 32
        |                         THEN CAST(1 AS BIGINT) << (c.i - 32)
        |                         ELSE 0 END) AS BIGINT) AS ahash_hi,
        |           CAST(SUM(CASE WHEN c.v > m.mean AND c.i < 32
        |                         THEN CAST(1 AS BIGINT) << c.i
        |                         ELSE 0 END) AS BIGINT) AS ahash_lo
        |    FROM cell c JOIN m USING (doc_id)
        |    GROUP BY c.doc_id
        |)
        |SELECT doc_id, ahash_hi, ahash_lo,
        |       MIN(doc_id) OVER (PARTITION BY ahash_hi, ahash_lo)
        |           AS canonical_id,
        |       CAST(CASE WHEN doc_id = MIN(doc_id)
        |                      OVER (PARTITION BY ahash_hi, ahash_lo)
        |            THEN 1 ELSE 0 END AS INTEGER) AS survives
        |FROM bits ORDER BY doc_id""".stripMargin,
    // full-GIF round-trip: the engine LZW-encodes a doc_id-derived
    // indexed raster into a REAL GIF89a stream and decodes it back;
    // v(x,y) = base + x + y bounded under 256, so the oracle's closed
    // forms replay sum/min/max exactly — any sub-block or code-width
    // defect breaks the sums
    "q_gif_pixel_stats" ->
      """WITH d AS (
        |    SELECT doc_id,
        |           4 + (doc_id * 3 % 14) AS w,
        |           4 + (doc_id * 17 % 9) AS h,
        |           doc_id % 200 AS base
        |    FROM documents
        |)
        |SELECT doc_id, CAST(0 AS INTEGER) AS channel,
        |       CAST(w * h AS BIGINT) AS n_px,
        |       CAST(w * h * base
        |            + h * (w * (w - 1) // 2)
        |            + w * (h * (h - 1) // 2) AS BIGINT) AS px_sum,
        |       CAST(base AS INTEGER) AS px_min,
        |       CAST(base + (w - 1) + (h - 1) AS INTEGER) AS px_max
        |FROM d ORDER BY doc_id""".stripMargin,
    // banded aHash near-dup: the engine's 4×16-bit band join + confirm is
    // EXACT at budget 3 (pigeonhole: ≤ 3 differing bits leave a band
    // identical), so the oracle replays clean all-pairs hamming — the
    // banding must change nothing, only the join volume
    "q_image_near_dup" ->
      s"""WITH d AS (
        |    SELECT doc_id,
        |           4 + (doc_id * 7 % 13) AS w,
        |           4 + (doc_id * 13 % 11) AS h,
        |           CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS nch,
        |           doc_id % 200 AS base
        |    FROM documents
        |), g AS (SELECT unnest(range(0, 8)) AS dx),
        |gy AS (SELECT unnest(range(0, 8)) AS dy),
        |cell AS (
        |    SELECT d.doc_id, gy.dy * 8 + g.dx AS i,
        |           CASE WHEN d.nch = 1
        |                THEN d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8
        |                ELSE ((d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8) * 299
        |                      + (d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8 + 3) * 587
        |                      + (d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8 + 6) * 114)
        |                     // 1000
        |           END AS v
        |    FROM d, g, gy
        |), m AS (
        |    SELECT doc_id, SUM(v) // 64 AS mean FROM cell GROUP BY doc_id
        |), bits AS (
        |    SELECT c.doc_id,
        |           CAST(SUM(CASE WHEN c.v > m.mean AND c.i >= 32
        |                         THEN CAST(1 AS BIGINT) << (c.i - 32)
        |                         ELSE 0 END) AS BIGINT) AS hi,
        |           CAST(SUM(CASE WHEN c.v > m.mean AND c.i < 32
        |                         THEN CAST(1 AS BIGINT) << c.i
        |                         ELSE 0 END) AS BIGINT) AS lo
        |    FROM cell c JOIN m USING (doc_id)
        |    GROUP BY c.doc_id
        |), surv AS (
        |    SELECT MIN(doc_id) AS doc_id, hi, lo FROM bits GROUP BY hi, lo
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.hi, b.hi))
        |            + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming
        |FROM surv a JOIN surv b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
        |      <= ${ops.MultimodalOps.ImageHammingMax}
        |ORDER BY id_a, id_b""".stripMargin,
    // full-VP8L round-trip: the engine entropy-encodes a doc_id-derived
    // ARGB raster into a REAL WebP-lossless stream (canonical prefix
    // codes, LSB-first bit packing) and decodes it back; R/G/B (x,y) =
    // base + x + y + 3c bounded under 256, alpha constant 255 — any
    // bit-packing or prefix-decode defect breaks the sums
    "q_vp8l_pixel_stats" ->
      """WITH d AS (
        |    SELECT doc_id,
        |           4 + (doc_id * 5 % 12) AS w,
        |           4 + (doc_id * 11 % 9) AS h,
        |           doc_id % 200 AS base
        |    FROM documents
        |), ch AS (SELECT unnest([0, 1, 2, 3]) AS c)
        |SELECT doc_id, CAST(c AS INTEGER) AS channel,
        |       CAST(w * h AS BIGINT) AS n_px,
        |       CAST(CASE WHEN c = 3 THEN w * h * 255
        |            ELSE w * h * (base + 3 * c)
        |                 + h * (w * (w - 1) // 2)
        |                 + w * (h * (h - 1) // 2) END AS BIGINT) AS px_sum,
        |       CAST(CASE WHEN c = 3 THEN 255
        |            ELSE base + 3 * c END AS INTEGER) AS px_min,
        |       CAST(CASE WHEN c = 3 THEN 255
        |            ELSE base + 3 * c + (w - 1) + (h - 1) END AS INTEGER)
        |         AS px_max
        |FROM d JOIN ch ON true
        |ORDER BY doc_id, channel""".stripMargin,
    // WAV/MP4 fixture round-trip: the Spark side PARSES the crafted
    // containers (data-size/byte-rate division for WAV duration); the
    // oracle recomputes the doc_id derivations directly
    "q_av_meta" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'mp4' END AS format,
        |       CAST(CASE WHEN doc_id % 2 = 0
        |            THEN octet_length(CAST(text AS BLOB)) * 1000
        |                 // ((8000 + doc_id * 37 % 40000)
        |                    * (1 + (doc_id // 2) % 2) * 2)
        |            ELSE (doc_id * 13 % 100000) * 1000
        |                 // (1000 + doc_id % 9000)
        |       END AS BIGINT) AS duration_ms,
        |       CAST(CASE WHEN doc_id % 2 = 0
        |            THEN 8000 + doc_id * 37 % 40000 ELSE 0
        |       END AS INTEGER) AS sample_rate,
        |       CAST(CASE WHEN doc_id % 2 = 0
        |            THEN 1 + (doc_id // 2) % 2 ELSE 0
        |       END AS INTEGER) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,
    // content-defined chunking: the oracle replays the rolling window
    // hash (the q_doc_fingerprint polynomial), the mod-residue cut rule,
    // the boundary segmentation and the >=2-docs chunk-hash dedup
    "q_cdc_chunks" -> (cdcCtes +
      """
        |, dh AS (
        |    SELECT DISTINCT doc_id, md5(chunk) AS h FROM cchunks
        |), ddup AS (
        |    SELECT h FROM dh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
        |), nck AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
        |    FROM cchunks GROUP BY doc_id
        |), ndp AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_chunks
        |    FROM dh WHERE h IN (SELECT h FROM ddup) GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |       CAST(COALESCE(nck.n_chunks, 0) AS BIGINT) AS n_chunks,
        |       CAST(COALESCE(ndp.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks
        |FROM documents d
        |LEFT JOIN nck USING (doc_id) LEFT JOIN ndp USING (doc_id)
        |ORDER BY doc_id""".stripMargin),
    // output-corpus form: globally-first chunk occurrences survive, later
    // ones excise to chr(9247) (U+241F — the substring-dedup marker), and
    // the rewritten text is hash-compared cell-for-cell
    "q_cdc_dedup_rewrite" -> (cdcCtes +
      """
        |, crnk AS (
        |    SELECT doc_id, chunk_pos, chunk,
        |           row_number() OVER (PARTITION BY chunk
        |               ORDER BY doc_id, chunk_pos) AS rnk
        |    FROM cchunks
        |), crw AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |           CAST(SUM(CASE WHEN rnk > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |               AS n_excised,
        |           string_agg(CASE WHEN rnk = 1 THEN chunk
        |                           ELSE chr(9247) END, ''
        |                      ORDER BY chunk_pos) AS text_dedup
        |    FROM crnk GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |       CAST(COALESCE(crw.n_chunks, 0) AS BIGINT) AS n_chunks,
        |       CAST(COALESCE(crw.n_excised, 0) AS BIGINT) AS n_excised,
        |       COALESCE(crw.text_dedup, '') AS text_dedup
        |FROM documents d LEFT JOIN crw USING (doc_id)
        |ORDER BY doc_id""".stripMargin),
    // incremental rewrite: the FRESH full-union rewrite restricted to the
    // append-only batch split — a green row proves the persisted
    // chunk-index path lands bit-equal (the substring-incremental gate
    // style)
    "q_cdc_rewrite_incremental" -> (cdcCtes +
      """
        |, crnk AS (
        |    SELECT doc_id, chunk_pos, chunk,
        |           row_number() OVER (PARTITION BY chunk
        |               ORDER BY doc_id, chunk_pos) AS rnk
        |    FROM cchunks
        |), crw AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |           CAST(SUM(CASE WHEN rnk > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |               AS n_excised,
        |           string_agg(CASE WHEN rnk = 1 THEN chunk
        |                           ELSE chr(9247) END, ''
        |                      ORDER BY chunk_pos) AS text_dedup
        |    FROM crnk GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |       CAST(COALESCE(crw.n_chunks, 0) AS BIGINT) AS n_chunks,
        |       CAST(COALESCE(crw.n_excised, 0) AS BIGINT) AS n_excised,
        |       COALESCE(crw.text_dedup, '') AS text_dedup
        |FROM documents d LEFT JOIN crw USING (doc_id)
        |WHERE d.doc_id * 3 >= (SELECT MAX(doc_id) * 2 FROM documents)
        |ORDER BY doc_id""".stripMargin),
    // Winnowing (MOSS): per window of W gram hashes select the min,
    // rightmost on ties — one struct-min window pass, replayed
    // cell-for-cell (md5-prefix hex strings order like the numbers).
    "q_winnow_fingerprint" ->
      s"""$winnowSelCte
        |SELECT doc_id, pos, h FROM sel ORDER BY doc_id, pos""".stripMargin,
    "q_copy_candidates" ->
      s"""$winnowSelCte, dh AS (
        |    SELECT DISTINCT doc_id, h FROM sel
        |), cnt AS (
        |    SELECT h, count(*) AS nd FROM dh GROUP BY 1
        |), pruned AS (
        |    SELECT dh.doc_id, dh.h FROM dh JOIN cnt USING (h)
        |    WHERE cnt.nd <= ${graft.ops.WinnowOps.MaxDocsPerPrint}
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM pruned a JOIN pruned b ON a.h = b.h AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) >= ${graft.ops.WinnowOps.MinShared}
        |ORDER BY doc_a, doc_b""".stripMargin,
    // RAG windows: overlapping fixed-token chunks, last-window-short rule.
    "q_rag_chunks" ->
      s"""WITH tok AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
        |    FROM documents WHERE trim(text) <> ''
        |), k AS (
        |    SELECT doc_id, tokens, CAST(len(tokens) AS BIGINT) AS n,
        |           CASE WHEN len(tokens) <= ${graft.ops.ChunkOps.RagChunkSize}
        |                THEN 1
        |                ELSE 1 + (len(tokens) - ${graft.ops.ChunkOps.RagChunkSize}
        |                          + ${graft.ops.ChunkOps.RagStride - 1})
        |                         // ${graft.ops.ChunkOps.RagStride} END AS nk
        |    FROM tok
        |), c AS (
        |    SELECT doc_id, n, tokens,
        |           unnest(range(0, nk)) AS chunk_idx
        |    FROM k
        |)
        |SELECT doc_id, chunk_idx,
        |       least(${graft.ops.ChunkOps.RagChunkSize},
        |             n - chunk_idx * ${graft.ops.ChunkOps.RagStride}) AS n_tokens,
        |       array_to_string(tokens[
        |           1 + chunk_idx * ${graft.ops.ChunkOps.RagStride} :
        |           chunk_idx * ${graft.ops.ChunkOps.RagStride}
        |               + ${graft.ops.ChunkOps.RagChunkSize}], ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // Incremental winnowing probe vs the FRESH full-corpus run restricted
    // to batch-involving pairs (split: doc_id*3 >= 2*max).
    "q_copy_incremental" ->
      s"""$winnowSelCte, dh AS (
        |    SELECT DISTINCT doc_id, h FROM sel
        |), cnt AS (
        |    SELECT h, count(*) AS nd FROM dh GROUP BY 1
        |), pruned AS (
        |    SELECT dh.doc_id, dh.h FROM dh JOIN cnt USING (h)
        |    WHERE cnt.nd <= ${graft.ops.WinnowOps.MaxDocsPerPrint}
        |), mx AS (
        |    SELECT max(doc_id) AS m FROM documents
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM pruned a JOIN pruned b ON a.h = b.h AND a.doc_id < b.doc_id, mx
        |WHERE a.doc_id * 3 >= mx.m * 2 OR b.doc_id * 3 >= mx.m * 2
        |GROUP BY 1, 2
        |HAVING count(*) >= ${graft.ops.WinnowOps.MinShared}
        |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
