package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Aho-Corasick multi-pattern span scan (Aho & Corasick 1975) —
  * every occurrence of every blocklist term in ONE pass over the
  * document's UTF-8 bytes, regardless of how many terms the list holds.
  * The scalable alternative to a regex alternation (whose NFA cost grows
  * with the pattern count) and to a per-term `locate` join (corpus ×
  * terms work): at 100 TB the corpus is read once, the automaton rides
  * along as a broadcast-sized binary blob, and matching is O(bytes +
  * matches) per row inside whole-stage codegen.
  *
  * `ac_scan(blob, text)` returns ARRAY<BIGINT> of packed matches,
  * `(start_pos << 20) | term_id` — start_pos is the 1-BASED BYTE offset
  * in the UTF-8 encoding (equal to the character offset for ASCII text;
  * the byte-offset contract is deliberate: UTF8String scans bytes, never
  * decoding). Matches arrive ordered by END position (the scan order),
  * ties ordered by term_id (per-state output lists are sorted at compile
  * time); overlapping and nested matches are ALL reported — "table"
  * yields both "table" and "able" when both are terms (the dictionary
  * suffix links at work).
  *
  * The blob is built driver-side by [[AcScan.compile]] from the bounded
  * blocklist (the bloom-build posture — the TERM LIST is driver-bounded,
  * never the corpus) as a fully-resolved byte-class DFA: fail links are
  * collapsed at compile time, so the scan does one table lookup per byte
  * with no fail-chain walking; bytes outside the patterns' alphabet
  * reset to the root through a 256-entry class table instead of
  * dilating the transition matrix.
  */
case class AcScan(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ac_scan requires (BINARY, STRING), got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ac_scan"

  override def nullSafeEval(blobAny: Any, textAny: Any): Any =
    AcScan.scan(blobAny.asInstanceOf[Array[Byte]],
      textAny.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (blob, text) =>
      s"${ev.value} = graft.functions.AcScan.scan($blob, $text);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AcScan =
    copy(left = newLeft, right = newRight)
}

object AcScan {

  /** Packed-match shift: low 20 bits term_id, high bits 1-based start. */
  val PosShift = 20
  val TermMask: Long = (1L << PosShift) - 1

  private val HeaderBytes = 8 + 256 // nStates, alpha, byte-class table

  /** Compile a term list into the serialized DFA blob. Driver-side and
    * bounded by the TERM volume (Σ|term| states × alphabet ints) — the
    * corpus never enters. Terms must be non-empty and fewer than 2^20.
    */
  def compile(terms: Seq[String]): Array[Byte] = {
    require(terms.nonEmpty, "ac_scan: empty term list")
    require(terms.size < (1 << PosShift), "ac_scan: term_id must fit 20 bits")
    val pats = terms.map(_.getBytes("UTF-8"))
    require(pats.forall(_.nonEmpty), "ac_scan: empty term")
    // trie over raw bytes (build-time only; the blob stores classes)
    val maxNodes = pats.map(_.length).sum + 1
    val children = Array.fill(maxNodes, 256)(-1)
    val termAt = Array.fill(maxNodes)(List.empty[Int])
    var nStates = 1
    for ((p, tid) <- pats.zipWithIndex) {
      var s = 0
      for (b <- p) {
        val bi = b & 0xff
        if (children(s)(bi) == -1) { children(s)(bi) = nStates; nStates += 1 }
        s = children(s)(bi)
      }
      termAt(s) ::= tid
    }
    // byte-class alphabet: only pattern bytes get a class
    val classTable = new Array[Byte](256)
    var alpha = 0
    for (p <- pats; b <- p) {
      val bi = b & 0xff
      if (classTable(bi) == 0) { alpha += 1; classTable(bi) = alpha.toByte }
    }
    // BFS: fail links collapsed into a complete DFA (dfa(s)(b) total)
    val fail = new Array[Int](nStates)
    val dfa = Array.ofDim[Int](nStates, 256)
    val out = Array.fill(nStates)(List.empty[Int])
    val queue = scala.collection.mutable.Queue[Int]()
    for (bi <- 0 until 256) {
      val c = children(0)(bi)
      if (c >= 0) { fail(c) = 0; dfa(0)(bi) = c; queue += c }
      else dfa(0)(bi) = 0
    }
    out(0) = termAt(0)
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = termAt(s) ::: out(fail(s)) // fail(s) is shallower: complete
      for (bi <- 0 until 256) {
        val c = children(s)(bi)
        if (c >= 0) { fail(c) = dfa(fail(s))(bi); dfa(s)(bi) = c; queue += c }
        else dfa(s)(bi) = dfa(fail(s))(bi)
      }
    }
    // serialize: header, class-compressed transitions, match offsets,
    // (termLen, termId) entries sorted by term_id per state
    val classByte = new Array[Int](alpha + 1)
    for (bi <- 0 until 256; c = classTable(bi) & 0xff; if c > 0)
      classByte(c) = bi
    val sortedOut = out.map(_.sorted)
    val nEntries = sortedOut.map(_.size).sum
    val blob = new Array[Byte](HeaderBytes + 4 * nStates * alpha
      + 4 * (nStates + 1) + 8 * nEntries)
    def putInt(off: Int, v: Int): Unit = {
      blob(off) = (v >>> 24).toByte; blob(off + 1) = (v >>> 16).toByte
      blob(off + 2) = (v >>> 8).toByte; blob(off + 3) = v.toByte
    }
    putInt(0, nStates); putInt(4, alpha)
    System.arraycopy(classTable, 0, blob, 8, 256)
    val transBase = HeaderBytes
    for (s <- 0 until nStates; c <- 1 to alpha)
      putInt(transBase + 4 * (s * alpha + c - 1), dfa(s)(classByte(c)))
    val offBase = transBase + 4 * nStates * alpha
    val entBase = offBase + 4 * (nStates + 1)
    var e = 0
    for (s <- 0 until nStates) {
      putInt(offBase + 4 * s, e)
      for (tid <- sortedOut(s)) {
        val packed = (pats(tid).length.toLong << 32) | tid.toLong
        var i = 0
        while (i < 8) {
          blob(entBase + 8 * e + i) = (packed >>> (56 - 8 * i)).toByte
          i += 1
        }
        e += 1
      }
    }
    putInt(offBase + 4 * nStates, e)
    blob
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Shared by interpreted eval and codegen: one DFA step per byte, one
    * packed long per match.
    */
  def scan(blob: Array[Byte], text: UTF8String): ArrayData = {
    if (blob.length < HeaderBytes) return new GenericArrayData(Array.empty[Long])
    val nStates = readInt(blob, 0)
    val alpha = readInt(blob, 4)
    val transBase = HeaderBytes
    val offBase = transBase + 4 * nStates * alpha
    val entBase = offBase + 4 * (nStates + 1)
    val bytes = text.getBytes
    var state = 0
    var matches: Array[Long] = new Array[Long](8)
    var nMatches = 0
    var i = 0
    while (i < bytes.length) {
      val cls = blob(8 + (bytes(i) & 0xff)) & 0xff
      state = if (cls == 0) 0
        else readInt(blob, transBase + 4 * (state * alpha + cls - 1))
      var e = readInt(blob, offBase + 4 * state)
      val end = readInt(blob, offBase + 4 * (state + 1))
      while (e < end) {
        val termLen = readInt(blob, entBase + 8 * e)
        val termId = readInt(blob, entBase + 8 * e + 4)
        if (nMatches == matches.length)
          matches = java.util.Arrays.copyOf(matches, nMatches * 2)
        matches(nMatches) = ((i + 2 - termLen).toLong << PosShift) | termId.toLong
        nMatches += 1
        e += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(matches, nMatches))
  }

  val info = new ExpressionInfo(
    classOf[AcScan].getName, null, "ac_scan",
    "_FUNC_(blob, str) - all blocklist-term occurrences as packed (start_byte_pos << 20 | term_id) longs, end-position scan order.",
    "")
}
