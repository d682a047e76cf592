package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE piece application (graft.ops.BpeOps' serve fold) —
  * `bpe_pieces(text, merges)` returns the space-joined post-merge pieces
  * of every whitespace word of `text`, bit-identical to the SQL
  * higher-order-function formulation it replaces:
  *
  *   concat_ws(' ', transform(split(trim(text), '\s+'), w ->
  *     CASE WHEN char_length(w) = 0 THEN '' ELSE
  *       strip(aggregate(merges, wrap(w), (acc, m) ->
  *         replace(acc, m.pat, m.rep))) END))
  *
  * where `wrap(w)` wraps every CODE POINT as chr(2)·c·chr(3) and `strip`
  * turns the chr(3)chr(2) symbol boundary into a space and drops the
  * sentinels. `merges` must be a FOLDABLE array<struct<pat,rep>> (the
  * K-row merge table is bounded driver metadata by the stored-model
  * contract); it is parsed once per plan, not per row.
  *
  * Why native (r15, guide §4 — the CdcChunks posture): the HOF
  * formulation evaluates an interpreted transform→aggregate→replace-chain
  * lambda per word, and `wrap`'s `substring(w, i, 1)` per position is
  * O(len²) on UTF8String (each call re-scans from the head). This is one
  * flat Java loop per row — wrap is a single code-point pass, the K merge
  * replaces are literal String.replace calls (the same left-to-right
  * non-overlapping semantics as SQL replace) — behind a static call
  * inside whole-stage codegen. Equivalence is law-tested against the HOF
  * expression in BpeOpsSpec (empty/multi-space/tab/CJK/surrogate-pair/
  * sentinel-containing inputs).
  *
  * Parity notes (all law-tested):
  *   - trim strips ASCII space (0x20) only, like SQL trim;
  *   - split keeps leading/trailing empty words (Spark's split uses
  *     limit -1), each contributing an empty position the space-join
  *     preserves;
  *   - NULL text propagates NULL here; [[graft.ops.BpeOps.applyBpe]]
  *     coalesces to '' at the call site, which is what the SQL form's
  *     concat_ws-over-null-array yielded.
  */
case class BpePieces(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StructType(fields), _))
          if fields.length == 2 &&
            fields.forall(_.dataType == StringType) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "bpe_pieces requires a foldable merge array (the stored merge " +
            "table is bounded driver metadata)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_pieces requires (STRING, ARRAY<STRUCT<pat STRING, rep " +
          s"STRING>>), got (${l.simpleString(40)}, ${r.simpleString(40)})")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_pieces"

  /** The merge list, parsed ONCE from the foldable child. */
  @transient private lazy val merges: BpePieces.Merges = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    val n = if (ad == null) 0 else ad.numElements()
    val pats = new Array[String](n)
    val reps = new Array[String](n)
    var i = 0
    while (i < n) {
      val row = ad.getStruct(i, 2)
      pats(i) = row.getUTF8String(0).toString
      reps(i) = row.getUTF8String(1).toString
      i += 1
    }
    new BpePieces.Merges(pats, reps)
  }

  override def nullSafeEval(t: Any, mIgnored: Any): Any =
    BpePieces.compute(t.asInstanceOf[UTF8String], merges)

  // one static call inside whole-stage codegen; the parsed merge list
  // rides along as a reference object (CdcChunks posture). The second
  // child is a foldable literal — its generated value is ignored.
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMerges", merges,
      classOf[BpePieces.Merges].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.BpePieces.compute($t, $m);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpePieces =
    copy(left = newLeft, right = newRight)
}

object BpePieces {

  /** Parsed merge table — a plain serializable holder the generated code
    * references.
    */
  final class Merges(val pats: Array[String], val reps: Array[String])
    extends Serializable

  val info = new ExpressionInfo(
    classOf[BpePieces].getName, null, "bpe_pieces",
    "_FUNC_(str, merges) - space-joined BPE pieces of every whitespace " +
      "word of str after applying the (pat, rep) merge list in order.",
    "")

  private val WS = java.util.regex.Pattern.compile("\\s+")
  private final val Open = '\u0002'
  private final val Close = '\u0003'

  /** The whole fold for one row. */
  def compute(text: UTF8String, m: Merges): UTF8String = {
    val raw = text.toString
    // SQL trim: ASCII space (0x20) only
    var from = 0
    var to = raw.length
    while (from < to && raw.charAt(from) == ' ') from += 1
    while (to > from && raw.charAt(to - 1) == ' ') to -= 1
    val t = raw.substring(from, to)
    // Spark's split uses limit -1: trailing empty words are KEPT
    val words = WS.split(t, -1)
    val sb = new java.lang.StringBuilder(t.length * 2)
    val pats = m.pats
    val reps = m.reps
    var wi = 0
    while (wi < words.length) {
      if (wi > 0) sb.append(' ')
      val w = words(wi)
      if (!w.isEmpty) {
        // wrap every code point as chr(2)·c·chr(3) — one pass
        val wb = new java.lang.StringBuilder(w.length * 3)
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          wb.append(Open).appendCodePoint(cp).append(Close)
          i += Character.charCount(cp)
        }
        var acc = wb.toString
        var mi = 0
        while (mi < pats.length) {
          acc = acc.replace(pats(mi), reps(mi))
          mi += 1
        }
        // strip: chr(3)chr(2) boundary → space, drop lone sentinels —
        // single pass, equivalent to the SQL replace chain because the
        // boundary pattern is 2 chars and its replacement contains no
        // sentinel characters
        val n = acc.length
        var j = 0
        while (j < n) {
          val c = acc.charAt(j)
          if (c == Close && j + 1 < n && acc.charAt(j + 1) == Open) {
            sb.append(' '); j += 2
          } else if (c == Open || c == Close) j += 1
          else { sb.append(c); j += 1 }
        }
      }
      wi += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
