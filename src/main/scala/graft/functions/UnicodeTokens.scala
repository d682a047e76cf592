package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-aware word tokenization (UAX#29 word boundaries via the public
  * `java.text.BreakIterator` — no new dependencies): the tokens are the
  * boundary segments containing at least one letter or digit.
  *
  * Why it exists: the engine's default tokenizer is the oracle-contract
  * whitespace splitter, and space-splitting goes blind on exactly the text
  * the reference's own mart literals prove it must handle (Korean —
  * mart_odv_bom_master.sql:41 '[계획용]'): an unspaced CJK passage is ONE
  * whitespace token, so token counts, TF-IDF, decontamination n-grams and
  * repetition stats all degenerate. Word boundaries recover script
  * transitions (Latin↔Han↔Hangul↔kana) and punctuation edges; Hangul/kana
  * words segment properly, Han ideograph runs stay single tokens
  * (java.text has no segmentation dictionary — the honest contract, stated
  * here rather than faked).
  *
  * On space-delimited letter/digit text this agrees exactly with the
  * whitespace splitter (parity law in OpsPropertySpec), so it is a strict
  * refinement, not a fork, of the shared tokenizer
  * (graft.ops.TextOps.tokensOf).
  *
  * Codegen emits one static call per row (same pattern as
  * [[WordNgrams]]); the BreakIterator instance is thread-cached
  * (instances are mutable and not thread-safe; creation per row would
  * dominate short strings).
  */
case class UnicodeTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_tokens requires a STRING argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unicode_tokens"

  override def nullSafeEval(input: Any): Any =
    UnicodeTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeTokens.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): UnicodeTokens =
    copy(child = newChild)
}

object UnicodeTokens {

  private val iterators =
    ThreadLocal.withInitial[java.text.BreakIterator](() =>
      java.text.BreakIterator.getWordInstance(java.util.Locale.ROOT))

  private def isWord(s: String, from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      if (Character.isLetterOrDigit(cp)) return true
      i += Character.charCount(cp)
    }
    false
  }

  /** Shared by interpreted eval and codegen. */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val bi = iterators.get()
    bi.setText(s)
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef]()
    var start = bi.first()
    var end = bi.next()
    while (end != java.text.BreakIterator.DONE) {
      if (isWord(s, start, end))
        out += UTF8String.fromString(s.substring(start, end))
      start = end
      end = bi.next()
    }
    new GenericArrayData(out.toArray)
  }

  val info = new ExpressionInfo(
    classOf[UnicodeTokens].getName, null, "unicode_tokens",
    "_FUNC_(str) - UAX#29 word tokens (segments containing a letter/digit), via java.text.BreakIterator.",
    "")
}
