package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word n-grams of a string: the set of space-joined
  * n-token windows over whitespace tokenization, in first-occurrence
  * order — exactly `array_distinct(transform(sequence(0, size(tokens)-n),
  * i -> concat_ws(' ', slice(tokens, i+1, n))))` over
  * `tokens = split(trim(text), '\\s+')`, which it replaces in the
  * decontamination hot path.
  *
  * The HOF chain evaluates one interpreted lambda per window plus an
  * array_distinct pass per row (CodegenFallback, boxed) — measured ~5 s of
  * the sf0.1 decontamination sweep. This is one static call per row: the
  * tokenization delegates to the SAME UTF8String trim/split used by the
  * SQL `trim`/`split` operators, so token boundaries are bit-identical to
  * the oracle's `string_split_regex(trim(text), '\s+')` contract.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"word_ngrams: n must be >= 1, got $n")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires a STRING argument, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {

  private val SplitPattern = UTF8String.fromString("\\s+")
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and codegen. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // identical tokenization to SQL split(trim(text), '\s+')
    val toks = text.trim().split(SplitPattern, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= toks.length) {
      val window = new Array[UTF8String](n)
      var j = 0
      while (j < n) { window(j) = toks(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  val info = new ExpressionInfo(
    classOf[WordNgrams].getName, null, "word_ngrams",
    "_FUNC_(str, n) - distinct space-joined word n-grams over whitespace tokens, first-occurrence order.",
    "")

  /** Registry builder: `n` must be an integer literal (it shapes the
    * per-row loop, not the data).
    */
  def build(exprs: Seq[Expression]): WordNgrams = {
    require(exprs.length == 2,
      s"word_ngrams requires exactly 2 arguments, got ${exprs.length}")
    val n = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"word_ngrams: n must be an INT literal, got $other")
    }
    WordNgrams(exprs.head, n)
  }
}
