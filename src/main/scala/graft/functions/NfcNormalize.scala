package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode NFC normalization — the canonical-composition
  * pass of corpus cleaning (decomposed `e` + U+0301 and composed `é` must
  * dedup, fingerprint and shingle identically, or visually-equal documents
  * evade every hash-based operator).
  *
  * Spark has no built-in normalizer, and a Scala UDF would box every row
  * and block whole-stage codegen. As a Catalyst expression the common case
  * stays cheap: `Normalizer.isNormalized` is a fast scan (ASCII and
  * already-composed text short-circuits without allocating), and only
  * strings that actually need composing pay for `Normalizer.normalize`.
  * The input UTF8String is returned as-is when already normalized — zero
  * copies on the hot path.
  *
  * Registered as SQL function `nfc_normalize` via [[GraftExtensions]] or
  * [[GraftFunctions.register]] — name-compatible with DuckDB's
  * `nfc_normalize`, which the oracle uses.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a STRING argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Interpreted and generated code share one body (a static call keeps
    * the generated code tiny).
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  val info = new ExpressionInfo(
    classOf[NfcNormalize].getName, null, "nfc_normalize",
    "_FUNC_(str) - Unicode canonical composition (NFC) of the string.",
    "")
}
