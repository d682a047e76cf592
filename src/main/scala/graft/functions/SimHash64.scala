package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 64-bit SimHash over a token array: per token one xxhash64
  * (seed 42, identical to Spark's `xxhash64(token)`), its 64 bits voting
  * ±1 into a local vote array; output bit i is set when votes(i) > 0.
  *
  * Replaces the higher-order-function formulation (`aggregate(tokens,
  * array_repeat(0,64), zip_with(transform(sequence(0,63), ...)))`): the
  * HOF evaluates ~130 interpreted lambdas and allocates two 64-element
  * arrays PER TOKEN, and — worse — project collapse inlines a full copy of
  * that fold into every expression that references the simhash column
  * (banding it 8 ways cost 8 recomputations, ~228 s at sf0.1). This is a
  * flat Java loop per row; the value is bit-identical to the HOF version
  * (same hash function, same vote rule, same packing).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.hashTokens(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.hashTokens($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Shared by interpreted eval and codegen (the loop is the whole cost —
    * a static call keeps the generated code tiny).
    */
  def hashTokens(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      val tok = arr.getUTF8String(t)
      if (tok != null) {
        // same value as Spark SQL's xxhash64(token): seed 42
        val h = XxHash64Function.hash(tok, StringType, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) bits |= 1L << i
      i += 1
    }
    bits
  }

  val info = new ExpressionInfo(
    classOf[SimHash64].getName, null, "simhash64",
    "_FUNC_(tokens) - 64-bit SimHash of a string array (xxhash64 per token, bit votes).",
    "")
}
