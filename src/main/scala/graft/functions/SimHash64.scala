package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 64-bit SimHash over a token array: per token one 64-bit hash —
  * the UPPER 64 bits of MD5(token-utf8), big-endian — whose bits vote ±1
  * into a local vote array; output bit i is set when votes(i) > 0.
  *
  * MD5 halves, not xxhash64, as the per-token hash: MD5 is bit-identical
  * in every engine (DuckDB `md5()` included), so the simhash VALUE is
  * fully oracle-computable — the correctness gate recomputes the whole
  * sketch from raw text instead of trusting the engine's hash family
  * (an xxhash64 sketch was rows-only-checkable; this closes the gate).
  * Distribution-wise MD5's bits are at least as uniform, so banding /
  * hamming behavior is unchanged.
  *
  * Replaces the higher-order-function formulation (`aggregate(tokens,
  * array_repeat(0,64), zip_with(transform(sequence(0,63), ...)))`): the
  * HOF evaluates ~130 interpreted lambdas and allocates two 64-element
  * arrays PER TOKEN, and — worse — project collapse inlines a full copy of
  * that fold into every expression that references the simhash column
  * (banding it 8 ways cost 8 recomputations, ~228 s at sf0.1). This is a
  * flat Java loop per row.
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

  /** Per-thread digest instance — MessageDigest is stateful and not
    * thread-safe; a shared instance across executor task threads would
    * interleave updates.
    */
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Upper 64 bits of MD5(utf8 bytes), big-endian, as a signed long —
    * the same value `CAST` of the first 16 hex chars of `md5(tok)` yields
    * in any engine (the oracle extracts its bits nibble-by-nibble from
    * the hex string).
    */
  def md5Upper64(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var j = 0
    while (j < 8) {
      v = (v << 8) | (h(j) & 0xFFL)
      j += 1
    }
    v
  }

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
        val h = md5Upper64(tok.getBytes)
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
    "_FUNC_(tokens) - 64-bit SimHash of a string array (md5-upper-64 per token, bit votes).",
    "")
}
