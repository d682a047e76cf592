package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined-chunking split (graft.ops.ChunkOps' CDC rule) —
  * `cdc_chunks(text)` returns `array<struct<chunk_pos:int, chunk:string>>`,
  * bit-identical to the higher-order-function formulation it replaces:
  *
  *   cut after code-point position i (1-based, i ≥ W) when
  *     fold(codes[i-W+1..i], (a,c) -> (a·31 + c) mod 1e9+7) mod 16 == 7
  *   boundaries = distinct(0 :: cuts :: n), chunks = the slices between
  *   consecutive boundaries (empty text → zero chunks).
  *
  * `codes` are Unicode CODE POINTS (`ascii(split(text, ''))` semantics —
  * verified: Spark's `ascii` yields the code point and `split(text,'')`
  * yields one element per code point, surrogate pairs intact), and chunk
  * slicing follows `substring`'s code-point positions.
  *
  * Why native (r14 optimization, guide §1.2 "per-task work"): the HOF
  * formulation evaluates one interpreted `aggregate(slice(...))` lambda
  * chain PER WINDOW POSITION — an O(n·W) interpreted fold with a fresh
  * 8-element array allocation per position was the single 4.5 s job inside
  * `q_cdc_rewrite_incremental`. This is the same O(n·W) arithmetic as one
  * flat Java loop over an int[] of code points (W = 8 multiply-mods per
  * position, no allocation), inside whole-stage codegen via a static call.
  * Equivalence is law-tested against the HOF expression in ChunkOpsSpec.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires a STRING argument, got ${other.simpleString}")
  }

  override def dataType: DataType = CdcChunks.OutType
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String])

  // one static call inside whole-stage codegen — no CodegenFallback row
  // boundary, the SqAdcDot/AcScan posture
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunks.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  // ChunkOps' frozen CDC parameters (Window/Divisor/Residue/B/M) — kept in
  // one place THERE; mirrored literals here would drift, so read them.
  private val W = graft.ops.ChunkOps.Window
  private val D = graft.ops.ChunkOps.Divisor
  private val R = graft.ops.ChunkOps.Residue
  private val B = 31L
  private val M = 1000000007L

  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("chunk_pos", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false))))

  val info = new ExpressionInfo(
    classOf[CdcChunks].getName, null, "cdc_chunks",
    "_FUNC_(str) - content-defined chunks: array<struct<chunk_pos:int, chunk:string>> " +
      "split where the 8-code-point rolling hash (base 31, mod 1e9+7) hits residue 7 mod 16.",
    "")

  /** The whole split for one row. Returns an ArrayData of (chunk_pos,
    * chunk) structs; empty array for empty text.
    */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val slen = s.length
    // one pass: code points + the UTF-16 index where each code point starts
    var n = 0
    var i = 0
    val codes = new Array[Int](slen)
    val starts = new Array[Int](slen + 1)
    while (i < slen) {
      val cp = s.codePointAt(i)
      codes(n) = cp
      starts(n) = i
      n += 1
      i += Character.charCount(cp)
    }
    starts(n) = slen
    // boundaries: 0, every window-hash hit, n (distinct, ascending)
    val bnds = new Array[Int](n + 2)
    var nb = 0
    bnds(nb) = 0; nb += 1
    var p = W // 1-based end position of the window
    while (p <= n) {
      var acc = 0L
      var j = p - W
      while (j < p) { acc = (acc * B + codes(j)) % M; j += 1 }
      if (acc % D == R) { bnds(nb) = p; nb += 1 }
      p += 1
    }
    if (nb == 0 || bnds(nb - 1) != n) { bnds(nb) = n; nb += 1 }
    if (nb < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nb - 1)
    var k = 0
    while (k < nb - 1) {
      val from = bnds(k); val until = bnds(k + 1)
      out(k) = InternalRow(from,
        UTF8String.fromString(s.substring(starts(from), starts(until))))
      k += 1
    }
    new GenericArrayData(out)
  }
}
