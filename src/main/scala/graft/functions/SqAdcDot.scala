package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd SQ8 asymmetric-ADC score: the fused decode-and-dot of
  * the scalar-quantization search scan —
  *
  *   Σ_i p_i · (mn_i + (c_i · w_i) / 255)
  *
  * as a LEFT-TO-RIGHT double fold, bit-identical to the
  * `vec_dot(p, zip_with(zip_with(codes, w, (c, w) => c·w/255), mn, +))`
  * higher-order chain it replaces (same per-element IEEE ops in the same
  * order — parity is law-tested, and the q_sq_cosine_topk oracle replays
  * the identical arithmetic). The HOF chain allocates two intermediate
  * arrays and dispatches interpreted lambdas per element per candidate;
  * this is one register-local loop inside whole-stage codegen, running
  * once per (probe, code-row) pair — the hot path of the SQ scan.
  *
  * Null contract matches the chain: any null input or mismatched length
  * or null element → null.
  */
case class SqAdcDot(first: Expression, second: Expression,
                    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _),
            ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (p, c, m, w) => TypeCheckResult.TypeCheckFailure(
        "sq_adc_dot requires (ARRAY<FLOAT|DOUBLE> probe, ARRAY<INT> codes, " +
          s"ARRAY<DOUBLE> mins, ARRAY<DOUBLE> widths), got ${p.simpleString}, " +
          s"${c.simpleString}, ${m.simpleString}, ${w.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_adc_dot"

  private def probeIsFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(p: Any, c: Any, m: Any, w: Any): Any = {
    val pa = p.asInstanceOf[ArrayData]
    val ca = c.asInstanceOf[ArrayData]
    val ma = m.asInstanceOf[ArrayData]
    val wa = w.asInstanceOf[ArrayData]
    val n = pa.numElements()
    if (ca.numElements() != n || ma.numElements() != n ||
      wa.numElements() != n) return null
    val pf = probeIsFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (pa.isNullAt(i) || ca.isNullAt(i) || ma.isNullAt(i) || wa.isNullAt(i))
        return null
      val pi = if (pf) pa.getFloat(i).toDouble else pa.getDouble(i)
      acc += pi * (ma.getDouble(i) + (ca.getInt(i).toDouble * wa.getDouble(i)) / 255.0)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gp = if (probeIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (p, c, m, w) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $p.numElements();
         |if ($c.numElements() != $n || $m.numElements() != $n ||
         |    $w.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($p.isNullAt($i) || $c.isNullAt($i) || $m.isNullAt($i) ||
         |        $w.isNullAt($i)) { $bad = true; break; }
         |    $acc += ((double) $p.$gp($i))
         |      * ($m.getDouble($i)
         |         + (((double) $c.getInt($i)) * $w.getDouble($i)) / 255.0);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): SqAdcDot =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object SqAdcDot {
  val info = new ExpressionInfo(
    classOf[SqAdcDot].getName, null, "sq_adc_dot",
    "_FUNC_(probe, codes, mins, widths) - fused SQ8 decode-and-dot: " +
      "in-order double fold of probe_i * (mins_i + codes_i*widths_i/255).",
    "")

  private[functions] def build(exprs: Seq[Expression]): SqAdcDot = {
    require(exprs.length == 4,
      s"sq_adc_dot requires exactly 4 arguments, got ${exprs.length}")
    SqAdcDot(exprs(0), exprs(1), exprs(2), exprs(3))
  }
}
