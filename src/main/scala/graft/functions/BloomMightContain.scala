package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types._

/** Native codegen'd bloom-filter membership probe — the corpus-side half
  * of blocklist filtering at scale (drop 100 TB of corpus rows against a
  * blocklist too large to broadcast, without shuffling the corpus).
  *
  * Layout contract (shared with the distributed build in
  * graft.ops.BlocklistOps.buildBloom): byte 0 is the probe count k, the
  * remaining bytes are the bitmap (m = 8·(len−1) bits). Probing is
  * Guava/Spark-style double hashing over a pre-hashed 64-bit key: h1 =
  * low 32 bits, h2 = high 32 bits, position_i = (h1 + i·h2) mod m for
  * i = 1..k. All terms are non-negative, so plain `%` is the build side's
  * `pmod` — the two sides can never disagree on a bit position.
  *
  * An empty filter (no bitmap bytes, or k = 0) contains nothing — the
  * empty-blocklist corpus streams through untouched.
  *
  * No false negatives ever; false positives are expected and are resolved
  * by the exact confirm join downstream — the expression is a bandwidth
  * gate, not the membership oracle.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (BINARY, BIGINT), got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(bitsAny: Any, keyAny: Any): Any = {
    val bits = bitsAny.asInstanceOf[Array[Byte]]
    val key = keyAny.asInstanceOf[Long]
    if (bits.length < 2) return false
    val k = bits(0) & 0xff
    if (k == 0) return false
    val m = (bits.length - 1).toLong << 3
    val h1 = key & 0xffffffffL
    val h2 = key >>> 32
    var i = 1
    while (i <= k) {
      val pos = (h1 + i.toLong * h2) % m
      if ((bits((pos >> 3).toInt + 1) & (1 << (pos & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, key) => {
      val k = ctx.freshName("k")
      val m = ctx.freshName("m")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      val might = ctx.freshName("might")
      s"""
         |boolean $might = false;
         |if ($bits.length >= 2 && ($bits[0] & 0xFF) != 0) {
         |  int $k = $bits[0] & 0xFF;
         |  long $m = ((long) ($bits.length - 1)) << 3;
         |  long $h1 = $key & 0xFFFFFFFFL;
         |  long $h2 = $key >>> 32;
         |  $might = true;
         |  for (int $i = 1; $i <= $k; $i++) {
         |    long $pos = ($h1 + ((long) $i) * $h2) % $m;
         |    if (($bits[(int) ($pos >> 3) + 1] & (1 << (int) ($pos & 7))) == 0) {
         |      $might = false; break;
         |    }
         |  }
         |}
         |${ev.value} = $might;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  val info = new ExpressionInfo(
    classOf[BloomMightContain].getName, null, "bloom_might_contain",
    "_FUNC_(bits, key) - probes the bloom bitmap (byte 0 = k, rest = bitmap) with a pre-hashed 64-bit key.",
    "")
}
