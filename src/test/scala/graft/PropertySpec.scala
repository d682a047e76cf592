package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import graft.config.TenantConfig
import graft.functions.RollingHash
import graft.types.TypeMap

/** ScalaCheck property suite (SURVEY §5.2 item 4) — pure-function laws that
  * must hold for arbitrary inputs, no SparkSession needed.
  */
object PropertySpec extends Properties("graft") {

  private def rollingRef(sx: String): Long =
    sx.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)

  private def rollingExpr(sx: String): Long =
    RollingHash(Literal(UTF8String.fromString(sx))).eval(null).asInstanceOf[Long]

  property("rollingHash.matchesReferenceFold") =
    forAll(Gen.asciiPrintableStr)(sx => rollingExpr(sx) == rollingRef(sx))

  property("rollingHash.appendLaw") =
    forAll(Gen.alphaNumStr, Gen.alphaChar) { (sx, c) =>
      rollingExpr(sx + c) == (rollingExpr(sx) * 31 + c.toByte) % 1000000007L
    }

  private val nameGen = Gen.identifier.suchThat(_.nonEmpty).map(_.take(12))
  private val valGen = Gen.alphaNumStr.map(_.take(12))

  property("envVars.setWinsDefaultFillsNothingSurvives") =
    forAll(nameGen, valGen, valGen) { (n, v, dflt) =>
      Prop.all(
        TenantConfig.resolveEnvVars(s"$${$n:$dflt}", Map(n -> v)) == v,
        TenantConfig.resolveEnvVars(s"$${$n:$dflt}", Map.empty) == dflt,
        TenantConfig.resolveEnvVars(s"$${$n}", Map.empty) == "",
        TenantConfig.resolveEnvVars(s"x-$${$n:$dflt}-y", Map(n -> v)) == s"x-$v-y")
    }

  property("typeMap.roundTripBridgedPrimitives") = {
    import org.apache.spark.sql.types._
    val bridged = Seq(BooleanType, ShortType, IntegerType, LongType, FloatType,
      DoubleType, DateType, TimestampType, StringType, DecimalType(12, 3))
    Prop(bridged.forall(t => TypeMap.toSpark(TypeMap.toExternal(t)) == t))
  }

  property("planeWeight.boundedAndReproducible") =
    forAll(Gen.choose(0, 63), Gen.choose(0, 511)) { (p, i) =>
      val w = graft.ops.VectorOps.planeWeight(p, i)
      w >= -1.0 && w <= 1.0 && w == graft.ops.VectorOps.planeWeight(p, i)
    }
}
