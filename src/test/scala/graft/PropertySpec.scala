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

  // The EpochNsTranspose lemma: for every µs value u and ns constant c,
  // each comparison of u*1000 against c equals the rewritten raw-domain
  // comparison of u against the floor/ceil-divided constant — the exact
  // law the optimizer rule relies on for parquet pushdown correctness.
  private val usGen = Gen.choose(-4102444800000000L, 4102444800000000L)
  // the FULL Long range, extremes explicitly over-weighted: the add-999
  // ceiling overflowed near Long.MaxValue and a capped generator never
  // reached it
  private val nsGen = Gen.frequency(
    8 -> Gen.choose(Long.MinValue, Long.MaxValue),
    1 -> Gen.choose(Long.MaxValue - 2000L, Long.MaxValue),
    1 -> Gen.choose(Long.MinValue, Long.MinValue + 2000L))
  property("epochNsTranspose.exactIntegerTransposition") =
    forAll(usGen, nsGen) { (u, c) =>
      import graft.plans.EpochNsTranspose.{ceilUs, floorUs}
      val ns = u * 1000L
      (ns > c) == (u > floorUs(c)) &&
      (ns >= c) == (u >= ceilUs(c)) &&
      (ns < c) == (u < ceilUs(c)) &&
      (ns <= c) == (u <= floorUs(c)) &&
      (ns == c) == (c % 1000L == 0L && u == c / 1000L)
    }

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

  // --- cron laws ---------------------------------------------------------
  import graft.pipeline.CronSchedule
  import java.time.LocalDateTime

  private val cronGen: Gen[CronSchedule] = {
    val minute = Gen.oneOf(Gen.const("*"), Gen.choose(0, 59).map(_.toString),
      Gen.choose(2, 30).map(n => s"*/$n"))
    val hour = Gen.oneOf(Gen.const("*"), Gen.choose(0, 23).map(_.toString),
      Gen.choose(2, 12).map(n => s"*/$n"))
    // dom capped at 28 so every month satisfies the spec (no Feb-30 traps
    // in the law tests; the unsatisfiable case has its own deterministic
    // test in ScheduleSpec)
    val dom = Gen.oneOf(Gen.const("*"), Gen.choose(1, 28).map(_.toString))
    val month = Gen.oneOf(Gen.const("*"), Gen.choose(1, 12).map(_.toString))
    val dow = Gen.oneOf(Gen.const("*"), Gen.choose(0, 7).map(_.toString))
    for (m <- minute; h <- hour; d <- dom; mo <- month; w <- dow)
      yield CronSchedule.parse(s"$m $h $d $mo $w")
  }

  private val timeGen: Gen[LocalDateTime] =
    Gen.choose(0L, 4102444800L).map(s => // 1970..2100
      LocalDateTime.ofEpochSecond(s - s % 60, 0, java.time.ZoneOffset.UTC))

  property("cron.nextAfterIsAMatchStrictlyAfter") =
    forAll(cronGen, timeGen) { (c, tx) =>
      val n = c.nextAfter(tx)
      n.isAfter(tx) && c.matches(n)
    }

  property("cron.nothingMatchesBetweenTAndNext") =
    forAll(cronGen, timeGen) { (c, tx) =>
      val n = c.nextAfter(tx)
      // spot-check a few interior minutes rather than the whole gap
      val gapMinutes = java.time.Duration.between(tx, n).toMinutes
      val probes = Seq(1L, gapMinutes / 2, gapMinutes - 1)
        .filter(m => m >= 1 && m < gapMinutes)
      probes.forall(m => !c.matches(tx.plusMinutes(m).withSecond(0).withNano(0)))
    }

  property("cron.nextAfterIsMonotone") =
    forAll(cronGen, timeGen, timeGen) { (c, t1, t2) =>
      val (lo, hi) = if (t1.isBefore(t2)) (t1, t2) else (t2, t1)
      // a later start can never yield an earlier fire
      !c.nextAfter(hi).isBefore(c.nextAfter(lo))
    }

  // ---- media container parsers: craft→parse round-trip laws ----

  private val imgFmtGen = Gen.oneOf(graft.ops.MultimodalOps.FixtureFormats)
  private val dimGen = Gen.choose(1, 16383) // VP8 14-bit cap binds all

  property("mediaHeader.craftParseRoundTrip") =
    forAll(imgFmtGen, dimGen, dimGen) { (fmt, w, h) =>
      graft.ops.MultimodalOps.parseHeader(
        graft.ops.MultimodalOps.craftHeader(fmt, w, h)) == Some((fmt, w, h))
    }

  property("mediaHeader.survivesArbitraryBody") =
    forAll(imgFmtGen, dimGen, dimGen, Gen.listOfN(32, Gen.choose(-128, 127))) {
      (fmt, w, h, body) =>
        graft.ops.MultimodalOps.parseHeader(
          graft.ops.MultimodalOps.craftHeader(fmt, w, h)
            ++ body.map(_.toByte).toArray) == Some((fmt, w, h))
    }

  property("avHeader.wavRoundTripDurationQuotient") =
    forAll(Gen.choose(8000, 48000), Gen.choose(1, 2), Gen.choose(0, 1 << 20)) {
      (sr, ch, dataLen) =>
        val parsed = graft.ops.MultimodalOps.parseAvHeader(
          graft.ops.MultimodalOps.craftAvHeader("wav", sr, ch, dataLen)
            ++ new Array[Byte](dataLen))
        parsed == Some(("wav", dataLen.toLong * 1000L / (sr * ch * 2), sr, ch))
    }

  property("avHeader.mp4RoundTripTimescaleQuotient") =
    forAll(Gen.choose(1, 1000000), Gen.choose(0, 1000000)) { (timescale, dur) =>
      graft.ops.MultimodalOps.parseAvHeader(
        graft.ops.MultimodalOps.craftAvHeader("mp4", timescale, dur)) ==
        Some(("mp4", dur.toLong * 1000L / timescale, 0, 0))
    }

  // build-side bit math replicated as a pure fold — the law is that the
  // probe expression can NEVER miss an inserted key, for any key set and
  // any probe count
  private def pureBloom(keys: Seq[Long], bitsPerKey: Int, k: Int): Array[Byte] = {
    val mBits = math.max(64L, ((keys.length.toLong * bitsPerKey + 63) / 64) * 64)
    val out = new Array[Byte](1 + (mBits / 8).toInt)
    out(0) = k.toByte
    for (key <- keys; i <- 1 to k) {
      val pos = ((key & 0xffffffffL) + i.toLong * (key >>> 32)) % mBits
      val b = 1 + (pos >> 3).toInt
      out(b) = (out(b) | (1 << (pos & 7).toInt)).toByte
    }
    out
  }

  private def probes(bits: Array[Byte], key: Long): Boolean =
    graft.functions.BloomMightContain(Literal(bits), Literal(key))
      .eval(null).asInstanceOf[Boolean]

  property("bloom.noFalseNegativesEver") =
    forAll(Gen.listOf(Gen.long), Gen.choose(1, 12)) { (keys, k) =>
      val bits = pureBloom(keys, 10, k)
      keys.forall(probes(bits, _))
    }

  property("bloom.emptyOrHeaderOnlyContainsNothing") =
    forAll(Gen.long) { key =>
      !probes(pureBloom(Nil, 10, 7), key) && !probes(Array[Byte](7), key)
    }

  private def ngramRef(s: String, n: Int): Seq[String] = {
    val trimmed = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val toks = java.util.regex.Pattern.compile("\\s+").split(trimmed, -1)
    if (toks.length < n) Seq.empty
    else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).distinct
  }

  private val wordyGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.identifier.map(_.take(4)), Gen.const(""), Gen.const(" "),
    Gen.const("\t"))).map(_.mkString(" "))

  property("wordNgrams.matchesPureReference") =
    forAll(wordyGen, Gen.choose(1, 4)) { (s, n) =>
      val arr = graft.functions.WordNgrams(
        Literal(UTF8String.fromString(s)), n)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val got = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      got == ngramRef(s, n)
    }

  // GIF LZW total-correctness law: encode∘decode is the identity for
  // ARBITRARY rasters — dictionary growth, width changes, KwKwK and the
  // 4096-entry reset all fall under the generator (large noisy rasters
  // overflow the dictionary; tiny ones exercise the degenerate paths).
  private val rasterGen: Gen[graft.ops.GifCodec.Indexed] = for {
    w <- Gen.choose(1, 48)
    h <- Gen.choose(1, 48)
    bytes <- Gen.containerOfN[Array, Byte](w * h, Gen.choose(0, 255).map(_.toByte))
  } yield graft.ops.GifCodec.Indexed(w, h, bytes)

  property("gifLzw.roundTripIsIdentity") =
    forAll(rasterGen) { r =>
      val back = graft.ops.GifCodec.decode(graft.ops.GifCodec.encode(r))
      back.exists(b => b.width == r.width && b.height == r.height &&
        java.util.Arrays.equals(b.pixels, r.pixels))
    }

  // SQ8 quantization law: for arbitrary params and in-range values the
  // reconstruction error is bounded by one level (w/255) — the exact
  // arithmetic the engine's encode (clamped floor) and the fused
  // sq_adc_dot decode perform.
  private val sqCaseGen: Gen[(Double, Double, Double)] = for {
    mn <- Gen.choose(-1000.0, 1000.0)
    w <- Gen.choose(1e-6, 2000.0)
    t <- Gen.choose(0.0, 1.0) // position within [mn, mn+w]
  } yield (mn, w, mn + t * w)

  property("sq8.reconstructionWithinOneLevel") =
    forAll(sqCaseGen) { case (mn, w, x) =>
      val code = math.min(255L, math.max(0L,
        math.floor(((x - mn) * 255.0) / w).toLong))
      val decoded = mn + (code.toDouble * w) / 255.0
      math.abs(decoded - x) <= w / 255.0 + math.ulp(w) * 4
    }

  property("vecDot.matchesReferenceFoldAndIsSymmetric") =
    forAll(Gen.listOfN(64, Gen.choose(-1000, 1000).map(_ / 100.0))) { xs =>
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      def lit(v: Seq[Double]) = Literal.create(v, ArrayType(DoubleType))
      val ys = xs.reverse
      val ab = graft.functions.VecDot(lit(xs), lit(ys)).eval(null).asInstanceOf[Double]
      val ba = graft.functions.VecDot(lit(ys), lit(xs)).eval(null).asInstanceOf[Double]
      val ref = xs.zip(ys).foldLeft(0.0)((a, p) => a + p._1 * p._2)
      java.lang.Double.doubleToLongBits(ab) == java.lang.Double.doubleToLongBits(ref) &&
        java.lang.Double.doubleToLongBits(ab) == java.lang.Double.doubleToLongBits(ba)
    }
}
