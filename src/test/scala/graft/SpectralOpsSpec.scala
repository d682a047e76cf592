package graft

import org.apache.spark.sql.functions._
import graft.ops.{SpectralOps, TfidfOps}

/** Power iteration: hand-computed fixed point, dominance, bounds, and the
  * projection's ordering semantics.
  */
class SpectralOpsSpec extends SparkSpec {

  import spark.implicits._

  private def vecsDf(rows: (Long, Int, Long)*) =
    rows.toDF("doc_id", "dim", "v_fp")

  test("rank-1 corpus reaches its hand-computed fixed point") {
    // one direction x = (600000, 400000): u converges to x / max(x)
    // round 1: s = 1e6, w = (6e11, 4e11) -> u = (1000000, 666666)
    // round 2: s = 866666, w proportional again -> u unchanged (fixed point)
    val u = SpectralOps.powerDirection(vecsDf(
      (1L, 0, 600000L), (1L, 1, 400000L))).toMap
    assert(u(0) === 1000000L)
    assert(u(1) === 666666L)
    assert((2 until TfidfOps.Dims).forall(u(_) === 0L))
  }

  test("direction is bounded to [0, UScale] with max exactly UScale") {
    val u = SpectralOps.powerDirection(vecsDf(
      (1L, 0, 500000L), (1L, 1, 500000L),
      (2L, 1, 300000L), (2L, 2, 700000L))).map(_._2)
    assert(u.size === TfidfOps.Dims)
    assert(u.max === SpectralOps.UScale)
    assert(u.forall(v => v >= 0 && v <= SpectralOps.UScale))
  }

  test("the dominant doc group wins the direction; projections rank it first") {
    // group A: three docs on dims {0,1}; group B: one doc on dims {2,3}
    val vecs = vecsDf(
      (1L, 0, 600000L), (1L, 1, 400000L),
      (2L, 0, 550000L), (2L, 1, 450000L),
      (3L, 0, 650000L), (3L, 1, 350000L),
      (4L, 2, 500000L), (4L, 3, 500000L))
    val u = SpectralOps.powerDirection(vecs)
    val um = u.toMap
    assert(um(0) === SpectralOps.UScale) // dominant axis
    assert(um(2) < um(0) / 100 && um(3) < um(0) / 100)
    val proj = SpectralOps.spectralProjection(vecs, u)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(a => proj(a) > proj(4L)),
      "group-A docs must project above the off-axis doc")
  }

  test("projection truncation order matches the iteration's (sum then div)") {
    val u = Seq(0 -> 999999L) ++ (1 until TfidfOps.Dims).map(_ -> 0L)
    val p = SpectralOps.spectralProjection(vecsDf((1L, 0, 3L)), u)
      .head.getLong(1)
    assert(p === 3L * 999999L / 1000000L) // = 2, truncated once at the end
  }
}
