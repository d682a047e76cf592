package graft

import org.apache.spark.sql.functions._
import graft.ops.LayoutOps

/** Z-order layout laws: the Morton interleave against hand-computed bit
  * patterns, bucket arithmetic, and the actual clustering effect — the
  * z-ordered files' per-file (lang × length) bounding boxes must be far
  * tighter than an id-ordered layout's, which is the whole point of the
  * key.
  */
class LayoutOpsSpec extends SparkSpec {

  import spark.implicits._

  test("morton interleave matches hand-computed bit patterns") {
    // x=5 (101b), y=3 (011b): bit0(x)->z0, bit0(y)->z1, bit1(y)->z3,
    // bit2(x)->z4  =>  z = 1 + 2 + 8 + 16 = 27
    val rows = Seq((5L, 3L), (0L, 0L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .withColumn("z", expr(LayoutOps.mortonExpr("x", "y")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows((5L, 3L)) == 27L)
    assert(rows((0L, 0L)) == 0L)
    // x fills the even bit positions, y the odd ones
    assert(rows((65535L, 0L)) == 0x55555555L)
    assert(rows((0L, 65535L)) == 0xAAAAAAAAL)
  }

  test("zOrderKey: dims and bucket arithmetic hold fixture-wide") {
    val rows = LayoutOps.zOrderKey(spark, sf).collect()
    assert(rows.length == 500)
    val maxZ = rows.map(_.getAs[Long]("z_key")).max
    val width = math.max(1L, (maxZ + 1) / 64)
    rows.foreach { r =>
      val (li, l16, z, b) = (r.getAs[Long]("lang_idx"),
        r.getAs[Long]("len16"), r.getAs[Long]("z_key"),
        r.getAs[Long]("z_bucket"))
      assert(li >= 0 && li < 65536 && l16 >= 0 && l16 <= 65535)
      assert(b == z / width)
      assert(z >= 0 && z < (1L << 32))
    }
    // the adaptive grid spreads the occupied range over many buckets
    assert(rows.map(_.getAs[Long]("z_bucket")).distinct.length > 4)
  }

  test("z-ordered export clusters both dimensions; slices don't overlap") {
    val zDir = TempDirs.create("graft-zorder")
    val baseDir = TempDirs.create("graft-zorder-base")
    LayoutOps.exportZOrderedWrite(spark, sf, zDir)
    // baseline: same columns, id-ordered files (the layout a plain export
    // would produce)
    LayoutOps.zOrderKey(spark, sf)
      .repartitionByRange(8, col("doc_id")).sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(baseDir)
    def boxes(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("lang_idx") - min("lang_idx") + 1).as("dl"),
        (max("len16") - min("len16") + 1).as("dn"),
        min("z_key").as("zlo"), max("z_key").as("zhi"))
      .collect()
    val zb = boxes(zDir)
    val bb = boxes(baseDir)
    assert(zb.length > 1 && bb.length > 1)
    def avgArea(xs: Array[org.apache.spark.sql.Row]) =
      xs.map(r => r.getAs[Long]("dl").toDouble * r.getAs[Long]("dn"))
        .sum / xs.length
    // the z layout's average per-file query box must be MUCH tighter than
    // the id layout's — this is the file-skipping win the key exists for
    assert(avgArea(zb) * 2 < avgArea(bb),
      s"z-order did not cluster: z=${avgArea(zb)} base=${avgArea(bb)}")
    // range partitioning on z_key ⇒ file z slices are disjoint
    val slices = zb.map(r => (r.getAs[Long]("zlo"), r.getAs[Long]("zhi")))
      .sortBy(_._1)
    slices.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        "z slices overlap across files")
      case _ => ()
    }
  }

  test("zOrderKey plan: no keyed data shuffle (1-row max agg is fine)") {
    val plan = LayoutOps.zOrderKey(spark, sf)
      .queryExecution.executedPlan.toString
    // allowed exchanges: the output range sort, the 1-row bucket-width
    // aggregate, and the language-count-sized dim derivation — the CORPUS
    // must never shuffle on a key
    assert(!plan.contains("Exchange hashpartitioning(doc_id") &&
      !plan.contains("Exchange hashpartitioning(z_key") &&
      !plan.contains("CartesianProduct"),
      s"zOrderKey shuffled the corpus:\n$plan")
  }
}
