package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for Spark-backed specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // explain truncates scan metadata fields at 100 chars by default —
      // long PushedFilters lists lose their tail and the PlanPolicy
      // pushdown pins can't see the filters they assert
      .config("spark.sql.maxMetadataStringLength", "2000")
      .config("spark.sql.warehouse.dir", TempDirs.create("graft-wh"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
