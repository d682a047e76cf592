package graft.std

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** C15 — product-standard schema conformance (reference: PRODUCT_SCHEMA.md:5-15;
  * docs/tenant-onboarding-architecture.md:12-27). Every tenant's mart must
  * land on the same column contract so N tenants' outputs are unionable.
  */
object ProductSchema {

  /** The reference's `mart_item_master` contract. */
  val martItemMaster: StructType = StructType(Seq(
    StructField("item_id", StringType),
    StructField("item_name", StringType),
    StructField("item_type", StringType),
    StructField("item_group_id", StringType),
    StructField("procurement_type", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)))

  /** Validation errors ([] = conformant). Name order and types must match;
    * nullability is advisory (parquet round-trips relax it).
    */
  def validate(df: DataFrame, expected: StructType): Seq[String] = {
    val actual = df.schema
    val nameErrs =
      if (actual.fieldNames.toSeq != expected.fieldNames.toSeq)
        Seq(s"column mismatch: expected ${expected.fieldNames.mkString(",")} " +
          s"got ${actual.fieldNames.mkString(",")}")
      else Seq.empty
    val typeErrs = expected.fields.flatMap { ef =>
      actual.fields.find(_.name == ef.name).toSeq.collect {
        case af if af.dataType != ef.dataType =>
          s"${ef.name}: expected ${ef.dataType.simpleString} got ${af.dataType.simpleString}"
      }
    }
    nameErrs ++ typeErrs
  }

  def requireConformant(df: DataFrame, expected: StructType): DataFrame = {
    val errs = validate(df, expected)
    require(errs.isEmpty, s"schema not conformant: ${errs.mkString("; ")}")
    df
  }
}
