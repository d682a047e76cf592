package graft.types

import org.apache.spark.sql.types._

/** External type-name bridge (SURVEY.md §1.2).
  *
  * The reference derives warehouse DDL types from the in-flight Arrow schema
  * (reference: mozart_etl/lib/_tenant_factory.py:35-66). Spark carries the
  * schema natively, so this map exists only at the edges: parsing declared
  * types in model/product-schema definitions, and emitting portable DDL text
  * for interop. Unknown names fall back to STRING/VARCHAR exactly like the
  * reference's fallback branch (_tenant_factory.py:57).
  */
object TypeMap {

  private val DecimalRe = """(?i)decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val VarcharRe = """(?i)(?:varchar|char)\s*(?:\(\s*\d+\s*\))?""".r

  /** External (Arrow/ANSI-ish) type name → Spark DataType. */
  def toSpark(name: String): DataType = name.trim.toLowerCase match {
    case "boolean" | "bool"        => BooleanType
    case "int8" | "int16" | "smallint" | "tinyint" => ShortType
    case "int32" | "int" | "integer" => IntegerType
    case "int64" | "bigint" | "long" => LongType
    case "float32" | "real" | "float" => FloatType
    case "float64" | "double"       => DoubleType
    case "date"                     => DateType
    case "timestamp" | "datetime"   => TimestampType
    // No Spark TIME type; widest-lossless stand-in, documented divergence.
    case "time"                     => LongType
    case DecimalRe(p, s)            => DecimalType(p.toInt, s.toInt)
    case VarcharRe()                => StringType
    case "string" | "text"          => StringType
    case _                          => StringType // reference fallback branch
  }

  /** Spark DataType → portable DDL type name (inverse of the reference's
    * Arrow→DDL map, _tenant_factory.py:35-57).
    */
  def toExternal(dt: DataType): String = dt match {
    case BooleanType        => "BOOLEAN"
    case ShortType | ByteType => "SMALLINT"
    case IntegerType        => "INTEGER"
    case LongType           => "BIGINT"
    case FloatType          => "REAL"
    case DoubleType         => "DOUBLE"
    case d: DecimalType     => s"DECIMAL(${d.precision},${d.scale})"
    case DateType           => "DATE"
    case TimestampType      => "TIMESTAMP"
    case _                  => "VARCHAR"
  }

  /** Quoted column DDL text from a Spark schema — mirrors
    * `_build_column_defs` (_tenant_factory.py:60-66); used only for interop
    * surfaces, never for Spark's own writes.
    */
  def columnDefs(schema: StructType): String =
    schema.fields.map(f => s""""${f.name}" ${toExternal(f.dataType)}""").mkString(", ")
}
