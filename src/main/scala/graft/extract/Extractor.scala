package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.config.{TableSpec, TenantConfig}

/** Declarative extraction predicates (SURVEY.md §2.B) — the composable
  * SELECT-builder the reference hand-writes as SQL text (reference:
  * mozart_etl/lib/extract/connectors/base.py:55-79), re-expressed as lazy
  * DataFrame transformations. Catalyst pushes each piece into the physical
  * scan: projection → parquet ReadSchema / JDBC select list, equality and
  * watermark filters → PushedFilters / JDBC WHERE, limit → LimitPushDown.
  */
object Extractor {

  /** B1 — column projection (`SELECT c1, c2` vs `*`, base.py:56-58). */
  def project(df: DataFrame, columns: Seq[String]): DataFrame =
    if (columns.isEmpty) df else df.select(columns.map(col): _*)

  /** B2+B3 — conjunctive equality filters (tenant isolation; base.py:63-68).
    * Values are compared as-provided; callers pass typed literals.
    */
  def equalityFilters(df: DataFrame, filters: Map[String, Any]): DataFrame =
    filters.foldLeft(df) { case (d, (c, v)) => d.filter(col(c) === lit(v)) }

  /** B4 — strict-`>` watermark predicate (base.py:71-73). Fires only when
    * both the column and a last value are present — the same both-present
    * contract as the reference.
    */
  def watermark(df: DataFrame, incrementalColumn: Option[String],
                lastValue: Option[Any]): DataFrame =
    (incrementalColumn, lastValue) match {
      case (Some(c), Some(v)) => df.filter(col(c) > lit(v))
      case _ => df
    }

  /** B5 — LIMIT (base.py:78-79). */
  def limit(df: DataFrame, n: Option[Int]): DataFrame =
    n.map(df.limit).getOrElse(df)

  /** Full composition in the reference's order: projection, tenant filters,
    * watermark, limit (base.py:55-79). `tenantValue` is looked up from
    * tenant params by the spec's `tenant_filter` key
    * (_tenant_factory.py:222-230).
    */
  def extract(df: DataFrame, spec: TableSpec, tenant: TenantConfig,
              lastValue: Option[Any] = None, rowLimit: Option[Int] = None): DataFrame = {
    val filters: Map[String, Any] = spec.tenantFilter
      .flatMap(k => tenant.params.get(k).map(v => k -> (v: Any))).toMap
    limit(
      watermark(
        equalityFilters(project(df, spec.columns), filters),
        spec.incrementalColumn, lastValue),
      rowLimit)
  }

  /** Composable predicate builder for ad-hoc conjunctions (B3); empty
    * conjunction is the identity `true`.
    */
  def and(conds: Seq[Column]): Column = conds.foldLeft(lit(true))(_ && _)
}
