package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Catalyst optimizer rule enforcing tenant isolation at the plan level:
  * every scan of a `*_raw` catalog table gains the tenant equality filter,
  * whether or not the query author remembered it.
  *
  * The reference trusts each generated extraction query to carry the
  * `tenant_filter` predicate (reference: base.py:63-68 builds it,
  * _tenant_factory.py:222-230 wires it); ad-hoc reads of the raw tables
  * have no such guarantee. This rule closes that hole — the engine-level
  * equivalent of row-level security for the multi-tenant warehouse.
  *
  * Configured per session (empty column disables the rule):
  * {{{
  *   spark.conf.set("graft.tenant.filterColumn", "project_id")
  *   spark.conf.set("graft.tenant.filterValue",  "EED70012-...")
  * }}}
  *
  * Activated via [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`).
  *
  * The injected Filter sits directly above the relation, so it reaches the
  * parquet reader as a pushed filter / partition prune like any authored
  * predicate. A TreeNodeTag keeps the rule idempotent across the
  * optimizer's fix-point iterations.
  */
case class TenantIsolationRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val Tag = TreeNodeTag[Boolean]("graft.tenantFiltered")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val column = spark.conf.get("graft.tenant.filterColumn", "")
    val value = spark.conf.get("graft.tenant.filterValue", "")
    if (column.isEmpty) return plan

    def guard(rel: LogicalPlan): LogicalPlan =
      rel.output.find(a => a.name.equalsIgnoreCase(column)) match {
        case Some(attr) =>
          rel.setTagValue(Tag, true)
          Filter(EqualTo(attr, Literal(value)), rel)
        case None => rel
      }

    plan.transform {
      case rel: LogicalRelation
          if rel.getTagValue(Tag).isEmpty &&
            rel.catalogTable.exists(_.identifier.database.exists(_.endsWith("_raw"))) =>
        guard(rel)
      case rel: HiveTableRelation
          if rel.getTagValue(Tag).isEmpty &&
            rel.tableMeta.identifier.database.exists(_.endsWith("_raw")) =>
        guard(rel)
    }
  }
}
