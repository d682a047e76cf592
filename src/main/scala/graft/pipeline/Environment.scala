package graft.pipeline

/** Deployment environment, driving namespace isolation for tenant
  * databases (reference: mozart_etl/utils/environment_helpers.py:4-23).
  *
  * The reference derives the environment from its orchestrator's
  * deployment env vars and prefixes tenant schemas `dev_` in LOCAL, so a
  * developer's laptop run can never collide with the production warehouse
  * namespace (`get_iceberg_schema_for_tenant`, environment_helpers.py:12-16).
  * BRANCH deployments intentionally share the PROD schema names — branch
  * isolation in the reference comes from a separate catalog, not the
  * schema name.
  */
sealed trait Environment {
  /** Database/schema name for a tenant in this environment:
    * `dev_{id}` in Local, bare `{id}` otherwise
    * (environment_helpers.py:12-16).
    */
  def schemaFor(tenantId: String): String = this match {
    case Environment.Local => s"dev_$tenantId"
    case _ => tenantId
  }

  /** dbt-style target name: `prod` only in Prod, else the configured dev
    * target (environment_helpers.py:19-23).
    */
  def dbtTarget(env: Map[String, String] = sys.env): String = this match {
    case Environment.Prod => "prod"
    case _ => env.getOrElse("GRAFT_DBT_TARGET", "dev")
  }
}

object Environment {
  case object Local extends Environment
  case object Branch extends Environment
  case object Prod extends Environment

  /** Detect from env vars, branch check first
    * (environment_helpers.py:4-9): `GRAFT_IS_BRANCH_DEPLOYMENT=1` →
    * Branch; `GRAFT_DEPLOYMENT_NAME=prod` → Prod; otherwise Local.
    */
  def detect(env: Map[String, String] = sys.env): Environment =
    if (env.getOrElse("GRAFT_IS_BRANCH_DEPLOYMENT", "") == "1") Branch
    else if (env.getOrElse("GRAFT_DEPLOYMENT_NAME", "") == "prod") Prod
    else Local
}
