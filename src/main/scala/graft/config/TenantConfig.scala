package graft.config

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml

/** Declarative extract spec for one source table
  * (reference: code_locations/project_01/tenant.yaml:22-44).
  */
final case class TableSpec(
    name: String,
    sourceSchema: String,
    sourceTable: String,
    primaryKey: Seq[String],
    columns: Seq[String],
    tenantFilter: Option[String],
    incrementalColumn: Option[String],
    mode: String) {
  // "append" is the engine's watermark-append upgrade (LoadMode.parse)
  require(mode == "full" || mode == "incremental" || mode == "append",
    s"unknown mode: $mode")
}

/** Source connection config (reference: tenant.yaml:4-10). */
final case class SourceConfig(
    sourceType: String,
    host: String,
    port: String,
    database: String,
    username: String,
    password: String,
    serviceName: Option[String] = None,
    sid: Option[String] = None)

/** One tenant = config namespace + table specs + params
  * (reference: code_locations/_shared.py:79-96, tenant.yaml).
  * Databases derived from id: `{id}_raw` (landing) and `{id}` (staging+mart).
  */
final case class TenantConfig(
    id: String,
    name: String,
    source: SourceConfig,
    params: Map[String, String],
    storagePrefix: String,
    schedule: String,
    tables: Seq[TableSpec]) {
  def rawDatabase: String = s"${id}_raw"
  def database: String = id
  /** Environment-scoped names: Local prefixes `dev_` so a dev run can
    * never land in the production namespace (reference:
    * environment_helpers.py:12-16). The zero-arg forms are the Prod/bare
    * names.
    */
  def database(env: graft.pipeline.Environment): String = env.schemaFor(id)
  def rawDatabase(env: graft.pipeline.Environment): String =
    s"${env.schemaFor(id)}_raw"
}

object TenantConfig {

  private val EnvVarRe = """\$\{(\w+)(?::([^}]*))?\}""".r

  /** Resolve `${VAR}` / `${VAR:default}` patterns — same contract as the
    * reference resolver (code_locations/_shared.py:51-76): missing var with
    * no default → empty string.
    */
  def resolveEnvVars(value: String, env: Map[String, String] = sys.env): String =
    EnvVarRe.replaceAllIn(value, m => {
      val default = Option(m.group(2)).getOrElse("")
      scala.util.matching.Regex.quoteReplacement(env.getOrElse(m.group(1), default))
    })

  def load(path: String, env: Map[String, String] = sys.env): TenantConfig =
    parse(Files.readString(Paths.get(path)), env)

  def parse(yamlText: String, env: Map[String, String] = sys.env): TenantConfig = {
    val root = new Yaml().load[java.util.Map[String, Object]](yamlText).asScala
    val tenant = asMap(root("tenant"))
    val src = asMap(tenant("source"))
    def res(v: Any): String = resolveEnvVars(String.valueOf(v), env)

    val tables = root.get("tables").toSeq.flatMap(asList).map { t0 =>
      val t = asMap(t0)
      TableSpec(
        name = String.valueOf(t("name")),
        sourceSchema = t.get("source_schema").map(String.valueOf(_)).getOrElse(""),
        sourceTable = t.get("source_table").map(String.valueOf(_)).getOrElse(String.valueOf(t("name"))),
        primaryKey = t.get("primary_key").toSeq.flatMap(asList).map(String.valueOf(_)),
        columns = t.get("columns").toSeq.flatMap(asList).map(String.valueOf(_)),
        tenantFilter = t.get("tenant_filter").map(String.valueOf(_)),
        incrementalColumn = t.get("incremental_column").map(String.valueOf(_)),
        mode = t.get("mode").map(String.valueOf(_)).getOrElse("full"))
    }

    TenantConfig(
      id = res(tenant("id")),
      name = tenant.get("name").map(res).getOrElse(""),
      source = SourceConfig(
        sourceType = res(src("type")),
        host = src.get("host").map(res).getOrElse("localhost"),
        port = src.get("port").map(res).getOrElse(""),
        database = src.get("database").map(res).getOrElse(""),
        username = src.get("username").map(res).getOrElse(""),
        password = src.get("password").map(res).getOrElse(""),
        serviceName = src.get("service_name").map(res),
        sid = src.get("sid").map(res)),
      params = tenant.get("params").map(asMap).getOrElse(Map.empty)
        .map { case (k, v) => k -> res(v) }.toMap,
      storagePrefix = tenant.get("storage").map(asMap)
        .flatMap(_.get("prefix")).map(res).getOrElse(""),
      schedule = tenant.get("schedule").map(res).getOrElse(""),
      tables = tables)
  }

  private def asMap(o: Any): scala.collection.Map[String, Object] =
    o.asInstanceOf[java.util.Map[String, Object]].asScala
  private def asList(o: Any): Seq[Object] =
    o.asInstanceOf[java.util.List[Object]].asScala.toSeq
}
