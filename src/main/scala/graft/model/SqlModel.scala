package graft.model

/** A named SQL transform — the engine's equivalent of one dbt model file
  * (reference: mozart_etl/code_locations/project_01/models). The raw text
  * keeps the reference's authoring dialect (`{{ config(...) }}` header,
  * `{{ var/source/ref }}`, `{% if %}` conditionals, `::T` casts); parsing
  * extracts the header and the dependency edges, rendering happens in
  * [[Renderer]].
  */
final case class SqlModel(
    name: String,
    rawSql: String) {

  /** config(...) header fields (reference model headers, e.g.
    * project_01__stg_cfg_item_master.sql:1-4,
    * project_01__mart_item_master.sql:1-5).
    */
  lazy val config: Map[String, String] = SqlModel.parseConfig(rawSql)

  /** Physical table name: explicit alias, else model name
    * (dbt semantics; reference dbt_project.yml:14-25).
    */
  def alias: String = config.getOrElse("alias", name)

  def materialized: String = config.getOrElse("materialized", "table")

  /** ref() edges — drives DAG ordering (reference: translator.py:32-47). */
  lazy val refs: Seq[String] =
    SqlModel.RefRe.findAllMatchIn(rawSql).map(_.group(1)).toSeq.distinct

  /** source() edges (schema, table). */
  lazy val sources: Seq[(String, String)] =
    SqlModel.SourceRe.findAllMatchIn(rawSql).map(m => (m.group(1), m.group(2))).toSeq.distinct
}

object SqlModel {
  private val ConfigRe = """(?s)\{\{\s*config\s*\((.*?)\)\s*\}\}""".r
  private[model] val RefRe = """\{\{\s*ref\s*\(\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r
  private[model] val SourceRe =
    """\{\{\s*source\s*\(\s*['"]([^'"]+)['"]\s*,\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r
  private val KvRe = """(\w+)\s*=\s*(?:'([^']*)'|"([^"]*)"|(var\s*\([^)]*\)))""".r

  private def parseConfig(sql: String): Map[String, String] =
    ConfigRe.findFirstMatchIn(sql).map { m =>
      KvRe.findAllMatchIn(m.group(1)).map { kv =>
        val value = Seq(kv.group(2), kv.group(3), kv.group(4)).find(_ != null).getOrElse("")
        kv.group(1) -> value
      }.toMap
    }.getOrElse(Map.empty)
}
