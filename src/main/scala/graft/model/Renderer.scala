package graft.model

/** Renders a model's templated SQL into Spark SQL text.
  *
  * Implements exactly the template subset the reference's models use
  * (SURVEY.md §3.3) — this is a deliberate, explicit mini-language, not a
  * Jinja engine:
  *   - `{{ config(...) }}` header → stripped (parsed by [[SqlModel]])
  *   - `{{ var("name", "default") }}` / `{{ var("name") }}` → param value
  *     (reference: stg_cfg_to_odv_demand.sql:26-28)
  *   - `{% if var('x', none) is not none %} … {% endif %}` → body kept iff
  *     the var is set (reference: stg_cfg_item_master.sql:21-23)
  *   - `{{ source('s', 't') }}` / `{{ ref('m') }}` → qualified table names
  *     (reference: _sources.yml:3-16; mart_item_master.sql:16)
  *   - `expr::TYPE` → `CAST(expr AS TYPE)` with VARCHAR→STRING, since the
  *     reference authors Trino-dialect casts (mart_item_master.sql:9-13)
  */
final class Renderer(
    vars: Map[String, String],
    resolveSource: (String, String) => String,
    resolveRef: String => String) {

  import Renderer._

  def render(model: SqlModel): String = render(model.rawSql)

  def render(raw: String): String = {
    var sql = raw
    sql = ConfigRe.replaceAllIn(sql, "")
    sql = CommentRe.replaceAllIn(sql, "")
    // Conditional blocks: keep body (with inner var() substituted later)
    // only when the guarded var is present.
    sql = IfVarRe.replaceAllIn(sql, m => {
      val varName = m.group(1)
      if (vars.contains(varName)) java.util.regex.Matcher.quoteReplacement(m.group(2)) else ""
    })
    sql = SqlModel.SourceRe.replaceAllIn(sql,
      m => java.util.regex.Matcher.quoteReplacement(resolveSource(m.group(1), m.group(2))))
    sql = SqlModel.RefRe.replaceAllIn(sql,
      m => java.util.regex.Matcher.quoteReplacement(resolveRef(m.group(1))))
    sql = VarRe.replaceAllIn(sql, m => {
      val default = Option(m.group(2))
      val v = vars.get(m.group(1)).orElse(default).getOrElse(
        throw new IllegalArgumentException(s"undefined var '${m.group(1)}' with no default"))
      java.util.regex.Matcher.quoteReplacement(v)
    })
    sql = rewriteCasts(sql)
    sql.trim
  }
}

object Renderer {
  private val ConfigRe = """(?s)\{\{\s*config\s*\((.*?)\)\s*\}\}""".r
  private val CommentRe = """(?s)/\*.*?\*/""".r
  private val IfVarRe =
    """(?s)\{%\s*if\s+var\s*\(\s*['"](\w+)['"]\s*,\s*none\s*\)\s+is\s+not\s+none\s*%\}(.*?)\{%\s*endif\s*%\}""".r
  private val VarRe =
    """\{\{\s*var\s*\(\s*['"](\w+)['"]\s*(?:,\s*['"]([^'"]*)['"]\s*)?\)\s*\}\}""".r
  // `expr::TYPE` on identifiers / qualified columns (the only shape the
  // reference uses, mart_item_master.sql:9-13).
  private val CastRe = """([A-Za-z_][\w.]*)\s*::\s*([A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)""".r

  /** Trino `x::T` → Spark `CAST(x AS T)`; bare VARCHAR/CHAR → STRING. */
  def rewriteCasts(sql: String): String =
    CastRe.replaceAllIn(sql, m => {
      val target = m.group(2).trim.toUpperCase match {
        case "VARCHAR" | "CHAR" | "TEXT" => "STRING"
        case t => t
      }
      java.util.regex.Matcher.quoteReplacement(s"CAST(${m.group(1)} AS $target)")
    })
}
