package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{ModelDag, Renderer, SqlModel}

class RendererSpec extends AnyFunSuite {

  private def r(vars: Map[String, String]) =
    new Renderer(vars, (s, t) => s"$s.$t", m => s"resolved.$m")

  test("var substitution with and without defaults") {
    assert(r(Map("x" -> "1")).render("""a {{ var("x", "9") }} b""") == "a 1 b")
    assert(r(Map.empty).render("""{{ var("x", "9") }}""") == "9")
    assertThrows[IllegalArgumentException](
      r(Map.empty).render("""{{ var("x") }}"""))
  }

  test("conditional block kept only when var present (stg_cfg_item_master.sql:21-23)") {
    val sql = """SELECT * FROM t
                |{% if var('project_id', none) is not none %}
                |WHERE project_id = '{{ var("project_id") }}'
                |{% endif %}""".stripMargin
    assert(r(Map("project_id" -> "P1")).render(sql).contains("WHERE project_id = 'P1'"))
    assert(!r(Map.empty).render(sql).contains("WHERE"))
  }

  test("source and ref resolve to qualified names") {
    assert(r(Map.empty).render("""FROM {{ source('raw', 'items') }}""") == "FROM raw.items")
    assert(r(Map.empty).render("""FROM {{ ref('stg_x') }}""") == "FROM resolved.stg_x")
  }

  test("::cast rewrite incl. VARCHAR->STRING and decimals (mart_item_master.sql:9-13)") {
    assert(Renderer.rewriteCasts("item_id::VARCHAR AS item_id")
      == "CAST(item_id AS STRING) AS item_id")
    assert(Renderer.rewriteCasts("x.qty::decimal(10,2)") == "CAST(x.qty AS DECIMAL(10,2))")
    assert(Renderer.rewriteCasts("no casts") == "no casts")
  }

  test("config header parsed and stripped; alias honored") {
    val m = SqlModel("m1",
      """{{ config(materialized='table', schema=var('tenant_id','d'), alias='mart_x') }}
        |SELECT 1""".stripMargin)
    assert(m.alias == "mart_x")
    assert(m.materialized == "table")
    val rendered = r(Map.empty).render(m)
    assert(!rendered.contains("config"))
    assert(rendered == "SELECT 1")
  }

  test("block comments stripped before execution") {
    assert(r(Map.empty).render("/* korean 설명 */ SELECT 1") == "SELECT 1")
  }

  test("model DAG: staging before mart; cycle detected") {
    val stg = SqlModel("t__stg_a", "SELECT * FROM {{ source('raw','x') }}")
    val mart = SqlModel("t__mart_b", "SELECT * FROM {{ ref('t__stg_a') }}")
    val order = ModelDag.topoSort(Seq(mart, stg)).map(_.name)
    assert(order == Seq("t__stg_a", "t__mart_b"))
    assert(ModelDag.layerOf(stg) == "staging" && ModelDag.layerOf(mart) == "mart")

    val c1 = SqlModel("a", "SELECT * FROM {{ ref('b') }}")
    val c2 = SqlModel("b", "SELECT * FROM {{ ref('a') }}")
    assertThrows[IllegalStateException](ModelDag.topoSort(Seq(c1, c2)))
  }

  test("DAG levels group ref-independent models for concurrent materialization") {
    val s1 = SqlModel("t__stg_a", "SELECT * FROM {{ source('raw','x') }}")
    val s2 = SqlModel("t__stg_b", "SELECT * FROM {{ source('raw','y') }}")
    val m1 = SqlModel("t__mart_c", "SELECT * FROM {{ ref('t__stg_a') }}")
    val m2 = SqlModel("t__mart_d",
      "SELECT * FROM {{ ref('t__stg_a') }} JOIN {{ ref('t__stg_b') }}")
    val deep = SqlModel("t__mart_e", "SELECT * FROM {{ ref('t__mart_d') }}")
    val lv = ModelDag.levels(Seq(deep, m1, m2, s1, s2)).map(_.map(_.name).toSet)
    assert(lv == Seq(Set("t__stg_a", "t__stg_b"), Set("t__mart_c", "t__mart_d"),
      Set("t__mart_e")))
  }
}
