package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config.TenantConfig
import graft.types.TypeMap
import org.apache.spark.sql.types._

class ConfigSpec extends AnyFunSuite {

  test("env var resolution: set, default, missing-no-default, mixed") {
    val env = Map("HOST" -> "db.example")
    assert(TenantConfig.resolveEnvVars("${HOST:fallback}", env) == "db.example")
    assert(TenantConfig.resolveEnvVars("${MISSING:fallback}", env) == "fallback")
    // reference contract: missing with no default -> empty string (_shared.py:51-76)
    assert(TenantConfig.resolveEnvVars("${MISSING}", env) == "")
    assert(TenantConfig.resolveEnvVars("a-${HOST}-b-${MISSING:x}-c", env) == "a-db.example-b-x-c")
    assert(TenantConfig.resolveEnvVars("no vars here", env) == "no vars here")
    // empty default is allowed: ${VAR:}
    assert(TenantConfig.resolveEnvVars("${MISSING:}", env) == "")
  }

  test("tenant yaml parses to typed config") {
    val cfg = TenantConfig.parse(graft.ops.PipelineOps.tenantYaml, Map.empty)
    assert(cfg.id == "graft_demo")
    assert(cfg.rawDatabase == "graft_demo_raw")
    assert(cfg.params == Map("p_brand" -> "Brand#4"))
    assert(cfg.source.host == "localhost") // ${GRAFT_DEMO_HOST:localhost}
    assert(cfg.tables.size == 1)
    val t = cfg.tables.head
    assert(t.sourceTable == "part")
    assert(t.tenantFilter.contains("p_brand"))
    assert(t.primaryKey == Seq("p_partkey"))
    assert(t.mode == "full")
  }

  test("unknown table mode is rejected") {
    val bad = graft.ops.PipelineOps.tenantYaml.replace("mode: full", "mode: bogus")
    assertThrows[IllegalArgumentException](TenantConfig.parse(bad, Map.empty))
  }

  test("type map round-trips the reference table") {
    assert(TypeMap.toSpark("int64") == LongType)
    assert(TypeMap.toSpark("decimal(12,3)") == DecimalType(12, 3))
    assert(TypeMap.toSpark("varchar") == StringType)
    assert(TypeMap.toSpark("no_such_type") == StringType) // fallback branch
    assert(TypeMap.toExternal(DoubleType) == "DOUBLE")
    assert(TypeMap.toExternal(DecimalType(12, 3)) == "DECIMAL(12,3)")
    assert(TypeMap.toExternal(ArrayType(FloatType)) == "VARCHAR") // fallback
    assert(TypeMap.columnDefs(StructType(Seq(
      StructField("a", LongType), StructField("b", StringType))))
      == "\"a\" BIGINT, \"b\" VARCHAR")
  }
}
