package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def reference(sx: String): Long =
    sx.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)

  test("rolling_hash matches the reference fold, interpreted and codegen paths") {
    GraftFunctions.register(spark)
    val inputs = Seq("", "a", "hello world", "the quick brown fox", "x" * 5000)
    val df = inputs.zipWithIndex.map { case (sx, i) => (i.toLong, sx) }.toDF("id", "s")
    // codegen path (whole-stage over a projection)
    val got = df.select(col("id"), expr("rolling_hash(s)").as("h"))
      .orderBy("id").as[(Long, Long)].collect()
    got.zip(inputs).foreach { case ((_, h), sx) => assert(h == reference(sx), s"'$sx'") }
    // interpreted path (eval via filter on a literal, no codegen benefit)
    val one = spark.sql("SELECT rolling_hash('hello world') AS h").as[Long].head()
    assert(one == reference("hello world"))
    // null propagates
    val n = Seq((1L, null: String)).toDF("id", "s")
      .select(expr("rolling_hash(s)")).collect()
    assert(n.head.isNullAt(0))
  }

  test("rolling_hash agrees with the HOF formulation on ASCII corpus text") {
    GraftFunctions.register(spark)
    val docs = Tables.t(spark, sf, "documents").limit(50)
    val both = docs.select(col("doc_id"),
      expr("rolling_hash(text)").as("native"),
      expr("""aggregate(transform(sequence(1, length(text)),
              |  i -> ascii(substr(text, i, 1))),
              |  0L, (a, c) -> (a * 31 + c) % 1000000007)""".stripMargin).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("extensions class injects the function into a fresh session") {
    val ext = new graft.functions.GraftExtensions()
    val s2 = spark.newSession()
    // simulate injection (newSession shares the registry-building path)
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT rolling_hash('abc')").head().getLong(0) == reference("abc"))
    assert(ext != null) // constructible for spark.sql.extensions
  }
}
