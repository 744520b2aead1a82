package graft

class PlansSpec extends SparkSpec {

  // range-based input so ConvertToLocalRelation can't fold the filter away
  private def base = spark.range(4).selectExpr(
    "CAST(id AS STRING) AS a",
    "CASE WHEN id = 0 THEN CAST(id AS STRING) ELSE concat(CAST(id AS STRING), 'xyz') END AS b")

  test("levenshtein threshold filter is rewritten to guarded bounded form") {
    val df = base.where("levenshtein(a, b) <= 1")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("Some(1)) >= 0"), optimized) // bounded form
    assert(optimized.toLowerCase.contains("abs("), optimized) // length guard
    assert(df.count() === 1) // only id=0 (distance 0)
  }

  test("strict less-than is rewritten with k-1 bound") {
    val df = base.where("levenshtein(a, b) < 2")
    assert(df.queryExecution.optimizedPlan.toString.contains("Some(1)) >= 0"))
    assert(df.count() === 1)
  }

  test("unrelated levenshtein uses are untouched") {
    val df = base.selectExpr("levenshtein(a, b) AS d")
    assert(!df.queryExecution.optimizedPlan.toString.contains(">= 0"))
    assert(df.orderBy("d").head.getInt(0) === 0)
  }
}
