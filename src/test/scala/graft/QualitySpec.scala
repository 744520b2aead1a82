package graft

import org.apache.spark.sql.functions._
import graft.operators.Expectations

/** Expectations rule semantics (q143) and the bounded top-k aggregate
  * (q144) pinned against definitional recomputations. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("check: all rules count in one pass; nulls are conservative violations") {
    val df = Seq(
      (Some(5.0), Some("A")),
      (Some(200.0), Some("B")),   // out of range
      (None, Some("A")),          // null value → in_range + positive violate
      (Some(-1.0), None)          // negative + null flag
    ).toDF("v", "flag")
    val got = report(Expectations.check(df, Seq(
      Expectations.notNull("v"),
      Expectations.inRange("v", 0.0, 100.0),
      Expectations.positive("v"),
      Expectations.notNull("flag"),
      Expectations.matches("flag", "^[AB]$"))))
    assert(got("not_null(v)") === ((4L, 1L)))
    assert(got("in_range(v,0.0,100.0)") === ((4L, 3L))) // 200, null, -1
    assert(got("positive(v)") === ((4L, 2L)))           // null, -1
    assert(got("not_null(flag)") === ((4L, 1L)))
    assert(got("matches(flag)") === ((4L, 1L)))         // null flag only
  }

  test("check: one scan — a single aggregate node, no per-rule jobs") {
    val df = Seq((1.0, "x")).toDF("v", "flag")
    val plan = Expectations.check(df, Seq(
      Expectations.notNull("v"), Expectations.positive("v"),
      Expectations.matches("flag", "x"))).queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size === 1, s"expected ONE aggregate, got ${aggs.size}")
  }

  test("uniqueCheck counts every extra row of a duplicated key") {
    val df = Seq((1L, 1L), (1L, 1L), (1L, 1L), (2L, 1L), (3L, 2L))
      .toDF("a", "b")
    val got = report(Expectations.uniqueCheck("unique(a,b)", df, Seq("a", "b")))
    assert(got("unique(a,b)") === ((5L, 2L))) // (1,1) ×3 → 2 extras
  }

  test("fkCheck flags orphans including null keys") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = report(Expectations.fkCheck("fk", child, "k", parent, "pk"))
    assert(got("fk") === ((4L, 2L))) // 99 and null
  }

  test("topk_pairs ≡ window top-k incl. ord ties broken by payload") {
    // deliberate ord collisions (mod 20) to exercise the tie-break
    val rows = (1L to 500L).map(i => (s"g${i % 5}", (i * 7) % 20, i))
    val df = rows.toDF("g", "ord", "pay")
    val agg = df.groupBy(col("g"))
      .agg(expr("topk_pairs(ord, pay, 4)").as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), (col("pos") + 1).as("rnk"),
        col("col.ord").as("ord"), col("col.payload").as("pay"))
      .as[(String, Int, Long, Long)].collect().toSet
    val win = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("g"))
        .orderBy(col("ord").desc, col("pay"))
      df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 4)
        .select(col("g"), col("rnk"), col("ord"), col("pay"))
        .as[(String, Int, Long, Long)].collect().toSet
    }
    assert(agg === win)
  }

  test("topk_pairs: k larger than the group returns the whole group sorted") {
    val df = Seq(("g", 3L, 30L), ("g", 1L, 10L), ("g", 2L, 20L))
      .toDF("g", "ord", "pay")
    val got = df.groupBy(col("g"))
      .agg(expr("topk_pairs(ord, pay, 10)").as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.ord")).as[Long].collect().toSeq
    assert(got === Seq(3L, 2L, 1L))
  }

  test("topk_pairs: null ord or payload rows are skipped; empty group is null") {
    val df = Seq((Some(1L), Some(10L)), (None, Some(20L)), (Some(3L), None))
      .toDF("ord", "pay")
    val got = df.agg(expr("topk_pairs(ord, pay, 5)").as("t"))
      .select(size(col("t"))).as[Int].head()
    assert(got === 1)
    val empty = spark.range(0)
      .selectExpr("id AS ord", "id AS pay")
      .agg(expr("topk_pairs(ord, pay, 3)").as("t"))
    assert(empty.head().isNullAt(0))
  }
}
