package graft

import org.apache.spark.sql.functions._

/** q56's sketch aggregates have no cross-engine oracle (HLL++/KLL
  * internals are engine-specific), so the check is an error bound
  * against the exact answers on the same data. */
class ApproxSpec extends SparkSpec {

  test("approx distinct + percentiles stay within bounds of exact") {
    val orders = Tables(spark, "/root/testdata/sf0.001").orders
    val exact = orders.groupBy("o_orderpriority").agg(
      countDistinct(col("o_custkey")).as("n"),
      expr("percentile(o_totalprice, 0.5)").as("p50"),
      expr("percentile(o_totalprice, 0.99)").as("p99"))
    val approx = orders.groupBy("o_orderpriority").agg(
      approx_count_distinct(col("o_custkey"), rsd = 0.02).as("an"),
      expr("approx_percentile(o_totalprice, 0.5, 10000)").as("ap50"),
      expr("approx_percentile(o_totalprice, 0.99, 10000)").as("ap99"))
    val joined = exact.join(approx, "o_orderpriority").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (n, an) = (r.getAs[Long]("n"), r.getAs[Long]("an"))
      assert(math.abs(an - n) <= math.max(1, 0.1 * n),
        s"distinct ${r.get(0)}: exact $n approx $an")
      // accuracy 10000 -> rank error <= group_size/10000: effectively
      // exact at this SF, allow a tiny relative slack anyway
      val (p50, ap50) = (r.getAs[Double]("p50"), r.getAs[Double]("ap50"))
      val (p99, ap99) = (r.getAs[Double]("p99"), r.getAs[Double]("ap99"))
      assert(math.abs(ap50 - p50) / p50 < 0.02, s"p50 $p50 vs $ap50")
      assert(math.abs(ap99 - p99) / p99 < 0.02, s"p99 $p99 vs $ap99")
    }
  }

  test("sketch aggregation is map-side combinable (partial agg present)") {
    val orders = Tables(spark, "/root/testdata/sf0.001").orders
    val plan = orders.groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey")))
      .queryExecution.executedPlan.toString
    // partial HLL aggregation before the exchange = constant-size
    // shuffle state per (group, partition)
    assert(plan.contains("partial_approx_count_distinct"), plan)
  }
}
