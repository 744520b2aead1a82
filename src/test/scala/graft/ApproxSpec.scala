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

  test("hll rollup (q127): union of daily sketches ≡ direct weekly sketch; error bounded") {
    // the q127 contract — a persisted day-grain sketch table rolls up
    // to ANY coarser grain loss-free (sketch union is associative),
    // so the weekly estimate via daily must equal the weekly estimate
    // computed directly from the events, and both must sit within the
    // lgK=14 error band of the exact distinct count
    val ev = Tables(spark, "/root/testdata/sf0.001").events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .withColumn("week",
        date_format(date_trunc("week", col("day")), "yyyy-MM-dd"))
    val viaDaily = ev.groupBy("day", "week")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .groupBy("week")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val direct = ev.groupBy("week")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))")
        .as("dest"))
    val exact = ev.groupBy("week")
      .agg(countDistinct(col("user_id")).as("n"))
    val joined = viaDaily.join(direct, "week").join(exact, "week").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (est, dest, n) =
        (r.getAs[Long]("est"), r.getAs[Long]("dest"), r.getAs[Long]("n"))
      assert(est === dest,
        s"week ${r.get(0)}: daily-union $est != direct $dest — merge lossy")
      assert(math.abs(est - n) <= math.max(2, 0.05 * n),
        s"week ${r.get(0)}: exact $n sketch $est")
    }
  }
}
