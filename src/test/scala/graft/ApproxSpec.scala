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

  // --- DDSketch quantile rollup (q139): relative-error bound vs the
  // exact quantiles, BYTE-exact daily-union ≡ direct, edge semantics.

  test("dd sketch (q139): every quantile within the alpha relative-error bound") {
    import spark.implicits._
    // heavy-tailed fixture: the distribution shape sketches exist for
    val xs = (1 to 20000).map(i =>
      math.round(math.exp((i % 997).toDouble / 90.0) * 100))
    val df = xs.map(Tuple1(_)).toDF("v")
    val alpha = 0.01
    val qs = Seq(0.1, 0.5, 0.9, 0.95, 0.99)
    val sk = df.agg(expr(s"dd_sketch_agg(v, ${alpha}D)").as("sk"))
    val got = sk.select(
      qs.map(q => expr(s"dd_quantile(sk, ${q}D)").as(s"q$q")): _*)
      .head
    val sorted = xs.sorted
    qs.zipWithIndex.foreach { case (q, i) =>
      val exact = sorted(
        math.max(0, math.ceil(q * sorted.size).toInt - 1)).toDouble
      val est = got.getDouble(i)
      assert(math.abs(est - exact) / exact <= alpha + 1e-9,
        s"q=$q exact=$exact est=$est")
    }
  }

  test("dd sketch: union of daily sketches is BYTE-identical to the direct sketch") {
    val orders = Tables(spark, "/root/testdata/sf0.001").orders
      .select(to_date(col("o_orderdate")).as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .withColumn("week",
        date_format(date_trunc("week", col("day")), "yyyy-MM-dd"))
    val viaDaily = orders.groupBy("day", "week")
      .agg(expr("dd_sketch_agg(cents, 0.02D)").as("sk"))
      .groupBy("week").agg(expr("dd_union_agg(sk)").as("u"))
    val direct = orders.groupBy("week")
      .agg(expr("dd_sketch_agg(cents, 0.02D)").as("d"))
    val joined = viaDaily.join(direct, "week").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (u, d) = (r.getAs[Array[Byte]]("u"), r.getAs[Array[Byte]]("d"))
      assert(java.util.Arrays.equals(u, d),
        s"week ${r.get(0)}: rollup sketch differs from direct — merge lossy")
    }
  }

  test("dd sketch: zero bucket is exact; empty input yields null") {
    import spark.implicits._
    val df = (Seq.fill(70)(0L) ++ Seq.fill(30)(1000L)).map(Tuple1(_)).toDF("v")
    val r = df.agg(
      expr("dd_quantile(dd_sketch_agg(v, 0.01D), 0.5D)").as("p50"),
      expr("dd_quantile(dd_sketch_agg(v, 0.01D), 0.9D)").as("p90")).head
    assert(r.getDouble(0) === 0.0) // rank 50 falls in the exact zero bucket
    assert(math.abs(r.getDouble(1) - 1000.0) / 1000.0 <= 0.01)
    val empty = spark.range(0).selectExpr("id AS v")
      .agg(expr("dd_sketch_agg(v, 0.01D)").as("sk"))
      .selectExpr("dd_quantile(sk, 0.5D) AS p").head
    assert(empty.isNullAt(0))
  }

  test("dd union rejects mixed-alpha sketches loudly") {
    import spark.implicits._
    val a = Seq(1L, 2L).toDF("v").agg(expr("dd_sketch_agg(v, 0.01D)").as("sk"))
    val b = Seq(3L, 4L).toDF("v").agg(expr("dd_sketch_agg(v, 0.02D)").as("sk"))
    val ex = intercept[Exception] {
      a.union(b).agg(expr("dd_union_agg(sk)")).collect()
    }
    assert(ex.getMessage != null)
  }
}
