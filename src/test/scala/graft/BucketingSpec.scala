package graft

import java.nio.file.Files

/** Bucketed-table co-located join: both sides bucketed by the join key
  * → SortMergeJoin with NO Exchange. The 100 TB pattern for repeated
  * joins on the same key (fact-to-fact joins where broadcast can't
  * apply and re-shuffling per query would dominate).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle") {
    // tables land in ./spark-warehouse (gitignored); stale locations
    // from aborted runs are cleared first
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    import scala.reflect.io.Directory
    Seq("orders_b", "customer_b").foreach { n =>
      new Directory(new java.io.File(s"spark-warehouse/$n")).deleteRecursively()
    }
    val t = Tables(spark, "/root/testdata/sf0.001")

    t.orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    t.customer.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")

    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
      .groupBy("c_mktsegment").count()

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not need an exchange: with AQE the only
    // exchange in the plan belongs to the groupBy above the join
    val joinPart = plan.split("(?i)join")(1)
    assert(!joinPart.contains("Exchange hashpartitioning(o_custkey"), plan)
    assert(!joinPart.contains("Exchange hashpartitioning(c_custkey"), plan)
    assert(joined.collect().map(_.getLong(1)).sum === 1500L)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
  }
}
