package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scan-pushdown audit: the date-range predicates of the roster/pricing
  * queries must reach the parquet scan as PushedFilters — at 100 TB the
  * difference between a pruned scan and a full read. A regression that
  * wraps the stored column in a function (to_date, year) silently
  * forfeits row-group pruning; this spec pins the plan shape.
  */
class PushdownSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** All parquet scans in the executed plan with their pushed filters. */
  private def pushedFilters(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect { case s: FileSourceScanExec => s } ++
      plan.collect { case a: AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case s: FileSourceScanExec => s }
      }.flatten
    scans.map(_.metadata.getOrElse("PushedFilters", ""))
  }

  private def assertDatePushed(df: DataFrame, col: String): Unit = {
    val pushed = pushedFilters(df)
    assert(
      pushed.exists(f =>
        (f.contains(s"GreaterThanOrEqual($col") || f.contains(s"LessThan($col")) &&
          !f.contains(s"$col]")), // guard against empty-list match
      s"expected range filter on $col in PushedFilters, got: ${pushed.mkString(" | ")}")
  }

  test("q10 ship-date range reaches the lineitem scan") {
    assertDatePushed(SparkEntry.queries("q10_pricing_summary")(spark, sf), "l_shipdate")
  }

  test("q05 order-date range reaches the orders scan") {
    assertDatePushed(SparkEntry.queries("q05_election_candidates")(spark, sf), "o_orderdate")
  }

  test("q44 order-date range reaches the orders scan") {
    assertDatePushed(SparkEntry.queries("q44_roster_query")(spark, sf), "o_orderdate")
  }
}
