package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with a DuckDB-equivalent SQL oracle where the semantics
  * are SQL-expressible. Column names are aliased identically on both
  * sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q10(spark, "/root/testdata/sf0.001")

  // ----------------------------------------------------------------
  // B. Analytics core
  // ----------------------------------------------------------------

  /** q10: TPC-H Q1-shape pricing summary. Single hash-agg with map-side
    * partial aggregation; the date filter is pushed to the parquet scan.
    */
  private def q10(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem
      .filter(to_date(col("l_shipdate")) <= lit("2001-09-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** q04: Postgres DISTINCT ON emulation — latest order per customer.
    * Ref: queries/election_candidates_by_electionyear.sql:9. */
  private def q04(s: SparkSession, dir: String): DataFrame =
    DistinctOn(Tables(s, dir).orders,
      keys = Seq(col("o_custkey")),
      order = Seq(col("o_orderdate").desc, col("o_orderkey")))
      .select(
        col("o_custkey"),
        col("o_orderkey").as("latest_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_date"),
        round(col("o_totalprice"), 4).as("latest_price"))

  // ----------------------------------------------------------------
  // D. LLM-training-data pipeline
  // ----------------------------------------------------------------

  /** q30: exact dedup via content hash. */
  private def q30(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables(s, dir).documents, "doc_id", "text")

  // ----------------------------------------------------------------
  // Registry
  // ----------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q10_pricing_summary" -> (q10 _),
    "q04_distinct_on" -> (q04 _),
    "q30_dedup_exact" -> (q30 _)
  )

  def oracleSql: Map[String, String] = Map(
    "q10_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 4) AS sum_qty,
        | round(sum(l_extendedprice), 4) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q04_distinct_on" ->
      """SELECT o_custkey, o_orderkey AS latest_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS latest_date,
        | round(o_totalprice, 4) AS latest_price
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn = 1""".stripMargin,
    "q30_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin
  )
}
