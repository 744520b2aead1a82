package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch for optimization round 20: decompose q69 heavyHitters'
  * dominant job into its pieces and time candidate reformulations.
  * Usage: runMain graft.StressR20 [sfDir]
  */
object StressR20 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, dir).documents

    def time(label: String)(df: => DataFrame): Unit = {
      // warm
      df.write.format("noop").mode("overwrite").save()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $label min ${runs.min}%.3f s  runs ${runs.map(r => f"$r%.3f").mkString(",")}")
    }

    def grams = graft.operators.Parallelism.ensure(
      docs.select(col("text").as("__t")))
      .select(explode(graft.operators.Dedup.shingles(col("__t"), 2)).as("ngram"))

    time("grams explode only")(grams)
    time("sketch pass (approx_top_k)")(
      grams.agg(call_function("approx_top_k",
        col("ngram"), lit(400), lit(1 << 17)).as("e"))
        .select(explode(col("e")).as("x")))
    val cands = grams.agg(call_function("approx_top_k",
        col("ngram"), lit(400), lit(1 << 17)).as("e"))
      .select(explode(col("e")).as("x"))
      .select(col("x.item").as("ngram"))
    time("pass2: semi-join + count (current)")(
      grams.join(broadcast(cands), Seq("ngram"), "left_semi")
        .groupBy("ngram").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("ngram")).limit(100))
    val candList = cands.collect().map(_.getString(0)).toSeq
    time("pass2: isin literal + count")(
      grams.filter(col("ngram").isInCollection(candList))
        .groupBy("ngram").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("ngram")).limit(100))
    time("pass2: grouped-first then semi")(
      grams.groupBy("ngram").agg(count(lit(1)).as("freq"))
        .join(broadcast(cands), Seq("ngram"), "left_semi")
        .orderBy(col("freq").desc, col("ngram")).limit(100))
    spark.stop()
  }
}
