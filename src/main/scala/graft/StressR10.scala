package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TimeFunctions.tsMillis
import graft.operators.{AsOfJoin, Corpus, EventFlow, RangeJoin, Stats, Timeseries}
import graft.operators.TextStats

/** Scale validation for the r10 operators against the 200k-doc stress
  * corpus + the sf0.1 event stream (scripts/gen_stress.py). Prints
  * SCALE lines; numbers are recorded in SURVEY §6.
  */
object StressR10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/tmp/stress/documents.parquet")
    val events = spark.read.parquet("/tmp/stress/events.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    time("q107 tfidf top5 (200k docs)")(
      Corpus.tfidfTopTerms(docs, "doc_id", "text", 5).count())
    time("q110 weighted sample k=1k (200k)")(
      Corpus.weightedSample(docs, "doc_id", "n_chars", 1000).count())
    time("q114 stratified sample (200k)")(
      Corpus.weightedSamplePerStratum(docs, "source", "doc_id",
        "n_chars", 200).count())

    val ev = events.select(col("event_id"), col("event_type"),
      col("user_id"), col("ts"), col("value"))
    time("q109 zscore outliers (100k ev)")(
      Stats.zscoreOutliers(ev, "event_type", col("value"), 3.0).count())
    time("q111 MAD outliers (100k ev)")(
      Stats.madOutliers(ev, "event_type", col("value"), 10.0).count())
    time("q113 winsorize (100k ev)")(
      Stats.winsorize(ev, "event_type", col("value"), 0.05, 0.95).count())
    time("q105 mode per user-bucket")(
      Stats.modePerKey(ev.select((col("user_id") % 1000).as("b"),
        col("event_type")), "b", "event_type").count())
    time("q106 concurrency sweep")(
      EventFlow.maxConcurrency(ev, "event_type", col("ts"),
        col("ts") + expr("INTERVAL 1 HOUR")).count())
    time("q104 gap fill (daily grid)")(
      Timeseries.gapFillForward(
        ev.filter(col("event_type") === "signup")
          .groupBy((col("user_id") % 500).as("sensor"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(max(col("value")).as("reading")),
        "sensor", "day", "reading").count())
    time("q112 first-touch (purchases)")(
      AsOfJoin.firstWithin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "view"),
        keys = Seq("user_id"), tsCol = "ts",
        rightPayload = Seq("event_id"), windowMs = 30L * 60 * 1000)
        .count())
    time("q117 per-source budget (200k docs)")({
      val d = docs.select(col("doc_id"), col("source"),
        TextStats.wsTokenCount(col("text")).cast("long").as("n_tok"),
        round(TextStats.qualityScore(col("text")) * 10000).cast("long")
          .as("__qi"))
        .localCheckpoint(false)
      val budgets = d.groupBy(col("source"))
        .agg((sum(col("n_tok")) / 2).cast("long").as("__budget"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy((lit(10000L) - col("__qi")) * lit(4294967296L) +
          col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      d.withColumn("__cum", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .join(broadcast(budgets), "source")
        .filter(col("__cum") + col("n_tok") <= col("__budget")).count()
    })
    time("q118 overlap join (views x purch)")({
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          tsMillis(col("ts")).as("ms"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"),
          tsMillis(col("ts")).as("ms"))
      RangeJoin.overlapJoin(p, v, Seq("user_id"),
        "event_id", col("ms"), col("ms") + 7200000L,
        "event_id", col("ms"), col("ms") + 3600000L,
        binMs = 3600000L).count()
    })
    spark.stop()
  }
}
