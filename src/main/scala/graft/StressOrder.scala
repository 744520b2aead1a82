package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, History, TextStats}

/** Scale validation for the ordering/warehouse operators added late in
  * r8 (shuffleShards, globalRank, token-budget selection, keyProfile,
  * scd2, applyChanges) against the 200k-doc stress corpus
  * (scripts/gen_stress.py). Prints SCALE lines; numbers go to SURVEY §6.
  */
object StressOrder {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/tmp/stress/documents.parquet")
      .localCheckpoint(false)
    val events = spark.read.parquet("/tmp/stress/events.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $name%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    // --- deterministic shard shuffle: 200k docs into 256 shards ---
    time("q95 shuffleShards 200k/256")(
      Corpus.shuffleShards(docs.select(col("doc_id")), "doc_id",
        hexChars = 2).count())

    // --- exact global rank over 200k unique keys, 64 buckets ---
    val keyed = docs.select(col("doc_id"),
      xxhash64(col("doc_id")).as("__k"))
    time("q96 globalRank 200k")(
      Corpus.globalRank(keyed, "__k", "rank0").count())

    // --- token-budget selection end to end (quality + tokens + scan) ---
    time("q98 tokenBudget select 200k")({
      // localCheckpoint like the registered q98: the string-heavy
      // scoring runs once, not once per downstream action
      val d = docs.select(col("doc_id"),
        TextStats.wsTokenCount(col("text")).cast("long").as("n_tok"),
        round(TextStats.qualityScore(col("text")) * 10000).cast("long")
          .as("__qi"))
        .localCheckpoint(false)
      val budget = d.agg(sum(col("n_tok"))).head().getLong(0) / 2
      val k2 = d.select(col("doc_id"), col("n_tok"),
        ((lit(10000L) - col("__qi")) * lit(4294967296L) + col("doc_id"))
          .as("__k"))
      Corpus.prefixSum(k2, "__k", "n_tok", "__cum")
        .filter(col("__cum") + col("n_tok") <= budget).count()
    })

    // --- key profile over a skewed key (events user_id, sf0.1) ---
    time("q97 keyProfile events")(
      Corpus.keyProfile(events.select(col("user_id")), "user_id",
        k = 20).count())

    // --- SCD2 collapse over 800k snapshot rows (200k entities x 4) ---
    val snaps = docs.select(col("doc_id").as("id"),
        explode(sequence(lit(1), lit(4))).as("__d"))
      .select(col("id"),
        date_add(lit("2024-01-01").cast("date"),
          ((col("__d") - 1) * 7).cast("int")).as("snap"),
        ((col("id") + col("__d")) % 5).as("v"))
      .localCheckpoint(false)
    time("q90 scd2 800k rows/200k keys")(
      History.scd2(snaps, "id", "snap", Seq("v")).count())

    // --- incremental merge: snapshot 4 applied to the 1-3 history ---
    val hist3 = History.scd2(snaps.filter(col("snap") < "2024-01-22"),
      "id", "snap", Seq("v")).localCheckpoint(false)
    time("q102 scd2Apply 200k onto hist")(
      History.scd2Apply(hist3,
        snaps.filter(col("snap") >= "2024-01-22"), "id", "snap",
        Seq("v")).count())

    // --- q85 div-grid extraction at sf0.1 (page-size sensitivity) ---
    time("q85 divTable sf0.1 (1000 pages)")(
      SparkEntry.queries("q85_div_table")(spark, "/tmp/stress").count())

    // --- q100 entity resolution at sf0.1 (30k records, 25 blocks) ---
    time("q100 entity resolution sf0.1")(
      SparkEntry.queries("q100_entity_resolution")(spark, "/tmp/stress")
        .count())

    // --- CDC apply: 200k snapshot + 600k-change feed ---
    val base = docs.select(col("doc_id").as("id"),
      col("lang").as("v")).localCheckpoint(false)
    val feed = docs.select(col("doc_id").as("id"),
        explode(sequence(lit(1), lit(3))).as("__s"))
      .select(col("id"), concat(lit("v"), col("__s")).as("v"),
        col("__s").cast("long").as("seq"),
        when((col("id") + col("__s")) % 7 === 0, lit("D"))
          .otherwise(lit("U")).as("op"))
      .localCheckpoint(false)
    time("q93 applyChanges 200k+600k")(
      History.applyChanges(base, feed, "id", "seq", "op").count())

    spark.stop()
  }
}
