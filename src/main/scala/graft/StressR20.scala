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

    // ---- q153 containment decomposition ----
    val (tauNum, tauDen) = (4, 5)
    val docs2 = docs.select(col("doc_id"), col("text"))
    val tokensCol = graft.operators.Dedup.shinglesCol(docs2, col("text"), 3)
    val sets = docs2
      .select(col("doc_id").as("__id"),
        array_distinct(transform(tokensCol, t => xxhash64(t))).as("__ts"))
      .withColumn("__n", size(col("__ts")))
      .filter(col("__n") > 0)
      .localCheckpoint(false)
    time("c153 sets build")(sets)
    val tok = sets.select(col("__id"), explode(col("__ts")).as("__t"))
    val dfreq = tok.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val ordered = tok.join(dfreq, "__t")
      .groupBy(col("__id"))
      .agg(array_sort(collect_list(struct(col("__df"), col("__t"))))
        .as("__st"))
      .select(col("__id"),
        transform(col("__st"), s => s.getField("__t")).as("__ord"))
      .withColumn("__n", size(col("__ord")))
    time("c153 ordered (dfreq+sort)")(ordered)
    val ceilTauN =
      floor((col("__n") * tauNum + lit(tauDen - 1)) / lit(tauDen))
    val a = ordered
      .withColumn("__p", (col("__n") - ceilTauN + 1).cast("int"))
      .select(col("__id"), col("__n"),
        posexplode(slice(col("__ord"), lit(1), col("__p"))))
      .withColumnsRenamed(Map("pos" -> "__ia", "col" -> "__t"))
      .select(col("__id").as("a_id"), col("__n").as("__na"),
        col("__ia"), col("__t"))
    val b = tok.select(col("__id").as("b_id"), col("__t"))
      .join(sets.select(col("__id").as("b_id"), col("__n").as("__nb")),
        "b_id")
    val cand = a.join(b, "__t")
      .filter(col("a_id") =!= col("b_id") &&
        col("__nb") * tauDen >= col("__na") * tauNum &&
        (col("__na") - col("__ia")) * tauDen >= col("__na") * tauNum)
      .select(col("a_id"), col("b_id")).distinct()
    time("c153 cand (current b-join)")(cand)
    val tokN = sets.select(col("__id"), col("__n"), explode(col("__ts")).as("__t"))
    val b2 = tokN.select(col("__id").as("b_id"), col("__n").as("__nb"), col("__t"))
    val cand2 = a.join(b2, "__t")
      .filter(col("a_id") =!= col("b_id") &&
        col("__nb") * tauDen >= col("__na") * tauNum &&
        (col("__na") - col("__ia")) * tauDen >= col("__na") * tauNum)
      .select(col("a_id"), col("b_id")).distinct()
    time("c153 cand (n carried in tok)")(cand2)
    val fa = sets.select(col("__id").as("a_id"), col("__ts").as("__ta"),
      col("__n").as("n_a"))
    val fb = sets.select(col("__id").as("b_id"), col("__ts").as("__tb"),
      col("__n").as("n_b"))
    time("c153 full (current verify)")(
      cand.join(fa, "a_id").join(fb, "b_id")
        .withColumn("inter", size(array_intersect(col("__ta"), col("__tb")))
          .cast("long"))
        .filter(col("inter") * tauDen >= lit(tauNum.toLong) * col("n_a"))
        .select(col("a_id"), col("b_id"), col("inter"),
          col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b")))
    spark.stop()
  }
}
