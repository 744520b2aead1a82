package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Ann

/** r18 evidence harness — sections selected by args(0)
  * (`sf1ann` | `selectab` | `all`, default `all`):
  *
  * 1. `sf1ann` — 10x scale points for the ENTIRE ANN family under the
  *    r18 bounded-aggregate candidate selection (the r17 verdict's #2
  *    asked that the q66/q189/q190 bench medians not regress; the
  *    stronger claim worth committing is the 10x EXPONENT, because
  *    the selection change attacks exactly the term that grows with
  *    corpus size — the scored-candidate exchange). Same recipe as
  *    StressR17.sf1Opq: the sf0.1 embeddings table replicated 10x
  *    with fresh ids + a tiny per-copy perturbation, written as a
  *    data dir so the REGISTERED queries run unmodified. Includes
  *    r18's q192 (the serving-only SQ8 row's sf1 point — the r17
  *    verdict's #7 done-condition). Entries merge into
  *    `bench_baseline_sf1.json` on SPARK_GRAFT_BENCH_WRITE_BASELINE=1
  *    (the StressR16 merge discipline).
  *
  * 2. `selectab` — the selection change itself, isolated: the same
  *    registered rung run with the topk_any aggregate (the shipped
  *    path) vs the row_number window (via [[Ann.withWindowSelect]] —
  *    same session, same data, plans constructed per arm), arms
  *    INTERLEAVED A/B/A/B so a window shift lands on both equally
  *    (the StressR16 lesson: short-JVM A/Bs read 1.5-2.5x vs full-run
  *    records, so judge the RATIO, never the absolute). Measured at
  *    1x and at 10x — the exchange the aggregate removes grows with
  *    the corpus, so the gap should WIDEN at 10x.
  *    Artifact: `stress_r18_selectab.json`.
  */
object StressR18 {

  /** The reworked family: every ANN rung with a bench row, plus the
    * two persisted serving rows, r18's q192 and the q193 hybrid (its
    * lexical arm reads the replicated documents table). */
  private val AnnFamily = Seq(
    "q35_ann_bruteforce", "q45_ann_ivf_pruned", "q61_ann_ivf_trained",
    "q66_ann_ivfpq", "q165_ann_ivfpq_residual", "q176_ann_opq",
    "q177_ann_opq_saved", "q188_ann_search_saved", "q189_ann_sq8",
    "q190_ann_sq8_ivf", "q191_ann_sq8_saved", "q192_ann_sq8_search_saved",
    "q193_hybrid_rrf", "q195_bm25_search", "q196_hybrid_bm25")

  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val section = args.headOption.getOrElse("all")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (mbps, attempts) = waitHealthy()
    println(f"[r18] prewarm ${mbps}%.0f MB/s after $attempts attempt(s)")

    if (section == "sf1ann" || section == "all") sf1Ann(spark)
    if (section == "selectab" || section == "all") selectAB(spark)
    spark.stop()
  }

  /** Bench's prewarm discipline at the A/B's stricter 1500 MB/s
    * evidence bar; returns the final probe's MB/s and attempt count. */
  private def waitHealthy(): (Double, Int) = {
    val attempts = scala.collection.mutable.ListBuffer.empty[(Long, Double)]
    val target = Runtime.getRuntime.maxMemory() / 2 / (1024L * 1024L)
    attempts += Bench.prewarmHeap(target, 60.0)
    def mbps(a: (Long, Double)) = if (a._2 > 0.001) a._1 / a._2 else 0.0
    while (attempts.size <= 14 && mbps(attempts.last) < 1500.0) {
      System.err.println(f"[r18] prewarm ${mbps(attempts.last)}%.0f MB/s" +
        " below the A/B's 1500 MB/s evidence bar - sleeping 30 s")
      Thread.sleep(30000)
      attempts += Bench.prewarmHeap(target, 60.0)
    }
    (mbps(attempts.last), attempts.size)
  }

  /** The StressR17 10x data dir: fresh ids per copy, tiny per-copy
    * perturbation so replicated vectors don't tie in every rerank.
    * Prefers the bench's tmpfs scratch so the measurement never
    * touches the contended device (the r18 ramdisk protocol). */
  private def tenXDir(spark: SparkSession, sfDir: String): String = {
    val base = java.nio.file.Paths.get("/dev/shm/graft_bench")
    val tmp =
      if (java.nio.file.Files.isDirectory(base.getParent) &&
          java.nio.file.Files.isWritable(base.getParent)) {
        java.nio.file.Files.createDirectories(base)
        java.nio.file.Files.createTempDirectory(base, "r18_sf1").toString
      } else java.nio.file.Files.createTempDirectory("graft_r18_sf1").toString
    val copies = spark.range(10).select(col("id").as("__copy"))
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
      .crossJoin(copies)
      .select((col("vec_id") + col("__copy") * 100000000L).as("vec_id"),
        transform(col("embedding"),
          x => (x * (lit(1.0f) + col("__copy").cast("float") *
            lit(0.0001f))).cast("float")).as("embedding"),
        col("label"))
      .repartition(32)
      .write.parquet(s"$tmp/embeddings.parquet")
    // documents too (q193's lexical arm): fresh ids per copy, a
    // per-copy suffix word so replicated docs don't tie pair-for-pair
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .crossJoin(copies)
      .select((col("doc_id") + col("__copy") * 100000000L).as("doc_id"),
        concat(col("text"), lit(" copyword"), col("__copy")).as("text"))
      .repartition(32)
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def runQuery(spark: SparkSession, name: String, dir: String,
      timed: Int): Double = {
    val fn = SparkEntry.queries(name)
    def pass(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    pass() // warm-up (q188/q192 build their per-dir fixture here)
    spark.catalog.clearCache()
    val s = (1 to timed).map { _ =>
      val t = pass(); spark.catalog.clearCache(); t
    }
    s.sorted.apply((timed - 1) / 2)
  }

  // ------------------------------------------------------------------
  // Section 1: 10x points for the ANN family under bounded selection
  // ------------------------------------------------------------------
  private def sf1Ann(spark: SparkSession): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tmp = tenXDir(spark, sfDir)
    val out = scala.collection.mutable.ListBuffer.empty[(String, Double, Double)]
    AnnFamily.filter(SparkEntry.queries.contains).foreach { q =>
      val t1 = runQuery(spark, q, sfDir, timed = 3)
      val t10 = runQuery(spark, q, tmp, timed = 2)
      out += ((q, t1, t10))
      println(f"SCALE $q%-26s 1x ${t1}%7.2f s  10x ${t10}%8.2f s" +
        f"  exponent ${math.log10(t10 / t1)}%5.2f")
    }
    if (sys.env.get("SPARK_GRAFT_BENCH_WRITE_BASELINE").contains("1")) {
      val basePath = Bench.repoRootPath.resolve("bench_baseline_sf1.json")
      def readField(field: String): Map[String, Double] =
        if (!java.nio.file.Files.exists(basePath)) Map.empty
        else {
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          val node = om.readTree(
            java.nio.file.Files.readString(basePath)).get(field)
          if (node == null || !node.isObject) Map.empty
          else {
            import scala.jdk.CollectionConverters._
            node.properties().asScala
              .map(e => e.getKey -> e.getValue.asDouble()).toMap
          }
        }
      val mergedQ = readField("queries") ++
        out.map { case (q, _, t10) => q -> t10 }
      val mergedE = readField("exponents") ++
        out.map { case (q, t1, t10) => q -> math.log10(t10 / t1) }
      def obj(m: Map[String, Double]): String =
        m.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" + num(v) }
          .mkString("{", ",", "}")
      java.nio.file.Files.writeString(basePath,
        s"""{"sf":"$sfDir","queries":${obj(mergedQ)},""" +
          s""""exponents":${obj(mergedE)},""" +
          s""""protocol":"StressR12/R14/R15/R16/R17/R18 10x points """ +
          s"""(lower of 2 passes; q133 pair interleaved; ANN family """ +
          s"""via a replicated embeddings data dir, r18 = bounded """ +
          s"""topk_any selection)"}""")
      println(s"SCALE baseline merged: $basePath")
    }
  }

  // ------------------------------------------------------------------
  // Section 2: aggregate-vs-window selection A/B, 1x and 10x
  // ------------------------------------------------------------------
  private def selectAB(spark: SparkSession): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tmp = tenXDir(spark, sfDir)
    // two rungs with different score kernels: PQ ADC and SQ8 fused dot
    val rungs = Seq("q66_ann_ivfpq", "q190_ann_sq8_ivf")
    val rounds = 3

    def onePass(name: String, dir: String, window: Boolean): Double = {
      val fn = SparkEntry.queries(name)
      def pass(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      if (window) Ann.withWindowSelect(pass()) else pass()
    }

    val results = for {
      (scale, dir) <- Seq(("1x", sfDir), ("10x", tmp))
      name <- rungs
    } yield {
      // warm both arms once (codegen + fixture), then interleave
      onePass(name, dir, window = false)
      onePass(name, dir, window = true)
      val agg = scala.collection.mutable.ListBuffer.empty[Double]
      val win = scala.collection.mutable.ListBuffer.empty[Double]
      (1 to rounds).foreach { _ =>
        agg += onePass(name, dir, window = false)
        win += onePass(name, dir, window = true)
      }
      val (ma, mw) = (agg.sorted.apply(rounds / 2), win.sorted.apply(rounds / 2))
      println(f"SELECT-AB $name%-18s $scale%-3s agg ${ma}%6.2f s  " +
        f"window ${mw}%6.2f s  ratio ${mw / ma}%5.2fx" +
        f"  (agg ${agg.map(num).mkString("/")}, win ${win.map(num).mkString("/")})")
      (name, scale, ma, mw, agg.toList, win.toList)
    }

    val art = Bench.repoRootPath.resolve("stress_r18_selectab.json")
    val body = results.map { case (n, s, ma, mw, as_, ws) =>
      s""""${n}_$s":{"agg_sec":${num(ma)},"window_sec":${num(mw)},""" +
        s""""ratio":${num(mw / ma)},""" +
        s""""agg_passes":[${as_.map(num).mkString(",")}],""" +
        s""""window_passes":[${ws.map(num).mkString(",")}]}"""
    }.mkString(",")
    java.nio.file.Files.writeString(art,
      s"""{"protocol":"interleaved A/B, same session+data, plans """ +
        s"""constructed per arm via Ann.withWindowSelect; medians of """ +
        s"""$rounds; judge the RATIO (short-JVM absolutes read high)",""" +
        body + "}")
    println(s"[r18] selectab artifact: $art")
  }
}
