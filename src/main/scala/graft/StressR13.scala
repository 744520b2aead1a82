package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.FuzzyMatch

/** A/B isolation for the r13 fuzzy-linkage changes: the q43 fixture
  * scored with and without the equal-fast scorer short-circuit,
  * INTERLEAVED in one JVM so host-speed drift between runs (the r12/
  * r13 records' dominant noise) cancels out of the comparison. Prints
  * per-variant medians — numbers go to SURVEY §6 / the round notes. */
object StressR13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // the q43 fixture (SparkEntry.q43's construction, verbatim shape)
    val k = col("c_custkey")
    val base = spark.read.parquet(s"$dir/customer.parquet").select(
      k.as("id"),
      concat(lit("First"), (k % 97).cast("string")).as("firstname"),
      when(k % 3 === 0,
        concat(call_function("char", lit(65) + (k % 26).cast("int")), lit("."))
      ).otherwise(lit("")).as("middlename"),
      concat(lit("Last"), (k % 53).cast("string")).as("lastname"),
      concat(lit("Nick"), (k % 41).cast("string")).as("nickname"),
      element_at(array(lit("Jr."), lit("Sr."), lit("")), (k % 3).cast("int") + 1)
        .as("suffix"),
      element_at(array(lit("U.S. House"), lit("U.S. Senate")),
        (k % 2).cast("int") + 1).as("office"),
      regexp_replace((k % 25).cast("string"), "^0+", "").as("district"),
      element_at(array(lit("Republican"), lit("Democratic"), lit("Independent")),
        (k % 3).cast("int") + 1).as("party"),
      (k % 50).cast("int").as("state_id"))
    val scraped = base.select(
      col("id").as("s_id"),
      when(col("id") % 13 === 0, col("nickname"))
        .otherwise(lower(col("firstname"))).as("firstname"),
      col("middlename"), col("lastname"), col("suffix"),
      col("office"), col("district"), col("party"), col("state_id"))
      .withColumn("__mid_lc", lower(col("middlename")))
    val roster = base.select(
      col("id").as("r_id"), col("firstname"), col("middlename"),
      col("lastname"), col("nickname"), col("suffix"),
      col("office"), col("district"), col("party"),
      col("state_id").as("r_state_id"))
      .withColumn("__mid_lc", lower(col("middlename")))
    val wr = (a: Column, b: Column) => call_function("w_ratio", a, b)
    val ptr = (a: Column, b: Column) =>
      call_function("partial_token_ratio", a, b)
    val rules = Seq(
      FuzzyMatch.Rule("firstname", Seq("firstname", "middlename", "nickname"),
        wr, threshold = 85),
      FuzzyMatch.Rule("__mid_lc", Seq("__mid_lc"), ptr, threshold = 90),
      FuzzyMatch.Rule("lastname", Seq("lastname"), wr, threshold = 88),
      FuzzyMatch.Rule("suffix", Seq("suffix"), wr, threshold = 98),
      FuzzyMatch.Rule("office", Seq("office"), wr, threshold = 100),
      FuzzyMatch.Rule("district", Seq("district"), wr, threshold = 95),
      FuzzyMatch.Rule("party", Seq("party"), wr, threshold = 100))
    def link(fast: Boolean): DataFrame = FuzzyMatch.link(
      scraped, roster, "s_id", "r_id", "state_id", "r_state_id",
      rules, requiredOverall = 75, dupMargin = 3.0, equalFast = fast)

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both plans, then interleave timed passes
    time(link(true)); time(link(false))
    val n = args.headOption.map(_.toInt).getOrElse(5)
    val fast = scala.collection.mutable.ListBuffer.empty[Double]
    val slow = scala.collection.mutable.ListBuffer.empty[Double]
    for (_ <- 1 to n) {
      fast += time(link(true))
      slow += time(link(false))
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    println(f"AB q43 equalFast=true  passes ${fast.map(x => f"$x%.2f").mkString(",")}  median ${med(fast.toSeq)}%.2f s")
    println(f"AB q43 equalFast=false passes ${slow.map(x => f"$x%.2f").mkString(",")}  median ${med(slow.toSeq)}%.2f s")

    // ---- 10x scale points for the r13 operators (StressR12 protocol:
    // disjoint replicas, fixed shuffle.partitions, medians, force via
    // xxhash64-of-every-column) ------------------------------------
    import graft.operators.Corpus
    import graft.sources.Multimodal
    val copies = spark.range(10).select(col("id").as("__copy"))
    val Off = 100000000L
    val docs1 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val docs10 = docs1.crossJoin(copies)
      .select((col("doc_id") + col("__copy") * Off).as("doc_id"),
        col("text"))
      .repartition(32).localCheckpoint()
    Seq(docs1, docs10).foreach(_.count())

    def force(df: DataFrame): Long =
      df.agg(sum(xxhash64(struct(col("*")))).as("h"),
        count(lit(1)).as("n")).head().getLong(1)
    def measure(name: String)(f: DataFrame => DataFrame): Unit = {
      def run(in: DataFrame, timed: Int): (Double, Long) = {
        force(f(in))
        val s = (1 to timed).map { _ =>
          val t0 = System.nanoTime()
          val n = force(f(in))
          ((System.nanoTime() - t0) / 1e9, n)
        }
        // timed=2 takes the LOWER of the two passes (index 0), not a
        // true median — deliberately matching StressR12's convention
        // so the sf1 gate compares like-with-like; the lower pass is
        // the tighter healthy estimate on a noisy box
        (s.map(_._1).sorted.apply((timed - 1) / 2), s.head._2)
      }
      val (t1, n1) = run(docs1, 3)
      val (t10, n10) = run(docs10, 2)
      println(f"SCALE $name%-24s 1x $t1%7.2f s ($n1%9d rows)" +
        f"  10x $t10%8.2f s ($n10%10d rows)" +
        f"  exponent ${math.log10(t10 / t1)}%5.2f")
    }

    // order-4 chain: the model side is the FIXED doc_id < 100 slice at
    // both scales (the claim under test: broadcast models do not grow
    // with the corpus — only the transition pass scales)
    measure("q172_lm4_chain")(d =>
      Corpus.lmQualityScoreN(d, "doc_id", "text",
        reference = d.filter(col("doc_id") < 100), refTextCol = "text",
        n = 4))
    // fixed-state contamination: probe slice fixed, corpus 10x — the
    // sketch is identical at both scales, the scan-speed pre-filter
    // is the only thing that grows
    measure("q49_bloom_contam")(d =>
      Corpus.contaminationBloom(d, "doc_id", "text",
        probes = d.filter(col("doc_id") < 5), probeTextCol = "text",
        n = 3))
    // bounded top-k postings: the aggregate whose buffer is 3 pairs
    // per term per task regardless of posting-list length
    measure("q138_topk_postings")(d =>
      d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"),
          expr("topk_pairs(tf, doc_id, 3)").as("__t"))
        .select(col("term"), col("df"), posexplode(col("__t"))))

    // semantic-dedup salt A/B (interleaved, same session): k=16
    // clusters on 32 threads caps the unsalted pair join at 16 busy
    // tasks and serialises the heaviest cluster's quadratic work;
    // salting spreads it. Result sets are identical by construction.
    {
      import graft.operators.Dedup
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).localCheckpoint()
      vecs.count()
      def sem(salt: Int): DataFrame =
        Dedup.semanticDedup(vecs, "vec_id", "embedding",
          k = 16, threshold = 0.35, iters = 2, saltBuckets = salt)
          .select(col("vec_id"))
      time(sem(1)); time(sem(4))
      val s1 = scala.collection.mutable.ListBuffer.empty[Double]
      val s4 = scala.collection.mutable.ListBuffer.empty[Double]
      for (_ <- 1 to n) { s1 += time(sem(1)); s4 += time(sem(4)) }
      println(f"AB q76 salt=1 passes ${s1.map(x => f"$x%.2f").mkString(",")}  median ${med(s1.toSeq)}%.2f s")
      println(f"AB q76 salt=4 passes ${s4.map(x => f"$x%.2f").mkString(",")}  median ${med(s4.toSeq)}%.2f s")
      val r1 = sem(1).orderBy("vec_id").collect().map(_.getLong(0)).toSeq
      val r4 = sem(4).orderBy("vec_id").collect().map(_.getLong(0)).toSeq
      require(r1 == r4, "salted semantic dedup diverged from unsalted")
      println(s"AB q76 salted == unsalted on ${r1.size} survivors")
    }

    // media-index probe vs CORPUS SIZE: fixed 500-asset batch probed
    // against a 5k- vs 50k-entry hash index (hash frames built
    // directly — decode cost excluded on purpose; the claim is the
    // PROBE is O(batch + candidates), corpus-size-independent)
    def hashIndex(n: Long): Multimodal.MediaHashIndex =
      Multimodal.MediaHashIndex(spark.range(n)
        .select(col("id"),
          element_at(typedlit(Seq("image", "audio", "video")),
            (pmod(col("id"), lit(3)) + 1).cast("int")).as("kind"),
          xxhash64(col("id")).as("dhash"))
        .localCheckpoint())
    val batchHashes = spark.range(500)
      .select((col("id") + 900000000L).as("b_id"),
        element_at(typedlit(Seq("image", "audio", "video")),
          (pmod(col("id"), lit(3)) + 1).cast("int")).as("kind"),
        // half the batch collides with an indexed hash, half is fresh
        when(col("id") % 2 === 0, xxhash64(col("id") * 2))
          .otherwise(xxhash64(col("id") + 777000000L)).as("dhash"))
      .localCheckpoint()
    for ((label, n) <- Seq(("5k", 5000L), ("50k", 50000L))) {
      val idx = hashIndex(n)
      idx.entries.count()
      def probe(): Long = force(
        Multimodal.probeMediaHashes(batchHashes, idx,
          maxHamming = 3, broadcastBatch = true))
      probe()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); probe()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCALE media_probe_$label%-12s median ${ts.sorted.apply(1)}%6.2f s" +
        f" (index $n%6d entries, batch 500)")
    }
    spark.stop()
  }
}
