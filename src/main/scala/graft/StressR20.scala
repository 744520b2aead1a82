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
    // ---- q133 wedge-closing A/B: LongSet contains vs binary search ----
    if (args.length > 1 && args(1) == "tri") {
      val op = Tables(spark, dir).lineitem
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val o2 = op.select(col("o").as("__o2"), col("p").as("__p2"))
      val edges = op.join(o2, col("o") === col("__o2") && col("p") < col("__p2"))
        .select(col("p").as("pa"), col("__p2").as("pb"))
        .select(least(col("pa"), col("pb")).as("a"),
          greatest(col("pa"), col("pb")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
      import spark.implicits._
      val rows = edges.as[(Long, Long)].collect()
      val aL = rows.map(_._1); val bL = rows.map(_._2)
      val m = aL.length
      println(s"TRI edges $m")
      val all = (aL ++ bL).distinct.sorted
      val ids = all
      val n = ids.length
      def idxOf(id: Long): Int = java.util.Arrays.binarySearch(ids, id)
      val ea = new Array[Int](m); val eb = new Array[Int](m)
      java.util.stream.IntStream.range(0, m).parallel().forEach { j =>
        ea(j) = idxOf(aL(j)); eb(j) = idxOf(bL(j)) }
      val deg = new Array[Int](n)
      var k2 = 0
      while (k2 < m) { deg(ea(k2)) += 1; deg(eb(k2)) += 1; k2 += 1 }
      val rank = {
        val r = new Array[Int](n); val keys = new Array[Long](n)
        var i = 0
        while (i < n) { keys(i) = (deg(i).toLong << 31) | i; i += 1 }
        java.util.Arrays.sort(keys)
        i = 0
        while (i < n) { r((keys(i) & 0x7fffffffL).toInt) = i; i += 1 }
        r
      }
      val outDeg = new Array[Int](n)
      k2 = 0
      while (k2 < m) {
        if (rank(ea(k2)) < rank(eb(k2))) outDeg(ea(k2)) += 1
        else outDeg(eb(k2)) += 1
        k2 += 1
      }
      val off = new Array[Int](n + 1)
      var i0 = 0
      while (i0 < n) { off(i0 + 1) = off(i0) + outDeg(i0); i0 += 1 }
      def buildAdj(): Array[Long] = {
        val adj = new Array[Long](m); val fill = new Array[Int](n)
        var k = 0
        while (k < m) {
          val (u, v) = if (rank(ea(k)) < rank(eb(k))) (ea(k), eb(k))
            else (eb(k), ea(k))
          adj(off(u) + fill(u)) = (rank(v).toLong << 32) | v.toLong
          fill(u) += 1
          k += 1
        }
        java.util.stream.IntStream.range(0, n).parallel()
          .forEach(u => java.util.Arrays.sort(adj, off(u), off(u + 1)))
        adj
      }
      def wedgeBS(adj: Array[Long]): Long = {
        val tri = new java.util.concurrent.atomic.AtomicLong
        java.util.stream.IntStream.range(0, n).parallel().forEach { u =>
          var t0 = 0L
          val s = off(u); val t = off(u + 1); var a = s
          while (a < t) {
            val v = (adj(a) & 0xffffffffL).toInt
            var b = a + 1
            while (b < t) {
              if (java.util.Arrays.binarySearch(adj, off(v), off(v + 1),
                adj(b)) >= 0) t0 += 1
              b += 1
            }
            a += 1
          }
          tri.addAndGet(t0)
        }
        tri.get
      }
      def wedgeHash(adj: Array[Long]): Long = {
        // rebuild the r19 LongSet inline
        var cap = 16
        while (cap < m * 2) cap <<= 1
        val mask = cap - 1
        val keys = Array.fill[Long](cap)(-1L)
        def slot(kk: Long): Int = {
          var h = kk * -7046029254386353131L
          h ^= h >>> 32
          (h & mask).toInt
        }
        var k = 0
        val t0 = System.nanoTime()
        while (k < m) {
          val (u, v) = if (rank(ea(k)) < rank(eb(k))) (ea(k), eb(k))
            else (eb(k), ea(k))
          val kk = u.toLong * n + v
          var i = slot(kk)
          while (keys(i) != -1L && keys(i) != kk) i = (i + 1) & mask
          keys(i) = kk
          k += 1
        }
        println(f"  set build ${(System.nanoTime()-t0)/1e9}%.3f s")
        def contains(kk: Long): Boolean = {
          var i = slot(kk)
          while (true) {
            val v = keys(i)
            if (v == kk) return true
            if (v == -1L) return false
            i = (i + 1) & mask
          }
          false
        }
        val tri = new java.util.concurrent.atomic.AtomicLong
        java.util.stream.IntStream.range(0, n).parallel().forEach { u =>
          var t1 = 0L
          val s = off(u); val t = off(u + 1); var a = s
          while (a < t) {
            val v = (adj(a) & 0xffffffffL)
            var b = a + 1
            while (b < t) {
              val w = (adj(b) & 0xffffffffL).toInt
              if (contains(v * n + w)) t1 += 1
              b += 1
            }
            a += 1
          }
          tri.addAndGet(t1)
        }
        tri.get
      }
      for (r <- 1 to 3) {
        var t0 = System.nanoTime()
        val adj1 = buildAdj(); val c1 = wedgeBS(adj1)
        val tBS = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val adj2 = buildAdj(); val c2 = wedgeHash(adj2)
        val tH = (System.nanoTime() - t0) / 1e9
        println(f"TRI round $r: binsearch $tBS%.3f s ($c1) vs hash $tH%.3f s ($c2)")
      }
      spark.stop(); return
    }

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
