package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup, Graph, SetSimilarity}

/** sf1 (10x) scale points for the heavy-shuffle family the r14 gate
  * did NOT cover — q133 triangles (the suite's slowest query and the
  * r14 verdict's top item), q87 span dedup, q153 containment join,
  * q172 order-4 LM quality. StressR12/R14 protocol (replica
  * construction, warm-up + median-of-3 at 1x / lower-of-2 at 10x,
  * xxhash64-forced outputs, partitions pinned at 32); entries MERGE
  * into bench_baseline_sf1.json on SPARK_GRAFT_BENCH_WRITE_BASELINE=1.
  *
  * Replicas:
  * - documents: StressR14's positional 30% word substitution.
  * - lineitem (q133): BOTH keys offset per copy — ten disjoint
  *   co-purchase graphs, i.e. 10x edges of the same local structure
  *   (at a real sf1 both orders and parts scale, so disjoint growth
  *   is the honest shape; a shared-parts replica would DENSIFY the
  *   graph superlinearly instead of scaling it).
  *
  * q133 is measured twice:
  * - `q133_triangles` — the registered operator: at 1x the 1.2M-edge
  *   graph resolves on the DRIVER (r15 fast path), at 10x the 12M-edge
  *   graph exceeds DriverGraphMaxEdges and runs the distributed wedge
  *   plan. The exponent therefore mixes the two paths by DESIGN —
  *   it is the real cost step a user crossing the bound pays.
  * - `q133_triangles_dist` — driverMaxEdges=0 at both scales: the
  *   clean distributed-plan exponent, and (at 1x, same JVM, same
  *   input) the A/B that quantifies what the driver path saves.
  */
object StressR15 {

  private val Vocab = Seq(
    "key", "agg", "row", "scan", "slow", "fast", "table", "value",
    "part", "hash", "merge", "batch", "spark", "a", "the", "line",
    "sort", "window", "customer", "query", "big", "data", "column",
    "join", "small", "stream", "order", "group", "filter", "vector",
    "of")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val copies = spark.range(10).select(col("id").as("__copy"))
    val Off = 100000000L

    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val vocabLit = typedlit(Vocab)
    val perturbed = array_join(
      transform(split(col("text"), " "), (w, i) =>
        when(pmod(hash(col("__copy"), i), lit(10)) < 3,
          element_at(vocabLit,
            (pmod(hash(col("__copy"), i, lit(7)), lit(Vocab.size)) + 1)
              .cast("int")))
          .otherwise(w)), " ")
    val docs10 = docs1.crossJoin(copies)
      .select((col("doc_id") + col("__copy") * Off).as("doc_id"),
        when(col("__copy") === 0, col("text")).otherwise(perturbed)
          .as("text"))
      .repartition(32).localCheckpoint()

    val li1 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).localCheckpoint()
    val li10 = li1.crossJoin(copies)
      .select((col("l_orderkey") + col("__copy") * Off).as("l_orderkey"),
        (col("l_partkey") + col("__copy") * Off).as("l_partkey"))
      .repartition(32).localCheckpoint()

    Seq(docs1, docs10, li1, li10).foreach(_.count())

    def force(df: DataFrame): Long =
      df.agg(sum(xxhash64(struct(col("*")))).as("h"),
        count(lit(1)).as("n")).head().getLong(1)

    final case class M(name: String, t1: Double, t10: Double,
        rows1: Long, rows10: Long) {
      def exponent: Double = math.log10(t10 / t1)
    }
    val out = scala.collection.mutable.ListBuffer.empty[M]

    def measure(name: String)(f: DataFrame => DataFrame,
        in1: DataFrame, in10: DataFrame): Unit = {
      def run(in: DataFrame, timed: Int): (Double, Long) = {
        force(f(in))
        val s = (1 to timed).map { _ =>
          val t0 = System.nanoTime()
          val n = force(f(in))
          ((System.nanoTime() - t0) / 1e9, n)
        }
        // timed=2 takes the LOWER of two passes — StressR12's gate
        // convention (the tighter healthy estimate on a noisy box)
        (s.map(_._1).sorted.apply((timed - 1) / 2), s.head._2)
      }
      spark.catalog.clearCache()
      val (t1, n1) = run(in1, 3)
      val (t10, n10) = run(in10, 2)
      val m = M(name, t1, t10, n1, n10)
      out += m
      println(f"SCALE ${m.name}%-24s 1x ${m.t1}%7.2f s (${m.rows1}%9d rows)" +
        f"  10x ${m.t10}%8.2f s (${m.rows10}%10d rows)" +
        f"  exponent ${m.exponent}%5.2f")
    }

    def coPurchase(li: DataFrame): DataFrame = {
      val op = li.select(col("l_orderkey").as("o"),
        col("l_partkey").as("p")).distinct()
      val o2 = op.select(col("o").as("__o2"), col("p").as("__p2"))
      op.join(o2, col("o") === col("__o2") && col("p") < col("__p2"))
        .select(col("p").as("pa"), col("__p2").as("pb"))
    }

    // q133 as registered: driver path at 1x (1.2M edges < 2M bound),
    // distributed plan at 10x (12M edges)
    measure("q133_triangles")(
      li => Graph.triangles(coPurchase(li), "pa", "pb"), li1, li10)
    // q133 pinned to the distributed plan at BOTH scales: the clean
    // plan exponent + the same-JVM 1x A/B vs the row above
    measure("q133_triangles_dist")(
      li => Graph.triangles(coPurchase(li), "pa", "pb",
        driverMaxEdges = 0L), li1, li10)

    // q87: span dedup — 8-gram hashes shuffle, text never does
    measure("q87_span_dedup")(
      d => Dedup.dropDuplicateSpans(d, "doc_id", "text",
        gramN = 8, minDocs = 2), docs1, docs10)

    // q153: exact containment join (prefix filter + token index)
    measure("q153_containment")(
      d => SetSimilarity.containmentJoin(d, "doc_id",
        Dedup.shinglesCol(d, col("text"), 3), tauNum = 4, tauDen = 5),
      docs1, docs10)

    // q172: order-4 Stupid Backoff LM quality (reference slice fixed
    // at the 1x docs 0-99 — the model is bounded, the corpus scales)
    measure("q172_lm_4gram")(
      d => Corpus.lmQualityScoreN(d, "doc_id", "text",
        reference = docs1.filter(col("doc_id") < 100),
        refTextCol = "text", n = 4), docs1, docs10)

    println("SCALE exponents (log10(t10/t1); 1.0 = linear): " +
      out.map(m => f"${m.name}=${m.exponent}%.2f").mkString(", "))

    // ---- sf1 gate: diff against the committed file; MERGE on write
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // repo-root anchor + same-sf guard (the Bench fold discipline —
    // the committed sf1 file must never be read from/written to a
    // stray CWD, nor have its sf0.1-derived entries clobbered by a
    // dev run at another scale factor)
    val basePath = sys.env.get("SPARK_GRAFT_SF1_BASELINE")
      .map(java.nio.file.Paths.get(_).toAbsolutePath)
      .getOrElse(Bench.repoRootPath.resolve("bench_baseline_sf1.json"))
    def readField(field: String): Map[String, Double] =
      if (!java.nio.file.Files.exists(basePath)) Map.empty
      else try {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = om.readTree(java.nio.file.Files.readString(basePath))
        val node = root.get(field)
        if (node == null || !node.isObject) Map.empty
        else {
          import scala.jdk.CollectionConverters._
          node.properties().asScala
            .map(e => e.getKey -> e.getValue.asDouble()).toMap
        }
      } catch { case _: Throwable => Map.empty }
    val baseSf =
      if (!java.nio.file.Files.exists(basePath)) None
      else try {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        Option(om.readTree(java.nio.file.Files.readString(basePath))
          .get("sf")).map(_.asText())
      } catch { case _: Throwable => None }
    val sameSf = baseSf.forall(_ == sfDir)
    def readMaps(field: String): Map[String, Double] =
      if (sameSf) readField(field) else Map.empty
    if (!sameSf)
      println(s"SCALE baseline sf ${baseSf.get} != $sfDir - gate " +
        "skipped and merge disabled (a dev-scale run must not " +
        "clobber the committed record)")
    val baseMed = readMaps("queries")
    if (baseMed.nonEmpty) {
      val regs = out.flatMap { m =>
        baseMed.get(m.name).collect {
          case bm if m.t10 / math.max(bm, 0.05) > 2.0 &&
            m.t10 - bm > 0.5 =>
            (m.name, m.t10 / math.max(bm, 0.05), bm)
        }
      }
      regs.foreach { case (n, ratio, bm) =>
        println(f"SCALE GATE $n: ${ratio}%.1fx sf1 baseline ($bm%.2f s)")
      }
      if (regs.isEmpty) println("SCALE GATE clean: all 10x medians " +
        s"with a committed point are within 2x of $basePath")
    }
    if (sys.env.get("SPARK_GRAFT_BENCH_WRITE_BASELINE").contains("1")
        && sameSf) {
      // merge: keep every existing entry, overwrite/add this run's
      val mergedQ = baseMed ++ out.map(m => m.name -> m.t10)
      val mergedE = readMaps("exponents") ++
        out.map(m => m.name -> m.exponent)
      def obj(m: Map[String, Double]): String =
        m.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" + num(v) }
          .mkString("{", ",", "}")
      java.nio.file.Files.writeString(basePath,
        s"""{"sf":"$sfDir","queries":${obj(mergedQ)},""" +
          s""""exponents":${obj(mergedE)},""" +
          s""""protocol":"StressR12/R14/R15 10x points (lower of 2 passes)"}""")
      println(s"SCALE baseline merged: $basePath")
    }
    spark.stop()
  }
}
