package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, SetSimilarity}

/** sf1 scale stress for the heavy family (r11 verdict ask #5): the
  * SURVEY's O(E^1.5)/output-bound claims were extrapolated from ONE
  * scale point (sf0.1). This main measures q53/q124/q153/q89/q133/
  * q150's operators at sf0.1 AND at a 10x ("sf1-equivalent") scale-up
  * and prints the measured scaling exponent log10(t10/t1) — numbers
  * go to SURVEY §6.
  *
  * The 10x inputs replicate sf0.1 with the driver's own generative
  * statistics rather than inventing a new distribution:
  * - TPC-H graph inputs (lineitem/orders) replicate 10x into DISJOINT
  *   key bands (orderkey/partkey/custkey/suppkey + copy * 1e8). True
  *   sf1 TPC-H grows the part/customer catalogs 10x while holding
  *   per-key degree constant, so 10 disjoint copies reproduce sf1's
  *   degree distribution exactly; what they omit is sparse random
  *   cross-band mixing, which only REDUCES locality effects the
  *   operators don't exploit anyway (all are hash-partitioned).
  * - documents replicate 10x with a positional 30% word substitution
  *   keyed by (copy, position) ONLY — two near-duplicate docs in a
  *   copy receive identical substitutions wherever they already
  *   agreed, so every planted near-dup pair survives in every copy
  *   (dup pairs scale exactly 10x, as at real sf1) while cross-copy
  *   pairs diverge in ~50% of words and stay below threshold.
  *
  * shuffle.partitions stays at the bench's 32 for BOTH scales — the
  * controlled variable is data volume, not parallelism; a real sf1
  * deployment would scale partitions with the data.
  *
  * Timing: warm-up + median of 3 (1x) / median of 2 (10x — each pass
  * is tens of seconds and the median guards the artifact against a
  * single stall). The action aggregates xxhash64 over every output
  * column (a bare count() lets Catalyst prune the expensive
  * projections — the q152 lesson).
  */
object StressR12 {

  // the sf0.1 corpus vocabulary (31 words), for the substitution text
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
    import spark.implicits._

    val copies = spark.range(10).select(col("id").as("__copy"))
    val Off = 100000000L

    // ---- corpus at 1x and 10x --------------------------------------
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

    // ---- TPC-H graph inputs at 1x and 10x --------------------------
    val li1 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .localCheckpoint()
    val li10 = li1.crossJoin(copies)
      .select((col("l_orderkey") + col("__copy") * Off).as("l_orderkey"),
        (col("l_partkey") + col("__copy") * Off).as("l_partkey"),
        (col("l_suppkey") + col("__copy") * Off).as("l_suppkey"))
      .repartition(32).localCheckpoint()
    val ord1 = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey")).localCheckpoint()
    val ord10 = ord1.crossJoin(copies)
      .select((col("o_orderkey") + col("__copy") * Off).as("o_orderkey"),
        (col("o_custkey") + col("__copy") * Off).as("o_custkey"))
      .repartition(32).localCheckpoint()

    // force the checkpoints before any timing
    Seq(docs1, docs10, li1, li10, ord1, ord10).foreach(_.count())

    // the q133/q150 co-purchase edge build (part-part via shared order)
    def coPurchase(li: DataFrame): DataFrame = {
      val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val o2 = op.select(col("o").as("__o2"), col("p").as("__p2"))
      op.join(o2, col("o") === col("__o2") && col("p") < col("__p2"))
        .select(col("p").as("pa"), col("__p2").as("pb"))
    }
    def custSuppEdges(ord: DataFrame, li: DataFrame): DataFrame =
      ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (lit(1000000L) + col("l_suppkey")).as("dst"))

    // aggregate every output column so nothing prunes
    def force(df: DataFrame): Long = {
      val h = df.agg(sum(xxhash64(struct(col("*")))).as("h"),
        count(lit(1)).as("n")).head()
      h.getLong(1)
    }

    final case class M(name: String, t1: Double, t10: Double,
        rows1: Long, rows10: Long) {
      def exponent: Double = math.log10(t10 / t1)
    }
    val out = scala.collection.mutable.ListBuffer.empty[M]

    def measure(name: String)(f: DataFrame => DataFrame,
        in1: DataFrame, in10: DataFrame): Unit = {
      def run(in: DataFrame, timed: Int): (Double, Long) = {
        force(f(in)) // warm-up
        val samples = (1 to timed).map { _ =>
          val t0 = System.nanoTime()
          val n = force(f(in))
          ((System.nanoTime() - t0) / 1e9, n)
        }
        (samples.map(_._1).sorted.apply((timed - 1) / 2), samples.head._2)
      }
      val (t1, n1) = run(in1, 3)
      val (t10, n10) = run(in10, 2)
      val m = M(name, t1, t10, n1, n10)
      out += m
      println(f"SCALE ${m.name}%-22s 1x ${m.t1}%7.2f s (${m.rows1}%9d rows)" +
        f"  10x ${m.t10}%8.2f s (${m.rows10}%10d rows)" +
        f"  exponent ${m.exponent}%5.2f")
    }

    measure("q53_drop_near_dups")(
      d => Dedup.dropNearDuplicates(d, "doc_id", "text",
        shingleN = 3, numHashes = 48, bands = 16, threshold = 0.5),
      docs1, docs10)
    measure("q124_jaccard_join")(
      d => SetSimilarity.jaccardJoin(d, "doc_id",
        Dedup.shinglesCol(d, col("text"), 3), tauNum = 2, tauDen = 5),
      docs1, docs10)
    measure("q153_containment")(
      d => SetSimilarity.containmentJoin(d, "doc_id",
        Dedup.shinglesCol(d, col("text"), 3), tauNum = 4, tauDen = 5),
      docs1, docs10)
    measure("q133_triangles")(
      li => Graph.triangles(coPurchase(li), "pa", "pb"),
      li1, li10)
    measure("q150_communities")(
      li => {
        val e = coPurchase(li)
          .filter((col("pa") * 1000003L + col("pb")) % 5 === 0)
          .select(col("pa").as("src"), col("pb").as("dst"))
        Graph.labelPropagation(e, "src", "dst", iterations = 5)
      },
      li1, li10)
    // q89's operator input is the orders x lineitem bipartite graph;
    // measure takes the lineitem side and joins the matching orders
    measure("q89_pagerank")(
      li => {
        val ord = if (li eq li10) ord10 else ord1
        Graph.pageRank(custSuppEdges(ord, li), "src", "dst",
          iterations = 10, undirected = true)
      },
      li1, li10)

    println("SCALE exponents (log10(t10/t1); 1.0 = linear): " +
      out.map(m => f"${m.name}=${m.exponent}%.2f").mkString(", "))

    // ---- sf1 regression gate (r12 verdict ask #8) --------------------
    // The sf0.1 bench gate can't catch a SUPER-LINEAR regression — it
    // appears at 10x, not 1x. Diff this run's 10x medians against the
    // committed bench_baseline_sf1.json with Bench's thresholds
    // (> 2x AND +0.5 s absolute); refresh the baseline on a healthy
    // window with SPARK_GRAFT_BENCH_WRITE_BASELINE=1.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val basePath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SF1_BASELINE", "bench_baseline_sf1.json"))
      .toAbsolutePath
    if (java.nio.file.Files.exists(basePath))
      Bench.readBaseline(basePath).foreach { case (_, baseMed, _) =>
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
          s"within 2x of $basePath")
      }
    if (sys.env.get("SPARK_GRAFT_BENCH_WRITE_BASELINE").contains("1")) {
      val qs = out.map(m => "\"" + m.name + "\":" + num(m.t10))
        .mkString("{", ",", "}")
      val ex = out.map(m => "\"" + m.name + "\":" + num(m.exponent))
        .mkString("{", ",", "}")
      java.nio.file.Files.writeString(basePath,
        s"""{"sf":"$sfDir","queries":$qs,"exponents":$ex,""" +
          s""""protocol":"StressR12 10x points (lower of 2 passes - """ +
          s"""the tighter healthy estimate; gate compares like-with-like)"}""")
      println(s"SCALE baseline written: $basePath")
    }
    spark.stop()
  }
}
