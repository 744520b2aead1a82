package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Classifier, Dedup}

/** sf1 (10x) scale points for the heavy family the r13 gate did NOT
  * cover — q64 incremental dedup, q84 classifier training, q66/q165
  * IVF-PQ, q76 semantic dedup (4 of the r13 record's top-8 slowest
  * had no committed 10x point). Same protocol as StressR12 (replica
  * construction, warm-up + median-of-3 at 1x / lower-of-2 at 10x,
  * xxhash64-forced outputs, partitions pinned at 32) so the numbers
  * merge into the SAME bench_baseline_sf1.json and the gate compares
  * like-with-like; this main MERGES its entries into the committed
  * file on SPARK_GRAFT_BENCH_WRITE_BASELINE=1 instead of clobbering
  * StressR12's.
  *
  * Replicas:
  * - documents: StressR12's positional 30% word substitution keyed by
  *   (copy, position) — planted near-dup pairs survive per copy,
  *   cross-copy pairs diverge.
  * - embeddings: per-copy component SIGN FLIP (s_i = ±1 keyed by
  *   hash(copy, i)) — a diagonal orthogonal reflection, so every
  *   within-copy dot product, norm and cosine is preserved EXACTLY
  *   (each copy is a geometric clone) while cross-copy dots become
  *   random-sign sums centered on 0 regardless of the corpus's own
  *   correlation structure (a circular shift was tried first and
  *   failed — these synthetic vectors stay correlated under shifts).
  *   Caveat, measured and accepted: at q76's registered τ = 0.35 the
  *   cross-copy cosine NOISE (σ ≈ 1/√d = 0.125) still passes ~0.25%
  *   of the within-cluster candidate pairs, and transitive closure
  *   chains the ~11k expected groups into ~50 giant ones — so the
  *   10x point exercises MORE clustering work than a real sf1 corpus
  *   would (a conservative gate bound, not an optimistic one). Real
  *   768-dim corpora at production τ ≥ 0.9 sit many more σ out.
  */
object StressR14 {

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

    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val flipped = zip_with(col("embedding"),
      sequence(lit(0), size(col("embedding")) - 1),
      (x, i) => when(pmod(hash(col("__copy"), i), lit(2)) === 0, x)
        .otherwise(-x))
    val emb10 = emb1.crossJoin(copies)
      .select((col("vec_id") + col("__copy") * Off).as("vec_id"),
        when(col("__copy") === 0, col("embedding")).otherwise(flipped)
          .as("embedding"))
      .repartition(32).localCheckpoint()

    Seq(docs1, docs10, emb1, emb10).foreach(_.count())

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

    // q64: the registered shape end to end — index BUILD over the
    // corpus slice + batch probe (build is the linear part; the
    // O(batch+candidates) probe claim is pinned separately by the
    // media-index flatness test in StressR13)
    measure("q64_dedup_incremental")(
      d => {
        val index = Dedup.buildMinhashIndex(
          d.filter(col("doc_id") % 4 =!= 0), "doc_id", "text",
          shingleN = 3, numHashes = 32, bands = 8).materialize()
        Dedup.incrementalDedup(
          d.filter(col("doc_id") % 4 === 0), index, "doc_id", "text",
          shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)._1
      }, docs1, docs10)

    // q84: full-batch training (iters x corpus scans, bounded
    // gradient shuffle) + holdout scoring — the registered fixture
    measure("q84_quality_classifier")(
      d => {
        val fx = d.select(col("doc_id"),
          when(col("doc_id") % 2 === 1,
            concat(col("text"),
              lit(" click here buy now free winner prize click")))
            .otherwise(col("text")).as("text"),
          (col("doc_id") % 2 === 0).cast("int").as("label"))
        val model = Classifier.train(fx.filter(col("doc_id") % 5 =!= 0),
          "text", "label", dims = 512, iters = 8, lr = 12.0)
        fx.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"),
            round(Classifier.score(col("text"), model), 3).as("score"))
      }, docs1, docs10)

    // q174: multiclass lang-id train (1/7 slice, bounded (dims+1)xK
    // gradient shuffle per iteration) + holdout apply (native-kernel
    // projection) — the registered fixture, labels from doc_id % 5
    measure("q174_langid_model")(
      d => {
        val classes = Seq("en", "de", "ru", "el", "zh")
        val kcls = (col("doc_id") % 5).cast("int")
        val reps = (col("doc_id") % 15 + 5).cast("int")
        val fx = d.select(col("doc_id"),
          concat(col("text"),
            when(kcls === 1, repeat(lit(" der die das und ist nicht"), reps))
              .when(kcls === 2, repeat(lit(" и в не на что он это же"), reps))
              .when(kcls === 3, repeat(lit(" και το να του με την"), reps))
              .when(kcls === 4, repeat(lit(" 的 是 在 了 不 我"), reps))
              .otherwise(lit(""))).as("text"),
          element_at(typedlit(classes), kcls + 1).as("label"))
        val model = graft.operators.LangId.train(
          fx.filter(col("doc_id") % 7 === 1), "text", "label", classes,
          dims = 1024, iters = 6)
        fx.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), col("label"),
            graft.operators.LangId.predictWithFallback(col("text"), model)
              .as("__p"))
          .select(col("doc_id"), col("label"),
            col("__p.lang").as("pred_lang"),
            round(col("__p.conf"), 3).as("conf"),
            col("__p.src").as("src"))
      }, docs1, docs10)

    // q66/q165: IVF-PQ train (bounded sample) + encode (linear) +
    // fixed 10-query ADC search — corpus 10x, queries fixed
    measure("q66_ann_ivfpq")(
      e => {
        val centroids = Ann.trainCentroids(e, "vec_id", "embedding",
          k = 20, iters = 3).withColumnRenamed("centroid_id", "vec_id")
        val books = Ann.trainPq(e, "vec_id", "embedding", m = 16,
          ksub = 128, iters = 5, maxTrain = 4096)
        Ann.ivfPqTopK(corpus = e,
          queries = e.filter(col("vec_id") < 10),
          centroids = centroids, codebooks = books,
          idCol = "vec_id", vecCol = "embedding", k = 5, nprobe = 3,
          refine = 4)
      }, emb1, emb10)
    measure("q165_ann_ivfpq_residual")(
      e => {
        val centroids = Ann.trainCentroids(e, "vec_id", "embedding",
          k = 20, iters = 3).withColumnRenamed("centroid_id", "vec_id")
        val books = Ann.trainPqResidual(e, centroids, "vec_id",
          "embedding", m = 16, ksub = 128, iters = 5, maxTrain = 4096)
        Ann.ivfPqResidualTopK(corpus = e,
          queries = e.filter(col("vec_id") < 10),
          centroids = centroids, codebooks = books,
          idCol = "vec_id", vecCol = "embedding", k = 5, nprobe = 3,
          refine = 4)
      }, emb1, emb10)

    // q76: SemDeDup (k-means blocking + within-cluster pairs + CC,
    // now on the driver union-find path for small pair graphs)
    measure("q76_semantic_dedup")(
      e => Dedup.semanticDedup(e, "vec_id", "embedding", k = 16,
        threshold = 0.35, iters = 2).select(col("vec_id")),
      emb1, emb10)

    println("SCALE exponents (log10(t10/t1); 1.0 = linear): " +
      out.map(m => f"${m.name}=${m.exponent}%.2f").mkString(", "))

    // ---- sf1 gate: diff against the committed file; MERGE on write
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // repo-root anchor + same-sf guard (the Bench fold discipline;
    // r15 — this harness predates it but merges into the same file)
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
          s""""protocol":"StressR12/R14 10x points (lower of 2 passes)"}""")
      println(s"SCALE baseline merged: $basePath")
    }
    spark.stop()
  }
}
