package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Bpe, Corpus, Pca, UnigramLm}

/** sf1 scale stress for the LATE-r12 family (tokenizers, LM chains,
  * DSIR, PCA, residual PQ) — the same protocol as [[StressR12]]:
  * measure at sf0.1 and at a 10x replica, print the wall-clock
  * scaling exponent log10(t10/t1); numbers go to SURVEY §6.
  *
  * 10x inputs:
  * - documents replicate with StressR12's positional substitution
  *   (vocabulary UNCHANGED — which is the point: these operators'
  *   models are vocabulary-bounded, so 10x rows must not grow the
  *   broadcast side; sublinear-to-linear exponents confirm it).
  * - embeddings replicate 10x with offset ids (identical vectors —
  *   PCA/PQ per-row cost is what's under test, not geometry).
  * - the q158/q163 reference/target slice stays doc_id < 100 at BOTH
  *   scales, exactly as registered: the model is built from a fixed
  *   sample, the corpus side scales.
  *
  * shuffle.partitions fixed at 32 for both scales (StressR12's
  * controlled-variable discipline); every action aggregates xxhash64
  * over all output columns so nothing prunes.
  */
object StressR12b {

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
    val emb10 = emb1.crossJoin(copies)
      .select((col("vec_id") + col("__copy") * Off).as("vec_id"),
        col("embedding"))
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

    measure("q157_bpe_counts")(
      d => Bpe.tokenCounts(d, "doc_id", "text", SparkEntry.BpeMerges),
      docs1, docs10)
    measure("q161_unigram_hist")(
      d => UnigramLm.tokenHistogram(d, "text",
        SparkEntry.UgPieces, SparkEntry.UgLogps, 30),
      docs1, docs10)
    measure("q158_lm_trigram")(
      d => Corpus.lmQualityScoreTrigram(d, "doc_id", "text",
        reference = d.filter(col("doc_id") < 100), refTextCol = "text"),
      docs1, docs10)
    measure("q163_dsir_weights")(
      d => Corpus.dsirWeights(d, "doc_id", "text",
        target = d.filter(col("doc_id") < 100), targetTextCol = "text"),
      docs1, docs10)
    measure("q167_pca_whiten")(
      e => Pca.whiten(e, "vec_id", "embedding",
        Pca.Model(SparkEntry.PcaComps, SparkEntry.PcaOffsets,
          SparkEntry.PcaScales, Nil)),
      emb1, emb10)
    measure("q165_ivfpq_residual")(
      e => {
        val centroids = Ann.trainCentroids(e, "vec_id", "embedding",
          k = 20, iters = 3).withColumnRenamed("centroid_id", "vec_id")
        val books = Ann.trainPqResidual(e, centroids, "vec_id",
          "embedding", m = 16, ksub = 128, iters = 5, maxTrain = 4096)
        Ann.ivfPqResidualTopK(e, e.filter(col("vec_id") < 10),
          centroids, books, "vec_id", "embedding", k = 5, nprobe = 3,
          refine = 4)
      },
      emb1, emb10)

    println("SCALE exponents (log10(t10/t1); 1.0 = linear): " +
      out.map(m => f"${m.name}=${m.exponent}%.2f").mkString(", "))
    spark.stop()
  }
}
