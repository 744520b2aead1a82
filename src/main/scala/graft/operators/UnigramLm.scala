package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer TRAINING and corpus-wide ENCODING (Kudo 2018,
  * "Subword Regularization" — the SentencePiece unigram model), the
  * third tokenizer family beside [[Bpe]] and [[WordPiece]]. Both
  * halves follow the same discipline:
  *
  * - TRAIN runs on the WORD-FREQUENCY DICTIONARY: one distributed
  *   word-count aggregate reduces the corpus to a vocabulary-sized
  *   table; the driver seeds a piece inventory from frequent
  *   substrings, fits piece probabilities by EM over each word's
  *   segmentation lattice (forward-backward expected counts — the
  *   paper's E step, exact, not Viterbi-hard), prunes to the target
  *   vocabulary, and re-fits. Pruning here ranks pieces by expected
  *   count (their likelihood contribution) rather than the paper's
  *   leave-one-out likelihood LOSS — the standard cheap surrogate;
  *   single-character pieces are always retained so every word stays
  *   encodable (the paper's character-coverage guarantee).
  * - ENCODE is Viterbi segmentation through the codegen'd
  *   `unigram_encode` kernel ([[graft.functions.UnigramCodec]]):
  *   model broadcast by closure, per-thread whole-word memo, no
  *   shuffle — a pure projection.
  *
  * Determinism: seeding, EM accumulation, and pruning all iterate in
  * fixed orders with ties broken by piece text, so the trained model
  * is bit-reproducible; encode ties break to the earliest split
  * point (see the kernel doc), so a frozen (piece, logp) literal is
  * exactly SQL-replayable.
  */
object UnigramLm {

  /** Train a (piece, logp) model. Returns pieces sorted by text with
    * natural-log probabilities under the final EM fit. */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      seedSize: Int = 500, emIters: Int = 2, maxPieceLen: Int = 6,
      maxWords: Int = 30000, minLen: Int = 2, maxLen: Int = 12)
      : Seq[(String, Double)] = {
    val wc = Bpe.words(df, textCol, minLen, maxLen)
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word"))
      .limit(maxWords) // bounded driver collect: vocabulary, not corpus
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(wc, vocabSize, seedSize, emIters, maxPieceLen)
  }

  /** The driver-side trainer over a word-frequency dict — public so
    * specs can pin it against hand-computed corpora. */
  def trainFromCounts(wc: Seq[(String, Long)], vocabSize: Int,
      seedSize: Int = 500, emIters: Int = 2, maxPieceLen: Int = 6)
      : Seq[(String, Double)] = {
    require(vocabSize >= 1, "trainFromCounts: vocabSize >= 1")
    val words = wc.map(_._1).toArray
    val freqs = wc.map(_._2.toDouble).toArray

    // ---- seed: substring counts weighted by word frequency
    val subCount = scala.collection.mutable.HashMap.empty[String, Double]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + maxPieceLen)) {
          val s = w.substring(i, j)
          subCount.update(s, subCount.getOrElse(s, 0.0) + freqs(wi))
          j += 1
        }
        i += 1
      }
      wi += 1
    }
    val singles = subCount.keys.filter(_.length == 1).toSeq.sorted
    def topMulti(scores: collection.Map[String, Double], k: Int): Seq[String] =
      scores.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(math.max(0, k)).map(_._1)
    var pieces: Array[String] =
      (singles ++ topMulti(subCount, seedSize - singles.size)).toArray
    var logp: Map[String, Double] = {
      val tot = pieces.iterator.map(subCount).sum
      pieces.iterator.map(p => p -> math.log(subCount(p) / tot)).toMap
    }

    // ---- EM: forward-backward expected piece counts over each
    // word's segmentation lattice (log domain, fixed iteration order)
    def logsumexp(xs: Array[Double], n: Int): Double = {
      var m = Double.NegativeInfinity
      var i = 0
      while (i < n) { if (xs(i) > m) m = xs(i); i += 1 }
      if (m == Double.NegativeInfinity) return m
      var s = 0.0
      i = 0
      while (i < n) { s += math.exp(xs(i) - m); i += 1 }
      m + math.log(s)
    }
    def emRound(): collection.Map[String, Double] = {
      val exp = scala.collection.mutable.HashMap.empty[String, Double]
      val model = logp
      var k = 0
      while (k < words.length) {
        val w = words(k)
        val n = w.length
        val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
        val beta = Array.fill(n + 1)(Double.NegativeInfinity)
        alpha(0) = 0.0; beta(n) = 0.0
        val buf = new Array[Double](n)
        var j = 1
        while (j <= n) {
          var c = 0
          var i = math.max(0, j - maxPieceLen)
          while (i < j) {
            model.get(w.substring(i, j)).foreach { lp =>
              buf(c) = alpha(i) + lp; c += 1
            }
            i += 1
          }
          alpha(j) = logsumexp(buf, c)
          j += 1
        }
        var i2 = n - 1
        while (i2 >= 0) {
          var c = 0
          var j2 = i2 + 1
          while (j2 <= math.min(n, i2 + maxPieceLen)) {
            model.get(w.substring(i2, j2)).foreach { lp =>
              buf(c) = lp + beta(j2); c += 1
            }
            j2 += 1
          }
          beta(i2) = logsumexp(buf, c)
          i2 -= 1
        }
        val z = alpha(n)
        if (z != Double.NegativeInfinity) {
          var i3 = 0
          while (i3 < n) {
            var j3 = i3 + 1
            while (j3 <= math.min(n, i3 + maxPieceLen)) {
              val s = w.substring(i3, j3)
              model.get(s).foreach { lp =>
                val e = math.exp(alpha(i3) + lp + beta(j3) - z) * freqs(k)
                exp.update(s, exp.getOrElse(s, 0.0) + e)
              }
              j3 += 1
            }
            i3 += 1
          }
        }
        k += 1
      }
      exp
    }
    def refit(exp: collection.Map[String, Double]): Unit = {
      // pieces with zero expectation keep a floor so singles never
      // vanish (character coverage); order fixed by the pieces array
      val counts = pieces.map(p => math.max(exp.getOrElse(p, 0.0), 1e-10))
      val tot = counts.sum
      logp = pieces.iterator.zip(counts.iterator)
        .map { case (p, c) => p -> math.log(c / tot) }.toMap
    }

    var it = 0
    var lastExp: collection.Map[String, Double] = subCount
    while (it < emIters) { lastExp = emRound(); refit(lastExp); it += 1 }
    // ---- prune to vocabSize: singles always survive, multi-char
    // ranked by expected count (likelihood contribution surrogate).
    // Candidates are restricted to pieces the model actually holds:
    // with emIters = 0, lastExp is still subCount (EVERY substring,
    // including pieces the seed never admitted), and an un-modeled
    // survivor would have no logp to emit below.
    pieces = (singles ++
      topMulti(lastExp.filter(kv => logp.contains(kv._1)),
        vocabSize - singles.size)).toArray
    logp = logp.view.filterKeys(pieces.toSet).toMap
    it = 0
    while (it < emIters) { refit(emRound()); it += 1 }
    pieces.sorted.map(p => (p, logp(p))).toSeq
  }

  /** Token column for a word column under a literal model (the
    * codegen'd Viterbi kernel — requires GraftExtensions). */
  def encodeCol(word: Column, pieces: Seq[String],
      logps: Seq[Double]): Column =
    call_function("unigram_encode", word, typedlit(pieces),
      typedlit(logps))

  /** Exact-tokenizer token histogram under a unigram-LM model — the
    * q154/q159 shape with Viterbi segmentation: one scan, one
    * aggregate exchange, deterministic (cnt desc, token) cutoff. */
  def tokenHistogram(docs: DataFrame, textCol: String,
      pieces: Seq[String], logps: Seq[Double], k: Int): DataFrame =
    Bpe.words(docs, textCol)
      .select(explode(encodeCol(col("word"), pieces, logps)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Persist a trained (piece, logp) model as parquet at FULL double
    * precision (the q161 replay depends on exact logp bits);
    * [[loadModel]] restores it in piece order — the order
    * [[trainFromCounts]] emits. */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
      model: Seq[(String, Double)], dir: String): Unit = {
    import spark.implicits._
    model.toDF("piece", "logp")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Restore a [[saveModel]] artifact in piece order. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, Double)] =
    spark.read.parquet(dir).orderBy(col("piece")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq

  /** The trained model as rows (piece, logp) — the artifact a
    * unigram tokenizer ships. logp is rounded to 6 places for
    * display; the frozen literal keeps full precision. */
  def modelTable(docs: DataFrame, textCol: String, vocabSize: Int,
      seedSize: Int = 500, emIters: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, vocabSize, seedSize, emIters)
      .toDF("piece", "logp")
      .select(col("piece"), round(col("logp"), 6).as("logp"))
  }
}
