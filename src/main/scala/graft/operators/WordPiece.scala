package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer TRAINING and corpus-wide ENCODING — the second
  * tokenizer family beside [[Bpe]] (Wu et al. 2016; the BERT
  * tokenizer). Both halves follow the Bpe discipline exactly:
  *
  * - TRAIN runs on the WORD-FREQUENCY DICTIONARY: one distributed
  *   word-count aggregate reduces the corpus to a vocabulary-sized
  *   table, the top `maxWords` of which train on the driver. Where
  *   BPE merges the highest-COUNT pair, WordPiece merges the highest
  *   LIKELIHOOD pair — score(a,b) = c(ab) / (c(a)·c(b)) — so rare
  *   symbols glue to their contexts before frequent ones do (the
  *   published difference between the two trainers). Symbols carry
  *   their positional identity from the start: a word splits as
  *   `h ##a ##s ##h`, merges preserve the `##` continuation marker,
  *   and the vocabulary that falls out is directly the encoder's.
  * - ENCODE is a pure projection through the codegen'd
  *   `wordpiece_encode` kernel ([[graft.functions.WordPieceCodec]]):
  *   greedy longest-match-first from the left, `##` continuation
  *   prefix after the first piece, whole-word `[UNK]` when nothing
  *   matches. Vocabulary broadcast by closure, per-thread whole-word
  *   memo, no shuffle.
  *
  * Determinism (what makes the frozen vocab reproducible and the
  * histogram query's oracle replayable): the best pair each
  * iteration is max score, ties by max pair count, then the
  * lexicographically smallest (left, right); merging rewrites all
  * non-overlapping occurrences left to right. Scores are exact-ratio
  * comparisons of small integer counts evaluated identically on any
  * JVM (one double division per candidate pair).
  */
object WordPiece {

  /** Split a word into WordPiece training symbols: first code point
    * bare, the rest `##`-prefixed. */
  private def symbols(w: String): scala.collection.mutable.ArrayBuffer[String] = {
    val b = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      val s = w.substring(i, i + n)
      b += (if (i == 0) s else "##" + s)
      i += n
    }
    b
  }

  /** Concatenate two adjacent symbols, keeping the left one's
    * positional marker: `h + ##a = ha`, `##a + ##s = ##as`. */
  private def join(a: String, b: String): String =
    a + (if (b.startsWith("##")) b.substring(2) else b)

  /** Train a vocabulary of base symbols + `numMerges` merged pieces
    * from the corpus — one word-count aggregate, a bounded
    * top-`maxWords` collect, then the driver loop
    * ([[trainFromCounts]]). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 30000, minLen: Int = 2, maxLen: Int = 12)
      : Seq[String] = {
    val wc = Bpe.words(df, textCol, minLen, maxLen)
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word"))
      .limit(maxWords) // bounded driver collect: vocabulary, not corpus
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(wc, numMerges)
  }

  /** The driver-side training loop over a word-frequency dict —
    * public so specs can pin it against hand-computed corpora.
    * Returns base symbols (every bare/`##` code point seen, sorted)
    * followed by merged pieces in merge order. */
  def trainFromCounts(wc: Seq[(String, Long)], numMerges: Int)
      : Seq[String] = {
    require(numMerges >= 0, "trainFromCounts: numMerges >= 0")
    val toks = wc.map { case (w, _) => symbols(w) }.toArray
    val counts = wc.map(_._2).toArray
    val base = toks.flatten.distinct.sorted
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      // symbol and adjacent-pair counts, weighted by word frequency
      val sc = scala.collection.mutable.HashMap.empty[String, Long]
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < toks.length) {
        val t = toks(wi)
        var i = 0
        while (i < t.length) {
          sc.update(t(i), sc.getOrElse(t(i), 0L) + counts(wi))
          if (i < t.length - 1) {
            val k = (t(i), t(i + 1))
            pc.update(k, pc.getOrElse(k, 0L) + counts(wi))
          }
          i += 1
        }
        wi += 1
      }
      if (pc.isEmpty) exhausted = true
      else {
        // max likelihood score; ties by max count, then smallest pair
        val (best, _) = pc.minBy { case ((a, b), c) =>
          val score = c.toDouble / (sc(a).toDouble * sc(b).toDouble)
          (-score, -c, a, b)
        }
        merges += join(best._1, best._2)
        var wj = 0
        while (wj < toks.length) {
          val t = toks(wj)
          if (t.length > 1) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < t.length) {
              if (i < t.length - 1 && t(i) == best._1 && t(i + 1) == best._2) {
                out += join(t(i), t(i + 1)); i += 2
              } else { out += t(i); i += 1 }
            }
            toks(wj) = out
          }
          wj += 1
        }
        m += 1
      }
    }
    (base ++ merges).distinct
  }

  /** Token column for a word column under a literal vocabulary (the
    * codegen'd kernel — requires GraftExtensions). */
  def encodeCol(word: Column, vocab: Seq[String]): Column =
    call_function("wordpiece_encode", word, typedlit(vocab))

  /** Exact-tokenizer token histogram under a WordPiece vocabulary —
    * the q154 shape with the greedy longest-match encoder: one scan,
    * one aggregate exchange, deterministic (cnt desc, token) cutoff;
    * the encode itself adds no shuffle. */
  def tokenHistogram(docs: DataFrame, textCol: String,
      vocab: Seq[String], k: Int): DataFrame =
    Bpe.words(docs, textCol)
      .select(explode(encodeCol(col("word"), vocab)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Persist a trained vocabulary as parquet (id, piece);
    * [[loadVocab]] restores it in id order (base symbols then merge
    * order — the order [[trainFromCounts]] emits). */
  def saveVocab(spark: org.apache.spark.sql.SparkSession,
      vocab: Seq[String], dir: String): Unit = {
    import spark.implicits._
    vocab.zipWithIndex.map { case (p, i) => (i, p) }
      .toDF("id", "piece")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Restore a [[saveVocab]] artifact in id order. */
  def loadVocab(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[String] =
    spark.read.parquet(dir).orderBy(col("id")).collect()
      .map(_.getString(1)).toSeq

  /** The trained vocabulary as rows (id, piece) — the artifact a
    * WordPiece tokenizer ships. */
  def vocabTable(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 30000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, numMerges, maxWords).zipWithIndex
      .map { case (p, i) => (i, p) }.toDF("id", "piece")
  }
}
