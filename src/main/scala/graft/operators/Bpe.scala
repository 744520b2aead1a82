package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING and corpus-wide ENCODING — the missing half
  * of the tokenizer story q126 starts (q126 computes one iteration's
  * pair counts; this trains a full merge list and applies it), so
  * downstream token budgeting (q74/q98/q117) and padding analysis
  * (q137) can run on exact tokenizer counts.
  *
  * Scale shape:
  * - TRAIN follows the classic Sennrich recipe: BPE trains on the
  *   WORD-FREQUENCY DICTIONARY, not the corpus — one distributed
  *   word-count aggregate reduces 100 TB of text to a
  *   vocabulary-sized table, the top `maxWords` of which (a bounded,
  *   documented collect — the same discipline as Ann's centroid and
  *   Classifier's partial collects) train the merges on the driver
  *   in O(numMerges · dictChars) with no further cluster work.
  * - ENCODE is a pure projection: the merge list rides into codegen
  *   as a reference object ([[graft.functions.BpeCodec]] — broadcast
  *   by closure, never a join), each task memoizes whole-word
  *   encodings per thread, and no shuffle is introduced.
  *
  * Determinism (what makes the merge list reproducible and q154's
  * oracle replayable): pair counts weight by word frequency; the best
  * pair each iteration is max count with ties broken by the
  * lexicographically SMALLEST (left, right); merging rewrites all
  * non-overlapping occurrences left to right.
  */
object Bpe {

  /** One lowercased [a-z]+ word per row (column `word`), length in
    * [minLen, maxLen]. The regex is deliberately the portable subset
    * both Spark and DuckDB regex engines agree on. */
  def words(df: DataFrame, textCol: String,
      minLen: Int = 2, maxLen: Int = 12): DataFrame =
    df.select(explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
        .as("word"))
      .filter(length(col("word")).between(minLen, maxLen))

  /** Train `numMerges` merges ("left|right", rank order) from the
    * corpus — one word-count aggregate, a bounded top-`maxWords`
    * collect, then the driver loop ([[trainFromCounts]]). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 30000, minLen: Int = 2, maxLen: Int = 12)
      : Seq[String] = {
    val wc = words(df, textCol, minLen, maxLen)
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word"))
      .limit(maxWords) // bounded driver collect: vocabulary, not corpus
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(wc, numMerges)
  }

  /** The driver-side training loop over a word-frequency dict —
    * public so specs can pin it against hand-computed corpora. */
  def trainFromCounts(wc: Seq[(String, Long)], numMerges: Int)
      : Seq[String] = {
    require(numMerges >= 1, "trainFromCounts: numMerges >= 1")
    // '|' is the merge-pair separator everywhere downstream (the
    // encode kernel keys its rank map on "left|right", saveMerges
    // splits on it) — a '|' in the alphabet would make those keys
    // ambiguous, so reject it loudly here instead of corrupting
    // silently. [[words]] only emits [a-z]+, so corpus-driven trains
    // never hit this; it guards direct dict callers.
    require(wc.forall(!_._1.contains("|")),
      "trainFromCounts: words must not contain '|' (merge separator)")
    // tokenization state per dict word; counts never change
    val toks = wc.map { case (w, _) =>
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        b += w.substring(i, i + n)
        i += n
      }
      b
    }.toArray
    val counts = wc.map(_._2).toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < toks.length) {
        val t = toks(wi)
        var i = 0
        while (i < t.length - 1) {
          val k = (t(i), t(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + counts(wi))
          i += 1
        }
        wi += 1
      }
      if (pc.isEmpty) exhausted = true
      else {
        // max count; ties by lexicographically smallest (left, right)
        val (best, _) = pc.minBy { case ((a, b), c) => (-c, a, b) }
        merges += s"${best._1}|${best._2}"
        var wj = 0
        while (wj < toks.length) {
          val t = toks(wj)
          if (t.length > 1) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < t.length) {
              if (i < t.length - 1 && t(i) == best._1 && t(i + 1) == best._2) {
                out += t(i) + t(i + 1); i += 2
              } else { out += t(i); i += 1 }
            }
            toks(wj) = out
          }
          wj += 1
        }
        m += 1
      }
    }
    merges.toSeq
  }

  /** Token column for a word column under a literal merge list (the
    * codegen'd kernel — requires GraftExtensions). */
  def encodeCol(word: Column, merges: Seq[String]): Column =
    call_function("bpe_encode", word, typedlit(merges))

  /** q154 shape: exact-tokenizer token histogram — top `k` BPE tokens
    * by count over the corpus's words, deterministic cutoff
    * (cnt desc, token). One scan, one aggregate exchange, and a
    * TakeOrdered — the encode itself adds no shuffle. */
  def tokenHistogram(docs: DataFrame, textCol: String,
      merges: Seq[String], k: Int): DataFrame =
    words(docs, textCol)
      .select(explode(encodeCol(col("word"), merges)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** q157 shape: per-document EXACT tokenizer counts — (doc_id,
    * n_words, n_tokens) where n_tokens is the BPE token count under
    * `merges` — the number q39's whitespace approximation stands in
    * for, feeding token budgets (q98/q117) and packing (q74) with
    * the real value. Same cost shape as [[tokenHistogram]]: encode
    * is a pure projection, one per-doc agg exchange. Documents with
    * no qualifying word are absent (explode semantics — matching an
    * oracle's inner unnest). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[String], minLen: Int = 2, maxLen: Int = 12): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
        .as("word"))
      .filter(length(col("word")).between(minLen, maxLen))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(size(encodeCol(col("word"), merges)).cast("long"))
          .as("n_tokens"))

  // ------------------------------------------------------------------
  // BYTE-level (GPT-2 style) variant — the no-UNK tokenizer real
  // pretraining ships: the alphabet is the 256 UTF-8 byte values
  // (via graft.functions.ByteAlphabet's byte↔char bijection), so
  // EVERY input is encodable — case, punctuation, digits, emoji,
  // supplementary CJK — where [[words]]' char-level pipeline only
  // sees [a-z]+. Same scale shape as the char-level half: train on
  // the bounded word-frequency dict, encode as a pure projection.
  // ------------------------------------------------------------------

  /** GPT-2-ish pre-tokenizer classes: letter runs, digit runs,
    * punctuation runs — so "votes!" splits into ["votes", "!"] and a
    * number never merges into its neighbouring word (the published
    * byte-BPE recipe pre-splits on exactly these classes; the
    * whitespace-only default keeps them glued). The alternation is
    * branch-DISJOINT, so Java and RE2 agree (the q39 parity class). */
  val PretokRe: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  /** One byte-symbol word per row: raw tokens under `wordRe` (default
    * whitespace runs; pass [[PretokRe]] for GPT-2-ish class splits;
    * case preserved — byte-level tokenizers are case-sensitive),
    * mapped through `byte_symbols`, length bounds applied to the
    * BYTE count (= symbol count). Requires GraftExtensions. */
  def wordsBytes(df: DataFrame, textCol: String,
      minLen: Int = 2, maxLen: Int = 12,
      wordRe: String = "\\S+"): DataFrame =
    df.select(explode(
        regexp_extract_all(col(textCol), lit(wordRe), lit(0))).as("__w"))
      .select(call_function("byte_symbols", col("__w")).as("word"))
      .filter(length(col("word")).between(minLen, maxLen))

  /** Train a BYTE-level merge list: the word-frequency dict over
    * byte-symbol words, then the identical driver loop — byte symbols
    * are single BMP chars, so [[trainFromCounts]]' code-point split
    * IS the per-byte split, and the '|' separator can never collide
    * (byte 0x7C maps OUT of the identity range by construction —
    * [[graft.functions.ByteAlphabet]]). Merges/encodes downstream are
    * the same "left|right" machinery as the char-level family. */
  def trainBytes(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 30000, minLen: Int = 2, maxLen: Int = 12,
      wordRe: String = "\\S+"): Seq[String] = {
    val wc = wordsBytes(df, textCol, minLen, maxLen, wordRe)
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word"))
      .limit(maxWords) // bounded driver collect: vocabulary, not corpus
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(wc, numMerges)
  }

  /** Byte-level token column for a RAW word column: `byte_symbols`
    * then the stock `bpe_encode` kernel — tokens come out as
    * byte-symbol strings (map through
    * [[graft.functions.ByteAlphabet.fromSymbols]] for display). */
  def encodeBytesCol(word: Column, merges: Seq[String]): Column =
    call_function("bpe_encode",
      call_function("byte_symbols", word), typedlit(merges))

  /** q179 shape: byte-level token histogram — [[tokenHistogram]] over
    * the byte-symbol word stream. One scan, one aggregate exchange. */
  def tokenHistogramBytes(docs: DataFrame, textCol: String,
      merges: Seq[String], k: Int, wordRe: String = "\\S+"): DataFrame =
    wordsBytes(docs, textCol, wordRe = wordRe)
      .select(explode(encodeCol(col("word"), merges)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** q180 shape: the trained byte-level merge table as rows
    * (rank, left, right) — [[mergeTable]]'s byte twin. */
  def mergeTableBytes(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 30000, wordRe: String = "\\S+"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainBytes(docs, textCol, numMerges, maxWords,
      wordRe = wordRe).zipWithIndex.map {
      case (p, i) =>
        val Array(a, b) = p.split("\\|", 2)
        (i, a, b)
    }.toDF("rank", "left", "right")
  }

  /** Persist a trained merge list as parquet (rank, left, right) —
    * the artifact a tokenizer run ships; [[loadMerges]] restores the
    * rank-ordered list for [[encodeCol]]. A model is a few KB: the
    * parquet round trip exists for lineage/permanence, not scale. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[String], dir: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case (p, i) =>
      // a symbol containing '|' cannot round-trip (the split below is
      // first-'|', and the encode kernel's "left|right" rank keys would
      // be ambiguous too); trainFromCounts rejects such alphabets —
      // this guards externally-built merge lists
      require(p.count(_ == '|') == 1,
        s"saveMerges: ambiguous merge '$p' (symbol contains '|')")
      val Array(a, b) = p.split("\\|", 2)
      (i, a, b)
    }.toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Restore a [[saveMerges]] artifact in rank order. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[String] =
    spark.read.parquet(dir).orderBy(col("rank")).collect()
      .map(r => s"${r.getString(1)}|${r.getString(2)}").toSeq

  /** q155 shape: the trained merge table itself as rows
    * (rank, left, right) — the artifact a tokenizer ships. */
  def mergeTable(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 30000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, numMerges, maxWords).zipWithIndex.map {
      case (p, i) =>
        val Array(a, b) = p.split("\\|", 2)
        (i, a, b)
    }.toDF("rank", "left", "right")
  }
}
