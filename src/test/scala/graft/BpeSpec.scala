package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE train + encode: the trainer against hand-computed corpora and
  * the frozen q154 merge list; the codegen'd kernel against a naive
  * reference implementation of the same greedy semantics. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val sf001 = "/root/testdata/sf0.01"

  /** Independent reference for the kernel's documented semantics:
    * one merge per step — lowest rank, leftmost on ties. */
  private def naiveEncode(word: String, merges: Seq[String]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var toks = word.map(_.toString).toVector
    var done = toks.size < 2
    while (!done) {
      val cands = toks.indices.dropRight(1)
        .flatMap(i => rank.get(s"${toks(i)}|${toks(i + 1)}").map(r => (r, i)))
      if (cands.isEmpty) done = true
      else {
        val (_, i) = cands.min
        toks = toks.patch(i, Seq(toks(i) + toks(i + 1)), 2)
        done = toks.size < 2
      }
    }
    toks
  }

  private def encodeViaKernel(words: Seq[String],
      merges: Seq[String]): Map[String, Seq[String]] =
    words.toDF("w")
      .select(col("w"), Bpe.encodeCol(col("w"), merges).as("t"))
      .as[(String, Seq[String])].collect().toMap

  test("trainFromCounts: frequency-weighted pairs, lexicographic tie-break") {
    // aaab x3, aab x2: a|a = 2*3 + 1*2 = 8 beats a|b = 5; after the
    // merge, ('a','b') = 5 vs ('aa','a') = 3 vs ('aa','b') = 2
    assert(Bpe.trainFromCounts(Seq(("aaab", 3L), ("aab", 2L)), 2) ===
      Seq("a|a", "a|b"))
    // tie on count: ('a','b') = 2 vs ('b','c') = 2 -> smallest pair
    assert(Bpe.trainFromCounts(Seq(("ab", 2L), ("bc", 2L)), 1) ===
      Seq("a|b"))
    // training exhausts when every word is one token: stops early
    assert(Bpe.trainFromCounts(Seq(("ab", 1L)), 10) === Seq("a|b"))
  }

  test("the merge separator '|' is rejected loudly, never corrupted silently") {
    // '|' in the alphabet would make the kernel's "left|right" rank
    // keys and the save/load round trip ambiguous (r12 advice)
    val ex = intercept[IllegalArgumentException] {
      Bpe.trainFromCounts(Seq(("a|b", 3L)), 2)
    }
    assert(ex.getMessage.contains("|"))
    val ex2 = intercept[IllegalArgumentException] {
      Bpe.saveMerges(spark, Seq("a|b|c"), "/tmp/never_written")
    }
    assert(ex2.getMessage.contains("ambiguous"))
  }

  test("train: deterministic, and the frozen q154 list matches the corpus") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("text"))
    val m1 = Bpe.train(docs, "text", numMerges = 24)
    val m2 = Bpe.train(docs, "text", numMerges = 24)
    assert(m1 === m2)
    // the literal in SparkEntry is the trainer's own output — drift
    // between the constant and the algorithm fails here, not in a
    // silent oracle mismatch
    assert(m1 === SparkEntry.BpeMerges)
  }

  test("bpe_encode kernel: known vectors and the empty merge table") {
    val got = encodeViaKernel(
      Seq("batch", "customer", "the", "filter", "join", "a"),
      SparkEntry.BpeMerges)
    assert(got("batch") === Seq("batch"))
    assert(got("customer") === Seq("cu", "st", "o", "mer"))
    assert(got("the") === Seq("t", "h", "e"))
    assert(got("filter") === Seq("f", "i", "l", "t", "er"))
    assert(got("join") === Seq("join"))
    assert(got("a") === Seq("a"))
    // no merges -> code points
    assert(encodeViaKernel(Seq("abc"), Seq("x|y"))("abc") ===
      Seq("a", "b", "c"))
  }

  test("bpe_encode kernel: equals the naive reference on every corpus word") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val words = Bpe.words(docs, "text").distinct()
      .as[String].collect().toSeq.sorted
    assert(words.nonEmpty)
    val got = encodeViaKernel(words, SparkEntry.BpeMerges)
    words.foreach { w =>
      assert(got(w) === naiveEncode(w, SparkEntry.BpeMerges), s"word $w")
    }
    // repeated encode exercises the per-thread memo: same results
    val again = encodeViaKernel(words ++ words, SparkEntry.BpeMerges)
    assert(again === got)
  }

  test("tokenHistogram: deterministic top-k, counts conserve token totals") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("text"))
    val hist = Bpe.tokenHistogram(docs, "text", SparkEntry.BpeMerges, k = 30)
      .as[(String, Long)].collect().toSeq
    assert(hist.size === 30)
    // ordered by (cnt desc, token)
    assert(hist === hist.sortBy { case (t, c) => (-c, t) })
    // whole-word merges surface: trained tokens dominate chars
    assert(hist.map(_._1).contains("join"))
  }

  test("tokenCounts: exact per-doc tokenizer counts, conserved vs histogram") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val tc = Bpe.tokenCounts(docs, "doc_id", "text", SparkEntry.BpeMerges)
      .as[(Long, Long, Long)].collect().toSeq
    assert(tc.nonEmpty)
    // merging only ever shrinks: words <= tokens <= chars of words
    assert(tc.forall { case (_, w, t) => t >= w })
    // the corpus-wide token total equals the (unlimited) histogram total
    val histTotal = Bpe.words(docs, "text")
      .select(explode(Bpe.encodeCol(col("word"), SparkEntry.BpeMerges)))
      .count()
    assert(tc.map(_._3).sum === histTotal)
    // one doc cross-checked against the naive reference
    val (id0, w0, t0) = tc.minBy(_._1)
    val words0 = Bpe.words(docs.filter(col("doc_id") === id0), "text")
      .as[String].collect().toSeq
    assert(words0.size.toLong === w0)
    assert(words0.map(w =>
      naiveEncode(w, SparkEntry.BpeMerges).size.toLong).sum === t0)
  }

  test("mergeTable: rank-ordered rows with split pair halves") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("text"))
    val mt = Bpe.mergeTable(docs, "text", numMerges = 10)
      .as[(Int, String, String)].collect().toSeq.sortBy(_._1)
    assert(mt.size === 10)
    assert(mt.map(_._1) === (0 until 10))
    assert(mt.map { case (_, a, b) => s"$a|$b" } ===
      SparkEntry.BpeMerges.take(10))
  }

  // --- byte-level (GPT-2 style) family ---

  test("ByteAlphabet: a 256-bijection, '|' excluded, unicode round-trips") {
    import graft.functions.ByteAlphabet
    assert(ByteAlphabet.byteToChar.distinct.length === 256)
    assert(ByteAlphabet.charToByte.size === 256)
    // '|' is the merge separator — it must NOT be an alphabet symbol
    assert(!ByteAlphabet.byteToChar.contains('|'))
    assert(ByteAlphabet.toSymbols("|").forall(_ != '|'))
    // printable ASCII (minus '|') maps to itself — the oracle's
    // identity assumption
    for (c <- (33 to 126).map(_.toChar) if c != '|')
      assert(ByteAlphabet.toSymbols(c.toString) === c.toString, s"char $c")
    // full unicode round trip: one symbol PER UTF-8 BYTE
    for (s <- Seq("café", "naïve", "日本語テキスト", "emoji 🎉 ok",
        "Ω≈ç√", "a|b|c", "")) {
      val sym = ByteAlphabet.toSymbols(s)
      assert(sym.length ===
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
      assert(ByteAlphabet.fromSymbols(sym) === s)
    }
  }

  test("byte_symbols kernel equals the driver mapping on mixed text") {
    import graft.functions.ByteAlphabet
    val rows = Seq("Dr. Smith-Jones said NO!", "café 日本 🎉", "x=42;",
      "plain lowercase words").toDF("t")
    val got = rows.select(call_function("byte_symbols", col("t")))
      .as[String].collect().toSeq
    val want = Seq("Dr. Smith-Jones said NO!", "café 日本 🎉", "x=42;",
      "plain lowercase words").map(ByteAlphabet.toSymbols)
    assert(got === want)
  }

  test("trainBytes: deterministic, frozen q179 list matches the fixture") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val fix = SparkEntry.bbpeFixture(docs).select(col("text"))
    val m1 = Bpe.trainBytes(fix, "text", numMerges = 24)
    assert(m1 === Bpe.trainBytes(fix, "text", numMerges = 24))
    assert(m1 === SparkEntry.BbpeMerges)
  }

  test("pre-tokenizer classes: runs split, frozen q185 list matches trainer") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val fix = SparkEntry.bbpeFixture(docs).select(col("text"))
    // frozen-literal drift pin for the PRETOK configuration
    val m = Bpe.trainBytes(fix, "text", numMerges = 24,
      wordRe = Bpe.PretokRe)
    assert(m === SparkEntry.BbpePretokMerges)
    // the class split is real: "NO!" is ONE \S+ word but TWO pretok
    // words, digits detach from letters, punct runs stay grouped
    val t = Seq("Dr. said NO!! x=42 ... ok").toDF("text")
    val ws = Bpe.wordsBytes(t, "text", minLen = 1, maxLen = 50,
      wordRe = Bpe.PretokRe).as[String].collect().toSeq
    assert(ws === Seq("Dr", ".", "said", "NO", "!!", "x", "=", "42",
      "...", "ok"))
    val plain = Bpe.wordsBytes(t, "text", minLen = 1, maxLen = 50)
      .as[String].collect().toSeq
    assert(plain === Seq("Dr.", "said", "NO!!", "x=42", "...", "ok"))
  }

  test("byte-level encode: no input class is dropped, no UNK possible") {
    import graft.functions.ByteAlphabet
    // q154's char-level pipeline only sees [a-z]+; the byte pipeline
    // must tokenize case/digits/punct/unicode words — every token a
    // sequence over the 256-symbol base alphabet, never an UNK marker
    val docs = Seq("Mixed-CASE tokens, 42% punct! café 東京 🎉 ok")
      .toDF("text")
    val words = Bpe.wordsBytes(docs, "text", minLen = 1, maxLen = 50)
      .as[String].collect().toSeq
    assert(words.size === 8) // every whitespace token survives
    val toks = docs.sparkSession.range(1).select(
      explode(typedlit(words)).as("word"))
      .select(Bpe.encodeCol(col("word"), SparkEntry.BbpeMerges))
      .as[Seq[String]].collect().toSeq
    // reassembling the tokens reproduces each word exactly (lossless,
    // the no-UNK property) — including the multi-byte unicode ones
    assert(toks.map(ts => ByteAlphabet.fromSymbols(ts.mkString)) ===
      words.map(ByteAlphabet.fromSymbols))
    // and a multi-byte char splits into one symbol per byte when no
    // merge covers it: é is 2 bytes, 東 is 3
    val eAcc = Bpe.encodeBytesCol(lit("é"), SparkEntry.BbpeMerges)
    assert(docs.sparkSession.range(1).select(eAcc)
      .as[Seq[String]].head.size === 2)
    val cjk = Bpe.encodeBytesCol(lit("東"), SparkEntry.BbpeMerges)
    assert(docs.sparkSession.range(1).select(cjk)
      .as[Seq[String]].head.size === 3)
  }
}
