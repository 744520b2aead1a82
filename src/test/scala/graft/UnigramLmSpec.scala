package graft

import org.apache.spark.sql.functions._
import graft.operators.UnigramLm

/** Unigram-LM (SentencePiece-family) trainer + Viterbi encoder
  * (q161/q162). */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def enc(words: Seq[String], pieces: Seq[String],
      logps: Seq[Double]): Map[String, Seq[String]] =
    words.toDF("word")
      .select(col("word"),
        UnigramLm.encodeCol(col("word"), pieces, logps).as("t"))
      .as[(String, Seq[String])].collect().toMap

  test("viterbi picks the max-likelihood segmentation") {
    // model: singles cheap, 'ab' strongly preferred
    val p = Seq("a", "b", "ab", "c")
    val l = Seq(-3.0, -3.0, -1.0, -2.0)
    val got = enc(Seq("ab", "abc", "ba", "cab"), p, l)
    assert(got("ab") == Seq("ab"))       // -1 beats a+b = -6
    assert(got("abc") == Seq("ab", "c")) // -3 beats a+b+c = -8
    assert(got("ba") == Seq("b", "a"))
    assert(got("cab") == Seq("c", "ab"))
  }

  test("viterbi exact tie breaks to the earliest split point") {
    // [abcd] scores -2; [ab, cd] scores -1 + -1 = -2 — an exact IEEE
    // tie. The kernel must keep the EARLIEST parent (the whole piece)
    // — the same choice the SQL oracle's (score, -i) list_max makes.
    val p = Seq("ab", "cd", "abcd")
    val l = Seq(-1.0, -1.0, -2.0)
    assert(enc(Seq("abcd"), p, l)("abcd") == Seq("abcd"))
  }

  test("unreachable characters produce whole-word [UNK]") {
    val p = Seq("a", "b")
    val l = Seq(-1.0, -1.0)
    val got = enc(Seq("ab", "axb"), p, l)
    assert(got("ab") == Seq("a", "b"))
    assert(got("axb") == Seq("[UNK]"))
  }

  test("trainFromCounts: whole high-frequency words become pieces") {
    val wc = Seq(("hash", 100L), ("scan", 90L), ("cat", 5L))
    val m = UnigramLm.trainFromCounts(wc, vocabSize = 12, seedSize = 50)
    val pieces = m.map(_._1)
    // character coverage: every single char survives pruning
    for (ch <- "hascnt".map(_.toString))
      assert(pieces.contains(ch), s"missing single '$ch'")
    // EM concentrates mass on the whole words (they dominate every
    // lattice), so both survive the prune to 12
    assert(pieces.contains("hash") && pieces.contains("scan"))
    // probabilities are a distribution (within EM float tolerance)
    val mass = m.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(mass - 1.0) < 1e-6, s"mass $mass")
    // whole-word pieces carry far more mass than leftover singles
    val byPiece = m.toMap
    assert(byPiece("hash") > byPiece("h") + math.log(10))
  }

  test("trainFromCounts with emIters = 0 prunes only modeled pieces") {
    // the r12 advice bug: with no EM rounds the prune ranked ALL
    // substrings (subCount), admitting pieces the seed never modeled,
    // and the final logp lookup threw. Now candidates intersect the
    // model: a seed-starved config must still return a valid model.
    val wc = Seq(("hash", 10L), ("scan", 8L), ("joint", 6L), ("cat", 4L))
    val m = UnigramLm.trainFromCounts(wc, vocabSize = 40,
      seedSize = 12, emIters = 0)
    assert(m.nonEmpty)
    // every emitted piece carries a finite log-probability
    assert(m.forall { case (_, lp) => !lp.isNaN && !lp.isInfinity })
    // character coverage still holds
    for (ch <- "hascnjoit".distinct.map(_.toString))
      assert(m.map(_._1).contains(ch), s"missing single '$ch'")
  }

  test("trainFromCounts is deterministic") {
    val wc = Seq(("join", 30L), ("joint", 20L), ("int", 10L))
    val a = UnigramLm.trainFromCounts(wc, vocabSize = 15)
    val b = UnigramLm.trainFromCounts(wc, vocabSize = 15)
    assert(a == b)
    // sorted output contract
    assert(a.map(_._1) == a.map(_._1).sorted)
  }

  test("train + encode round trip never UNKs on its own corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = UnigramLm.train(docs, "text", vocabSize = 40)
    val hist = UnigramLm.tokenHistogram(docs, "text",
      m.map(_._1), m.map(_._2), 1000)
      .as[(String, Long)].collect()
    assert(hist.nonEmpty)
    assert(!hist.exists(_._1 == "[UNK]"))
  }

  test("frozen q161 literal equals the sf0.01 trainer output") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val m = UnigramLm.train(docs, "text", vocabSize = 60)
    assert(m.map(_._1) == SparkEntry.UgPieces,
      s"frozen UgPieces drifted: ${m.map(_._1).mkString(",")}")
    // exact double equality: the literal is the shortest round-trip
    // rendering of these very values
    assert(m.map(_._2) == SparkEntry.UgLogps,
      s"frozen UgLogps drifted: ${m.map(_._2).mkString(",")}")
  }
}
