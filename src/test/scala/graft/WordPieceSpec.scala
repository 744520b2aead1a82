package graft

import org.apache.spark.sql.functions._
import graft.operators.WordPiece

/** WordPiece trainer + greedy longest-match encoder (q159/q160). */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("trainFromCounts: likelihood scoring merges rare pairs first") {
    // dict: "ab" x100, "cd" x2. BPE (count scoring) would merge
    // (a,##b) first (count 100 vs 2); WordPiece likelihood divides by
    // the symbol counts: score(a,##b) = 100/(100*100) = 0.01,
    // score(c,##d) = 2/(2*2) = 0.5 -> (c,##d) merges FIRST.
    val v = WordPiece.trainFromCounts(Seq(("ab", 100L), ("cd", 2L)), 1)
    assert(v.contains("cd"))
    assert(!v.contains("ab"))
    // base symbols all present, sorted before merges
    assert(v.startsWith(Seq("##b", "##d", "a", "c")))
  }

  test("trainFromCounts: continuation markers survive merges") {
    // "hash" x4 -> h ##a ##s ##h; pair counts all 4, symbol counts:
    // h=4(first)+##h=4, ##a=4, ##s=4. scores: (h,##a)=4/16,
    // (##a,##s)=4/16, (##s,##h)=4/16 -> tie on score AND count ->
    // lexicographically smallest pair (##a,##s) merges first -> ##as
    val v1 = WordPiece.trainFromCounts(Seq(("hash", 4L)), 1)
    assert(v1.last == "##as")
    // second merge: h ##as ##h; scores (h,##as)=4/16, (##as,##h)=4/16
    // -> (##as,##h) smaller -> ##ash; third: (h,##ash) -> hash
    val v3 = WordPiece.trainFromCounts(Seq(("hash", 4L)), 3)
    assert(v3.endsWith(Seq("##as", "##ash", "hash")))
  }

  test("trainFromCounts is deterministic and exhausts gracefully") {
    val wc = Seq(("scan", 3L), ("can", 5L), ("cat", 2L))
    val a = WordPiece.trainFromCounts(wc, 50) // more merges than pairs
    val b = WordPiece.trainFromCounts(wc, 50)
    assert(a == b)
    // exhaustion: every word fully merged -> the whole words appear
    assert(a.contains("scan") && a.contains("can") && a.contains("cat"))
  }

  test("encode: greedy longest match with ## continuations") {
    val vocab = Seq("a", "b", "c", "##a", "##b", "##c", "ab", "##bc",
      "abc")
    val words = Seq("abc", "abcabc", "cab", "ba").toDF("word")
    val got = words
      .select(col("word"), WordPiece.encodeCol(col("word"), vocab).as("t"))
      .as[(String, Seq[String])].collect().toMap
    // whole-word match wins over any split
    assert(got("abc") == Seq("abc"))
    // greedy: "abc" first (longest prefix), then ##a, then the
    // two-char continuation ##bc beats ##b
    assert(got("abcabc") == Seq("abc", "##a", "##bc"))
    // "c" then "##a" "##b" (no ##ab)
    assert(got("cab") == Seq("c", "##a", "##b"))
    assert(got("ba") == Seq("b", "##a"))
  }

  test("encode: whole-word [UNK] when any position fails") {
    val vocab = Seq("a", "b", "##a") // no ##b: "ab" fails mid-word
    val got = Seq("ab", "ba", "xa").toDF("word")
      .select(col("word"), WordPiece.encodeCol(col("word"), vocab).as("t"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("ab") == Seq("[UNK]"))   // 'a' ok, then '##b' missing
    assert(got("ba") == Seq("b", "##a"))
    assert(got("xa") == Seq("[UNK]"))   // no prefix at position 0
  }

  test("greedy failure is whole-word UNK even when a split exists") {
    // vocab tokenizes "abc" as a ##bc, but greedy takes ab first and
    // then dead-ends: BERT semantics say the word is [UNK]
    val vocab = Seq("a", "ab", "##bc")
    val got = Seq("abc").toDF("word")
      .select(WordPiece.encodeCol(col("word"), vocab))
      .as[Seq[String]].collect().head
    assert(got == Seq("[UNK]"))
  }

  test("frozen q159 vocabulary matches the trainer on sf0.001") {
    // the SparkEntry literal is trained at sf0.01 (pinned by
    // re-derivation in the verify path); here pin the trainer's
    // determinism + shape on the smaller corpus so CI stays fast:
    // re-derive twice, equal, and all continuation pieces well-formed
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val v1 = WordPiece.train(docs, "text", numMerges = 24)
    val v2 = WordPiece.train(docs, "text", numMerges = 24)
    assert(v1 == v2)
    assert(v1.distinct == v1)
    assert(v1.forall(p => p.matches("(##)?[a-z]+")))
    // encode never UNKs on its own training corpus's top words here
    val hist = WordPiece.tokenHistogram(docs, "text", v1, 1000)
      .as[(String, Long)].collect()
    assert(hist.nonEmpty)
    assert(!hist.exists(_._1 == "[UNK]"))
  }

  test("frozen q159 literal equals the sf0.01 trainer output") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val v = WordPiece.train(docs, "text", numMerges = 24)
    assert(v == SparkEntry.WpVocab,
      s"frozen WpVocab drifted: trainer says ${v.mkString(",")}")
  }
}
