package graft

import org.apache.spark.sql.functions._
import graft.operators.TextStats

/** Aho–Corasick blocklist kernels (q168) + DEFLATE compression-ratio
  * quality signal (q169). */
class AcDeflateSpec extends SparkSpec {
  import spark.implicits._

  private def hits(texts: Seq[String], pats: Seq[String]): Seq[Int] =
    texts.toDF("t")
      .select(TextStats.blocklistHits(col("t"), pats))
      .as[Int].collect().toSeq

  test("ac_count: overlapping and nested matches all count") {
    // "aa" occurs at 2 end positions in "aaa"
    assert(hits(Seq("aaa"), Seq("aa")) == Seq(2))
    // nested outputs: "she" ends -> both "she" and "he" fire
    assert(hits(Seq("she"), Seq("he", "she")) == Seq(2))
    // fail-link traversal: "ushers" hits she, he, hers
    assert(hits(Seq("ushers"), Seq("he", "she", "his", "hers")) == Seq(3))
    // clean text
    assert(hits(Seq("xyz"), Seq("he", "she")) == Seq(0))
    // multi-word phrase is plain substring search
    assert(hits(Seq("a big data set"), Seq("big data")) == Seq(1))
  }

  test("ac_matches: distinct patterns in pattern-list order") {
    val got = Seq("ushers ushers").toDF("t")
      .select(TextStats.blocklistMatches(col("t"),
        Seq("hers", "she", "he", "absent")))
      .as[Seq[String]].collect().head
    assert(got == Seq("hers", "she", "he"))
    val clean = Seq("xyz").toDF("t")
      .select(TextStats.blocklistMatches(col("t"), Seq("he")))
      .as[Seq[String]].collect().head
    assert(clean.isEmpty)
  }

  test("ac_count agrees with a naive scan on random-ish text") {
    val pats = Seq("ab", "bab", "aba", "c")
    val texts = Seq("ababab", "cabbabc", "aaaa", "", "cc")
    def naive(t: String): Int =
      (for {
        p <- pats
        i <- 0 to t.length - p.length
        if t.regionMatches(i, p, 0, p.length)
      } yield 1).size
    assert(hits(texts, pats) == texts.map(naive))
  }

  test("deflate_len: deterministic, and repetition compresses harder") {
    val rep = "spam and eggs and " * 40
    val mixed = (1 to 720).map(i => ((i * 2654435761L) % 91 + 33).toChar)
      .mkString // pseudo-random printable, same length ballpark
    val df = Seq(rep, mixed).toDF("t")
      .select(col("t"), TextStats.compressionRatio(col("t")).as("r"),
        call_function("deflate_len", col("t"), lit(6)).as("n"))
    val rows = df.collect().map(r => (r.getDouble(1), r.getInt(2)))
    assert(rows(0)._1 > rows(1)._1 * 3,
      s"repetition should compress far harder: $rows")
    // deterministic across invocations
    val again = df.collect().map(r => (r.getDouble(1), r.getInt(2)))
    assert(rows.toSeq == again.toSeq)
    // kernel equals a direct Deflater run
    def direct(s: String): Int = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val b = new Array[Byte](1 << 16)
      var n = 0
      while (!d.finished()) n += d.deflate(b)
      d.end(); n
    }
    assert(rows(0)._2 == direct(rep) && rows(1)._2 == direct(mixed))
  }

  test("q168/q169 shapes: flagged docs only; ratio column present") {
    val docs = Seq(
      (1L, "the slow hash join is slow"),
      (2L, "nothing to see here"))
      .toDF("doc_id", "text")
    val flagged = docs.select(col("doc_id"),
        TextStats.blocklistHits(lower(col("text")),
          SparkEntry.Blocklist).as("n_hits"))
      .filter(col("n_hits") > 0)
      .as[(Long, Int)].collect().toMap
    assert(flagged == Map(1L -> 3)) // slow x2 + "hash join"
    val ratio = docs.select(
      round(TextStats.compressionRatio(col("text")), 4)).collect()
    assert(ratio.forall(_.getDouble(0) > 0.0))
  }
}
