package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different words entirely here now"),
    (3L, "the quick brown fox jumps over the lazy dog")  // exact dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.length === 3)
    val dupGroup = out.find(_.getLong(1) == 0L).get
    assert(dupGroup.getLong(2) === 2L) // docs 0 and 3
  }

  test("shingles builds distinct word n-grams") {
    val sh = docs.filter($"doc_id" === 0)
      .select(Dedup.shingles(col("text"), 3).as("sh"))
      .as[Seq[String]].head
    assert(sh.contains("the quick brown"))
    assert(sh.contains("over the lazy"))
    assert(sh.length === 7) // 9 words -> 7 trigrams, all distinct
  }

  test("jaccard of identical sets is 1") {
    val j = docs.filter($"doc_id" === 0)
      .select(Dedup.jaccard(
        Dedup.shingles(col("text"), 3), Dedup.shingles(col("text"), 3)))
      .as[Double].head
    assert(j === 1.0)
  }

  test("minhash near-dup finds the exact and near pair, not the unrelated doc") {
    val out = Dedup.minhashNearDup(docs, "doc_id", "text",
      shingleN = 2, numHashes = 48, bands = 16, threshold = 0.5)
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.contains((0L, 3L))) // exact dup always caught
    assert(!out.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("simhash candidates include exact dup with hamming 0") {
    val out = Dedup.simhashCandidates(docs, "doc_id", "text",
      shingleN = 2, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = out.find(t => t._1 == 0L && t._2 == 3L)
    assert(exact.nonEmpty && exact.get._3 === 0)
  }

  test("ngramJaccardPairs respects blocking") {
    val blocked = docs.withColumn("blk", lit(1))
    val out = Dedup.ngramJaccardPairs(blocked, "doc_id", "text", "blk",
      n = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.contains((0L, 3L)))
    assert(out.contains((0L, 1L))) // near-dup above 0.5 on bigrams
  }
}
