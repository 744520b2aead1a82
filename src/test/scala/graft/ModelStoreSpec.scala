package graft

import java.nio.file.Files

import graft.operators.{Bpe, Pca, UnigramLm, WordPiece}

/** Parquet persistence round trips for the trained model artifacts —
  * a tokenizer/PCA model trained once must restore bit-identically,
  * or every frozen-literal equality downstream silently drifts. */
class ModelStoreSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString + "/model"

  test("BPE merge list round-trips in rank order") {
    val merges = Bpe.trainFromCounts(
      Seq(("hash", 10L), ("hashes", 4L), ("scan", 3L)), numMerges = 6)
    val dir = tmp("bpe")
    Bpe.saveMerges(spark, merges, dir)
    assert(Bpe.loadMerges(spark, dir) == merges)
  }

  test("WordPiece vocabulary round-trips in id order") {
    val vocab = WordPiece.trainFromCounts(
      Seq(("join", 10L), ("joint", 4L)), numMerges = 5)
    val dir = tmp("wp")
    WordPiece.saveVocab(spark, vocab, dir)
    assert(WordPiece.loadVocab(spark, dir) == vocab)
  }

  test("unigram model round-trips at full double precision") {
    val model = UnigramLm.trainFromCounts(
      Seq(("hash", 10L), ("scan", 7L), ("cat", 2L)), vocabSize = 12)
    val dir = tmp("ug")
    UnigramLm.saveModel(spark, model, dir)
    val back = UnigramLm.loadModel(spark, dir)
    assert(back == model) // exact doubles, not approximate
  }

  test("PCA model round-trips bit-identically") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Pca.train(e, "vec_id", "embedding", k = 3)
    val dir = tmp("pca")
    Pca.save(spark, m, dir)
    val back = Pca.load(spark, dir)
    assert(back == m)
    // and the restored model whitens identically
    val a = Pca.whiten(e, "vec_id", "embedding", m).collect().toSeq
    val b = Pca.whiten(e, "vec_id", "embedding", back).collect().toSeq
    assert(a == b)
  }
}
