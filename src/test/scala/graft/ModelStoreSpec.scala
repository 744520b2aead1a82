package graft

import java.nio.file.Files

import graft.operators.{Bpe, Classifier, LangId, Pca, UnigramLm, WordPiece}

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

  test("byte-level BPE merge list round-trips (alphabet can't collide with '|')") {
    // ByteAlphabet remaps 0x7C out of the identity range precisely so
    // the "left|right" persistence format stays unambiguous for ANY
    // trained byte merge list — including ones over unicode corpora
    import graft.functions.ByteAlphabet
    val wc = Seq("Dr.!", "café", "x=42;", "日本", "a|b").map(w =>
      (ByteAlphabet.toSymbols(w), 5L))
    val merges = Bpe.trainFromCounts(wc, numMerges = 8)
    val dir = tmp("bbpe")
    Bpe.saveMerges(spark, merges, dir)
    assert(Bpe.loadMerges(spark, dir) == merges)
    // and the frozen q179 list itself round-trips
    val dir2 = tmp("bbpe_frozen")
    Bpe.saveMerges(spark, SparkEntry.BbpeMerges, dir2)
    assert(Bpe.loadMerges(spark, dir2) == SparkEntry.BbpeMerges)
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

  test("binary classifier model round-trips; scores bit-identical") {
    import spark.implicits._
    val docs = (1 to 40).map(i =>
      (s"doc $i ${if (i % 2 == 0) "clean prose text" else "zz spam zz"}",
        i % 2)).toDF("text", "label")
    val m = Classifier.train(docs, "text", "label", dims = 64, iters = 3)
    val dir = tmp("clf")
    Classifier.save(spark, m, dir)
    val back = Classifier.load(spark, dir)
    // Array fields ⇒ compare contents, not case-class identity
    assert(back.weights.toSeq == m.weights.toSeq) // exact doubles
    assert(back.bias == m.bias && back.dims == m.dims &&
      back.seed == m.seed && back.lossHistory == m.lossHistory)
    // and the restored model scores bit-for-bit
    val a = docs.select(Classifier.score(org.apache.spark.sql.functions
      .col("text"), m)).collect().toSeq
    val b = docs.select(Classifier.score(org.apache.spark.sql.functions
      .col("text"), back)).collect().toSeq
    assert(a == b)
  }

  test("multiclass lang-id model round-trips; predictions bit-identical") {
    import spark.implicits._
    val docs = (1 to 60).flatMap { i =>
      Seq((s"the and of text sample $i", "en"),
        (s"der die das und beispiel $i", "de"))
    }.toDF("text", "label")
    val m = LangId.train(docs, "text", "label", Seq("en", "de"),
      dims = 128, iters = 3)
    val dir = tmp("langid")
    Classifier.saveMulti(spark, m, dir)
    val back = Classifier.loadMulti(spark, dir)
    assert(back.classes == m.classes) // order IS part of the model
    assert(back.weights.toSeq.map(_.toSeq) ==
      m.weights.toSeq.map(_.toSeq)) // exact doubles
    assert(back.bias.toSeq == m.bias.toSeq && back.dims == m.dims &&
      back.lossHistory == m.lossHistory)
    val c = org.apache.spark.sql.functions.col("text")
    val a = docs.select(LangId.predict(c, m)).collect().toSeq
    val b = docs.select(LangId.predict(c, back)).collect().toSeq
    assert(a == b)
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
