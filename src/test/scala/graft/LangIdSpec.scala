package graft

import org.apache.spark.sql.functions._
import graft.operators.{Classifier, LangId, TextStats}

/** Model-based lang-id pins (ClassifierSpec's discipline for the
  * multiclass composition): loss descent, holdout separation,
  * determinism given a model, the deterministic tie-break, and the
  * low-confidence fallback routing to q37's stopword heuristic. */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val classes = Seq("en", "de", "ru", "el", "zh")
  private val vocab: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "cat", "dog", "house",
      "tree", "river", "stone", "light"),
    "de" -> Seq("der", "die", "das", "und", "hund", "katze", "haus",
      "baum", "fluss", "stein", "licht"),
    "ru" -> Seq("и", "в", "не", "на", "кот", "дом", "река", "дерево",
      "камень", "свет"),
    "el" -> Seq("και", "το", "να", "γάτα", "σπίτι", "ποτάμι",
      "δέντρο", "πέτρα", "φως"),
    "zh" -> Seq("的", "是", "在", "猫", "房子", "河", "树", "石头", "光"))

  /** Deterministic per-class corpus: `n` docs of 30 words sampled
    * from the class vocabulary with a fixed seed. */
  private def corpus(n: Int, seed: Int): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    classes.zipWithIndex.flatMap { case (c, ci) =>
      val v = vocab(c)
      (0 until n).map { i =>
        val words = Seq.fill(30)(v(rnd.nextInt(v.length)))
        ((ci * n + i).toLong, words.mkString(" "), c)
      }
    }
  }

  private lazy val model: Classifier.MultiModel = {
    val train = corpus(35, seed = 5).toDF("id", "text", "label")
    LangId.train(train, "text", "label", classes, dims = 512,
      iters = 12, lr = 12.0)
  }

  test("native lang_features kernel matches the portable definition") {
    assert(spark.catalog.functionExists("lang_features"),
      "extensions must register the kernel in the spec session")
    // mixed scripts, short texts, empty text, stopwords, >600 chars,
    // and NON-BMP text (emoji, supplementary CJK: every code point is
    // two UTF-16 units — the r14 ADVICE divergence class: cap, window
    // and trigram positions must count code points on both paths) +
    // uppercase Σ/İ (lowercase must be Spark's own, not Locale.ROOT)
    val docs = (corpus(5, seed = 3).map(_._2) ++ Seq(
      "", "ab", "the и 的 και der", "x" * 1200,
      "der die das " + ("ж" * 50) + " και το",
      "🎉🌍🚀 emoji 🎉 der die das 𠀀𠀁𠀂 text",
      "🎉" * 700, // the code-point cap lands inside the emoji run
      "ΣΙΓΜΑ İstanbul MIXED Case Ǆungla")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val both = docs.select(col("id"),
        LangId.featureIds(col("text"), 512).as("n"),
        LangId.featureIdsPortable(col("text"), 512, 7L).as("p"))
      .as[(Long, Seq[Int], Seq[Int])].collect()
    both.foreach { case (id, n, p) =>
      assert(n == p, s"doc $id: native $n vs portable $p") }
    // and on real corpus text
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
      .select(col("doc_id"),
        LangId.featureIds(col("text"), 1024).as("n"),
        LangId.featureIdsPortable(col("text"), 1024, 7L).as("p"))
      .as[(Long, Seq[Int], Seq[Int])].collect()
    real.foreach { case (id, n, p) => assert(n == p, s"doc $id") }
  }

  test("native pool_scores kernel matches the portable fold") {
    val probs = corpus(6, seed = 21).toDF("id", "text", "label")
      .select(col("id"),
        Classifier.softmaxOfIds(
          LangId.featureIds(col("text"), model.dims), model).as("s"))
      .as[(Long, Seq[Double])].collect().toMap
    // recompute raw scores scala-side from the model and compare
    val texts = corpus(6, seed = 21).map(t => (t._1, t._2)).toMap
    val featRows = corpus(6, seed = 21).map(t => t._1).toSeq.toDF("id")
      .join(texts.toSeq.toDF("id", "text"), "id")
      .select(col("id"),
        LangId.featureIds(col("text"), model.dims).as("f"))
      .as[(Long, Seq[Int])].collect().toMap
    featRows.foreach { case (id, ids) =>
      val raw = model.classes.indices.map { k =>
        model.bias(k) +
          ids.map(model.weights(k)(_)).sum / math.max(1, ids.size) }
      val mx = raw.max
      val exps = raw.map(r => math.exp(r - mx))
      val want = exps.map(_ / exps.sum)
      probs(id).zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"doc $id: $g vs $w") }
    }
  }

  test("training loss descends monotonically") {
    val l = model.lossHistory
    assert(l.size == 12)
    assert(l.sliding(2).forall(p => p(1) <= p(0) + 1e-9),
      s"loss not monotone: $l")
    assert(l.last < l.head * 0.9,
      s"loss did not descend: ${l.head} -> ${l.last}")
    // and the initial loss is ln(K) — uniform softmax over 5 classes
    assert(math.abs(l.head - math.log(5.0)) < 0.05)
  }

  test("holdout separation: unseen docs classify to their language") {
    val holdout = corpus(15, seed = 99).toDF("id", "text", "label")
    val got = holdout.select(col("label"),
        LangId.predict(col("text"), model).getField("lang").as("pred"))
      .as[(String, String)].collect()
    val acc = got.count { case (y, p) => y == p }.toDouble / got.length
    assert(acc >= 0.95, s"holdout accuracy $acc")
  }

  test("scores are deterministic given a model, across layouts") {
    val docs = corpus(10, seed = 7).toDF("id", "text", "label")
    def preds(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), LangId.predict(col("text"), model).as("p"))
        .select(col("id"), col("p.lang"), col("p.conf"))
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(preds(docs) == preds(docs.repartition(7)))
  }

  test("all-zero model ties every class; tie breaks to the first") {
    val zero = Classifier.MultiModel(classes,
      Array.fill(classes.length)(new Array[Double](64)),
      new Array[Double](classes.length), 64, Seq.empty)
    val got = Seq((1L, "der hund und die katze"), (2L, "的 是 在"))
      .toDF("id", "text")
      .select(LangId.predict(col("text"), zero).getField("lang"))
      .as[String].collect()
    assert(got.forall(_ == classes.head))
  }

  test("fallback routing: low confidence goes to the stopword heuristic") {
    val docs = corpus(8, seed = 13).toDF("id", "text", "label")
    // impossible bar -> every row falls back and agrees with q37
    val allFallback = docs.select(
        TextStats.langId(col("text")).as("heur"),
        LangId.predictWithFallback(col("text"), model, minConf = 2.0)
          .as("p"))
      .select(col("heur"), col("p.lang"), col("p.src"))
      .as[(String, String, String)].collect()
    assert(allFallback.forall(r => r._3 == "fallback" && r._2 == r._1))
    // zero bar -> every row keeps the model's prediction
    val allModel = docs.select(
        LangId.predict(col("text"), model).getField("lang").as("m"),
        LangId.predictWithFallback(col("text"), model, minConf = 0.0)
          .as("p"))
      .select(col("m"), col("p.lang"), col("p.src"))
      .as[(String, String, String)].collect()
    assert(allModel.forall(r => r._3 == "model" && r._2 == r._1))
    // and src is exactly the conf-vs-threshold comparison, row by row
    val mid = docs.select(
        LangId.predictWithFallback(col("text"), model, minConf = 0.9)
          .as("p"))
      .select(col("p.conf"), col("p.src"))
      .as[(Double, String)].collect()
    assert(mid.forall { case (c, s) =>
      (c >= 0.9) == (s == "model") })
  }
}
