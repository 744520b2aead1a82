package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** Hashed-feature logistic quality classifier (q84): featurization,
  * training descent, holdout separation, apply determinism. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** 400 labeled docs with disjoint-ish vocabularies: clean prose vs
    * spam boilerplate, plus shared filler words both classes carry. */
  private def fixture = {
    val good = "alpha beta gamma delta insight careful prose the and of"
    val bad = "click buy free winner prize deal now cheap the and of"
    spark.range(400).select(
      col("id"),
      when(col("id") % 2 === 0, lit(good)).otherwise(lit(bad)).as("text"),
      (col("id") % 2 === 0).cast("int").as("label"))
  }

  test("featureIds hashes to [0, dims), drops empty tokens, is case-insensitive") {
    val ids = Seq("The  QUICK the").toDF("t")
      .select(Classifier.featureIds(col("t"), 64, 0L).as("f"))
      .as[Seq[Int]].head()
    assert(ids.length == 3 && ids.forall(i => i >= 0 && i < 64))
    assert(ids(0) == ids(2)) // "The" and "the" hash alike
  }

  test("training log-loss descends and the model separates the holdout") {
    val docs = fixture
    val model = Classifier.train(docs.filter(col("id") % 5 =!= 0),
      "text", "label", dims = 256, iters = 8, lr = 12.0)
    assert(model.lossHistory.length == 8)
    assert(model.lossHistory.sliding(2).forall(s => s(1) < s(0)),
      s"loss not monotone: ${model.lossHistory}")
    assert(model.lossHistory.last < model.lossHistory.head * 0.6,
      s"loss did not descend enough: ${model.lossHistory}")
    val scored = docs.filter(col("id") % 5 === 0)
      .select(col("label"), Classifier.score(col("text"), model).as("p"))
      .as[(Int, Double)].collect()
    assert(scored.forall { case (_, p) => p > 0.0 && p < 1.0 })
    val goodMin = scored.collect { case (1, p) => p }.min
    val badMax = scored.collect { case (0, p) => p }.max
    assert(goodMin > 0.5 && badMax < 0.5,
      s"holdout not separated: goodMin=$goodMin badMax=$badMax")
  }

  test("mini-batch training converges, is deterministic, and rotates slices") {
    val docs = fixture
    // distinct texts per row so the hash-rotated slices actually vary
    val varied = docs.select(col("id"),
      concat(col("text"), lit(" tag"), col("id").cast("string"))
        .as("text"), col("label"))
    def model(frac: Double) = Classifier.train(
      varied.filter(col("id") % 5 =!= 0), "text", "label",
      dims = 256, iters = 16, lr = 12.0, batchFraction = frac)
    val m = model(0.5)
    // converges: loss trends down even though each iteration sees a
    // different half of the corpus
    assert(m.lossHistory.length == 16)
    assert(m.lossHistory.last < m.lossHistory.head * 0.6,
      s"mini-batch loss did not descend: ${m.lossHistory}")
    // deterministic: the slices are hash-rotated, not rand()
    assert(model(0.5).lossHistory == m.lossHistory)
    // and the holdout still separates under the mini-batch model
    val scored = varied.filter(col("id") % 5 === 0)
      .select(col("label"), Classifier.score(col("text"), m).as("p"))
      .as[(Int, Double)].collect()
    val goodMin = scored.collect { case (1, p) => p }.min
    val badMax = scored.collect { case (0, p) => p }.max
    assert(goodMin > 0.5 && badMax < 0.5,
      s"mini-batch holdout not separated: $goodMin / $badMax")
    // full-batch path unchanged: fraction 1.0 equals the default
    val full = model(1.0)
    val dflt = Classifier.train(varied.filter(col("id") % 5 =!= 0),
      "text", "label", dims = 256, iters = 16, lr = 12.0)
    assert(full.lossHistory == dflt.lossHistory)
    assert(full.weights.toSeq == dflt.weights.toSeq &&
      full.bias == dflt.bias)
  }

  test("multiclass mini-batch converges and stays deterministic") {
    val classes = Seq("good", "bad")
    val docs = fixture.select(col("id"),
      concat(col("text"), lit(" t"), col("id").cast("string")).as("text"),
      when(col("label") === 1, "good").otherwise("bad").as("label"))
    def m(frac: Double) = Classifier.trainMulticlass(docs,
      Classifier.featureIds(col("text"), 256, 0L), col("label"),
      classes, dims = 256, iters = 12, lr = 12.0, batchFraction = frac)
    val half = m(0.5)
    assert(half.lossHistory.last < half.lossHistory.head * 0.75,
      s"loss: ${half.lossHistory}")
    assert(m(0.5).lossHistory == half.lossHistory)
  }

  test("score is a pure projection: deterministic given a model, no shuffle") {
    val docs = fixture
    val model = Classifier.Model(
      Array.tabulate(64)(i => (i % 7 - 3) * 0.1), 0.05, 64, 0L, Nil)
    val a = docs.select(col("id"), Classifier.score(col("text"), model))
      .as[(Long, Double)].collect().toMap
    val b = docs.repartition(7)
      .select(col("id"), Classifier.score(col("text"), model))
      .as[(Long, Double)].collect().toMap
    assert(a == b) // layout-independent
    val plan = docs.select(Classifier.score(col("text"), model))
      .queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"),
      "classifier apply must not shuffle")
  }
}
