package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear quality classifier — the fastText-shaped
  * model-based filter modern curation recipes apply after rule
  * heuristics (q38) and statistical LM scores (q73): a logistic
  * regression over hashing-trick unigram features, trained ON the
  * cluster and applied as a pure projection.
  *
  * Why this shape at 100 TB:
  *  - **Featurization is stateless**: token → xxhash64 mod dims — no
  *    vocabulary to build, broadcast, or keep consistent between
  *    train and apply (the hashing trick; Weinberger et al. 2009).
  *  - **Training state is O(dims), not O(corpus)**: like Ann's
  *    k-means, the driver holds only the weight vector; each batch
  *    gradient-descent iteration is ONE pass whose shuffle carries at
  *    most (dims+1) × partitions partial sums after map-side combine —
  *    corpus-size-independent, the same contract as the k-means mean
  *    recompute.
  *  - **Apply is a shuffle-free projection**: weights ship as an array
  *    literal (8·dims bytes inside the plan), score = mean of the
  *    looked-up weights through a sigmoid. No join, no UDF; the
  *    lookup is builtin `aggregate`/`element_at` over the token array.
  *
  * The model is mean-pooled logistic regression: p = σ(b + (1/|T|)
  * Σ_{t∈T} w[h(t)]), full-batch gradient ascent on log-likelihood.
  * Caveat (documented, not hidden): partial gradient sums combine in
  * shuffle-arrival order, so float addition order can vary across
  * runs — scores are deterministic given a model, training is
  * deterministic up to float associativity (same caveat as any
  * distributed trainer; the spec asserts with tolerances).
  */
object Classifier {

  /** Trained model: `weights(dims)` + bias, with the featurization
    * params it must be applied with, and the per-iteration training
    * log-loss (for convergence monitoring/alerting). */
  case class Model(weights: Array[Double], bias: Double, dims: Int,
      seed: Long, lossHistory: Seq[Double])

  /** Token → feature id in [0, dims): xxhash64 of the lowercased
    * whitespace token, mod dims. Empty tokens dropped. */
  private[graft] def featureIds(text: Column, dims: Int, seed: Long): Column =
    transform(
      filter(split(lower(text), "\\s+"), t => t =!= ""),
      t => pmod(xxhash64(t, lit(seed)), lit(dims.toLong)).cast("int"))

  /** σ(b + mean of looked-up weights) for a precomputed id array. */
  private def scoreOfIds(ids: Column, weights: Array[Double],
      bias: Double): Column = {
    val w = typedlit(weights.toSeq)
    val raw = aggregate(ids, lit(0.0),
      (acc, i) => acc + element_at(w, i + 1)) /
      greatest(size(ids), lit(1)).cast("double") + lit(bias)
    lit(1.0) / (lit(1.0) + exp(-raw))
  }

  /** Apply a trained model to a text column: P(label=1) in (0,1).
    * Pure projection — see object doc. */
  def score(text: Column, model: Model): Column =
    scoreOfIds(featureIds(text, model.dims, model.seed),
      model.weights, model.bias)

  /** Full-batch gradient-ascent training of the mean-pooled logistic
    * model. `labelCol` is 0/1 (castable to double). Each iteration:
    * one pass computing per-doc residual r = y − p, exploded to
    * (feature, r/|T|) pairs plus one sentinel (dims, r) row per doc
    * for the bias, hash-aggregated map-side — the shuffle moves at
    * most (dims+1) × partitions rows regardless of corpus size; the
    * (dims+1)-row result is the driver-side gradient. A second tiny
    * aggregate logs the iteration's mean log-loss. */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      dims: Int = 1024, iters: Int = 10, lr: Double = 12.0,
      seed: Long = 0L): Model = {
    require(dims > 0 && iters >= 1, "dims and iters must be positive")
    val feats = docs.select(
      featureIds(col(textCol), dims, seed).as("__f"),
      col(labelCol).cast("double").as("__y"))
    val n = feats.count().toDouble
    require(n > 0, "train: empty input")

    var w = new Array[Double](dims)
    var b = 0.0
    val losses = Seq.newBuilder[Double]
    for (_ <- 1 to iters) {
      val scored = feats.withColumn("__p", scoreOfIds(col("__f"), w, b))
      val eps = 1e-12
      losses += scored.agg(avg(
        -(col("__y") * log(col("__p") + eps) +
          (lit(1.0) - col("__y")) * log(lit(1.0) - col("__p") + eps)))
      ).head().getDouble(0)
      // residual r = y - p; feature j's gradient is Σ r/|T| over docs
      // containing j (counted with multiplicity via the explode), the
      // bias gradient Σ r — carried by a sentinel id = dims so one
      // exploded pass + one bounded hash-agg covers both.
      val g = scored
        .select(col("__y") - col("__p") as "__r",
          greatest(size(col("__f")), lit(1)).cast("double").as("__l"),
          explode(concat(array(lit(dims)), col("__f"))).as("__id"))
        .select(col("__id"),
          when(col("__id") === dims, col("__r"))
            .otherwise(col("__r") / col("__l")).as("__g"))
        .groupBy(col("__id")).agg(sum(col("__g")).as("__s"))
        .collect()
      val next = w.clone()
      g.foreach { row =>
        val id = row.getInt(0)
        val s = row.getDouble(1)
        if (id == dims) b += lr * s / n
        else next(id) += lr * s / n
      }
      w = next
    }
    Model(w, b, dims, seed, losses.result())
  }
}
