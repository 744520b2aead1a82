package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate nearest neighbour search over an `array<float>` embedding
  * column.
  *
  * - `bruteForceTopK`: the exactness baseline. The query set is small →
  *   broadcast it over the (huge) corpus: a broadcast nested-loop join
  *   with NO shuffle of the corpus; per-partition scoring then a top-k
  *   window on the query id. Corpus row norms are computed once in a
  *   projection before the join, not per pair.
  * - `ivfTopK`: IVF-style pruning. A fixed set of centroid rows
  *   partitions the corpus into buckets (one pass, broadcast centroids,
  *   argmax-cosine assignment); queries probe only the `nprobe` nearest
  *   buckets. At full probe (nprobe = #centroids) this is exact.
  *
  * At 100 TB the corpus never moves: both variants stream it through a
  * broadcast join; the only shuffle is the final per-query top-k, whose
  * input is already reduced to candidates.
  */
object Ann {

  /** Exact top-k neighbours per query row.
    *
    * @param corpus  (id, embedding) — the big side, streamed
    * @param queries (id, embedding) — the small side, broadcast
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val c = Parallelism.ensure(corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("__cv")))
      .withColumn("__cn", norm(col("__cv")))
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn")))
    val joinCond =
      if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true)
    val scored = c.join(q, joinCond)
      .withColumn("__cos",
        cosinePrenormed(dot(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("__cos"), 4).as("cosine"))
  }

  /** Assign every corpus row to its nearest centroid (argmax cosine,
    * ties → lowest centroid id). The centroid set IS the IVF model — a
    * deliberately small table — so it is materialised on the driver once
    * (the same data movement as a broadcast join's build side) and the
    * per-row argmax runs as a pure projection: zero exchanges, the
    * corpus never moves.
    *
    * NOTE: calling this EAGERLY RUNS a Spark job (the centroid
    * `collect()`) at DataFrame-construction time — acceptable because
    * the model table is small by construction, but callers composing
    * lazy pipelines should construct it once and reuse.
    *
    * Corpus rows with a null embedding are EXCLUDED from the index
    * (filtered here, explicitly): a null vector has no bucket, and
    * letting it fall through as a null centroid_id would silently drop
    * it later in ivfTopK's bucket join. Filter nulls upstream if they
    * should be scored some other way. */
  /** Train IVF centroids with distributed Lloyd's k-means (spherical:
    * assignment by cosine via the same zero-exchange `nearest_centroid`
    * projection queries use, means recomputed per dimension).
    *
    * Per iteration: one narrow assignment pass (NO shuffle — the
    * centroid model ships in the plan) + one aggregation whose shuffle
    * carries at most k × dim × partitions partial sums (map-side
    * combine; independent of corpus size). Initialisation is a
    * deterministic content-hash sample — stable across runs and
    * cluster layouts, never Math.random. Empty clusters keep their
    * previous centroid. Returns (centroid_id int, `vecCol`
    * array<float>) ready for `ivfTopK`/`assignBuckets`.
    */
  def trainCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3, seed: Long = 42L): DataFrame = {
    require(k > 0 && iters >= 0, "trainCentroids: k > 0, iters >= 0")
    val vecs = Parallelism.ensure(
      corpus.filter(col(vecCol).isNotNull)
        .select(col(idCol).as("__id"), col(vecCol).as("__v")))
    // deterministic init: k lowest content-hashes
    var centroids = vecs
      .orderBy(xxhash64(col("__id"), lit(seed)))
      .limit(k)
      .select(
        (row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(xxhash64(col("__id"), lit(seed)))) - 1)
          .as("centroid_id"),
        col("__v"))
    for (_ <- 1 to iters) {
      val assigned = assignBuckets(vecs, centroids, "centroid_id", "__v")
      // per-dimension mean: posexplode -> (cid, pos) partial sums ->
      // rebuild the array ordered by position
      val means = assigned
        .select(col("centroid_id"), posexplode(col("__v")).as(Seq("__p", "__x")))
        .groupBy(col("centroid_id"), col("__p"))
        .agg(avg(col("__x")).as("__m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("__p"), col("__m"))))
          .as("__pm"))
        .select(col("centroid_id"),
          transform(col("__pm"), e => e.getField("__m").cast("float"))
            .as("__mv"))
      // empty clusters keep their previous centroid
      centroids = centroids
        .join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("__mv"), col("__v")).as("__v"))
        .localCheckpoint(false)
    }
    centroids.select(col("centroid_id"), col("__v").as(vecCol))
  }

  def assignBuckets(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val (ids, matrix) = collectCentroids(centroids, idCol, vecCol)
    corpus.filter(col(vecCol).isNotNull)
      .withColumn("centroid_id",
        element_at(ids,
          nearestCentroid(col(vecCol), matrix).cast("int")))
  }

  /** Driver-side model size cap: beyond this the foldable-literal
    * shipping strategy bloats plan serialization/analysis — at that
    * scale use a broadcast-join bucket assignment instead. sqrt(N)
    * centroids for a 10^9-vector index (~31k rows of 768 floats ≈ 95 MB
    * of literal) stays within; a 10^5 x 768 matrix does not. */
  private val MaxCentroidRows = 65536
  private val MaxCentroidFloats = 32L << 20 // 32M floats ≈ 128 MB

  /** Centroid model, driver-side: (id lookup literal, matrix) ordered by
    * ascending centroid id so argmax tie-breaking (lowest matrix index)
    * means lowest centroid id. Null ids/vectors are rejected, not
    * NPE'd. */
  private def collectCentroids(
      centroids: DataFrame, idCol: String,
      vecCol: String): (Column, Seq[Seq[Float]]) = {
    val rows = centroids.select(col(idCol), col(vecCol))
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .orderBy(col(idCol)).collect()
    require(rows.nonEmpty,
      "assignBuckets: empty centroid set (after dropping null id/vec rows)")
    require(rows.length <= MaxCentroidRows,
      s"assignBuckets: ${rows.length} centroids exceed $MaxCentroidRows — " +
        "ship the model as a broadcast join, not a plan literal")
    val matrix = rows.toSeq.map(_.getSeq[Float](1).toSeq)
    val floats = matrix.iterator.map(_.size.toLong).sum
    require(floats <= MaxCentroidFloats,
      s"assignBuckets: centroid matrix of $floats floats exceeds " +
        s"$MaxCentroidFloats — use a broadcast-join assignment instead")
    val ids: Column = rows.head.get(0) match {
      case _: java.lang.Long =>
        typedLit(rows.toSeq.map(_.getLong(0)))
      case _: java.lang.Integer =>
        typedLit(rows.toSeq.map(_.getInt(0)))
      case _: String =>
        typedLit(rows.toSeq.map(_.getString(0)))
      case other => throw new IllegalArgumentException(
        s"assignBuckets: unsupported centroid id type ${other.getClass}")
    }
    (ids, matrix)
  }

  /** Bucket assignment via BROADCAST JOIN — the path for centroid sets
    * too large for the plan-literal model (beyond the collectCentroids
    * caps). One broadcast of the centroid table, per-pair cosine, then
    * an argmax aggregated per corpus row KEYED ON `idCol` ONLY (the
    * non-key columns ride along in a `first(struct(...))`, so map and
    * other non-groupable column types work): the shuffle moves one
    * combined row per input row after map-side combine. REQUIRES
    * `idCol` to be unique per corpus row — duplicate ids collapse to
    * one output row with an arbitrary survivor's payload (the literal-
    * model `assignBuckets` is a pure projection and has no such
    * constraint). Ties → lowest centroid id, matching assignBuckets.
    * (One edge diverges: NaN cosines sort LAST under struct-min here,
    * while the literal model follows Spark's NaN-greatest ordering —
    * filter NaN vectors upstream if that distinction matters.) */
  def assignBucketsJoin(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val c = broadcast(centroids
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("__cid"), col(vecCol).as("__cv"),
        norm(col(vecCol)).as("__cn")))
    val corpusV = corpus.filter(col(vecCol).isNotNull)
    val others = corpusV.columns.filterNot(_ == idCol)
    corpusV.withColumn("__vn", norm(col(vecCol)))
      .join(c)
      .withColumn("__score",
        cosinePrenormed(dot(col(vecCol), col("__cv")), col("__vn"), col("__cn")))
      .groupBy(col(idCol))
      .agg(
        min(struct(negate(col("__score")).as("n"), col("__cid").as("id")))
          .as("__best"),
        first(struct(others.map(col): _*)).as("__row"))
      .select(col(idCol) +:
        others.map(n => col(s"__row.$n").as(n)) :+
        col("__best.id").as("centroid_id"): _*)
  }

  /** IVF search: probe the `nprobe` centroids nearest to each query and
    * rank candidates only within those buckets. "Exact at full probe"
    * holds over the INDEXED corpus — rows with null embeddings are
    * excluded by assignBuckets (they cannot be scored); on a nullable
    * corpus an engine that ranks null similarity last would differ. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val bucketed = assignBuckets(corpus, centroids, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        norm(col(vecCol)).as("__cn"), col("centroid_id"))
    // which buckets each query probes
    val probes = assignProbes(queries, centroids, idCol, vecCol, nprobe)
    val scored = bucketed
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("__cos",
        cosinePrenormed(dot(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("__cos"), 4).as("cosine"))
  }

  /** Top-`nprobe` centroids per query (broadcast-size output). */
  private def assignProbes(
      queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nprobe: Int): DataFrame = {
    val c = centroids.select(
      col(idCol).as("centroid_id"), col(vecCol).as("__ev"),
      norm(col(vecCol)).as("__en"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__pcos").desc, col("centroid_id"))
    queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        norm(col(vecCol)).as("__qn"))
      .join(broadcast(c))
      .withColumn("__pcos",
        cosinePrenormed(dot(col("__qv"), col("__ev")), col("__qn"), col("__en")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nprobe)
      .select(col("centroid_id"), col("query_id"), col("__qv"), col("__qn"))
  }
}
