package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse independent per-query rankings (a lexical
  * arm, a dense-vector arm, …) with RECIPROCAL RANK FUSION — the
  * published recipe (Cormack, Clarke & Buettcher, SIGIR 2009:
  * score(d) = Σ_arms 1/(k + rank_arm(d)), k = 60) that modern
  * RAG / training-data retrieval stacks use to combine BM25-style and
  * embedding-based candidates without score calibration (ranks, not
  * raw scores, so arms with incomparable score scales fuse cleanly).
  *
  * Reference ties: the engine already owns both arm families — q71's
  * BM25 / the prefix-filter set-similarity join (q124) on the lexical
  * side, the whole Ann ladder (q35…q192) on the dense side. This
  * operator is deliberately ARM-AGNOSTIC: any DataFrame of
  * (query_id, neighbor_id, rank) fuses, so the 100 TB deployment
  * swaps the all-pairs test arm for an indexed one without touching
  * the fusion.
  *
  * Scale shape: each arm is already cut to its own top-k, so the
  * fusion input is |queries| · k · #arms rows — one unionByName (no
  * shuffle), one hash aggregate keyed (query_id, neighbor_id), then
  * the same bounded `topk_any` per-query select every ANN rung uses.
  * Nothing here grows with the corpus.
  */
object Retrieval {

  /** Fuse per-query rank lists by RRF. Every arm must carry
    * (query_id, neighbor_id, rank) with rank 1-based (extra columns
    * are ignored); a document missing from an arm simply contributes
    * nothing for that arm (the standard RRF convention). Output:
    * (query_id, neighbor_id, rank, rrf_score) — the fused top `k`
    * per query, ties broken by neighbor_id ascending, rrf_score
    * rounded to 6 places. The 1/(kRrf+rank) terms are NOT exact in
    * double (1/61 has no finite binary expansion) — a two-arm sum is
    * order-free regardless, but with 3+ arms the unrounded sum's last
    * ulp depends on addition order, so the fusion RANKS the rounded
    * score in that case (the q71/q195 rounded-rank discipline) to
    * keep tie behaviour engine-reproducible. */
  def rrfFuse(arms: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame =
    rrfFuseWeighted(arms.map(_ -> 1.0), k, kRrf)

  /** [[rrfFuse]] with per-arm weights — the standard tuned variant
    * (score(d) = Σ w_arm / (kRrf + rank_arm(d))): a stack that trusts
    * its dense arm 2:1 passes `Seq(lex -> 1.0, dense -> 2.0)` without
    * touching either arm. Weights multiply the rank contribution, so
    * they stay calibration-free like the ranks themselves. Weight
    * literals render into the plan as exact doubles (the q194
    * rounding lesson: the caller's double IS the arithmetic both
    * engines must replay). */
  def rrfFuseWeighted(arms: Seq[(DataFrame, Double)], k: Int,
      kRrf: Int = 60): DataFrame = {
    require(arms.nonEmpty, "rrfFuse: at least one arm")
    require(k > 0 && kRrf >= 0, "rrfFuse: k > 0, kRrf >= 0")
    require(arms.forall(_._2 > 0), "rrfFuse: weights must be positive")
    val contributions = arms.map { case (a, w) =>
      a.select(col("query_id"), col("neighbor_id"),
        (lit(w) / (lit(kRrf) + col("rank"))).as("__c"))
    }
    val fusedRaw = contributions.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("__c")).as("__rrf"))
    // 3+ arms: rank the ROUNDED sum — a 3-term double sum's last ulp
    // is addition-order-dependent (see scaladoc), and ranking the raw
    // value would make tie order nondeterministic across engines. Two
    // arms (every registered fusion) sum order-free; their unrounded
    // ranking is kept bit-for-bit as before.
    val fused =
      if (arms.size >= 3)
        fusedRaw.withColumn("__rrf", round(col("__rrf"), 6))
      else fusedRaw
    Ann.topKSelect(fused, "__rrf", k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("__score"), 6).as("rrf_score"))
  }

  /** The test-scale LEXICAL arm: per-query word-set Jaccard top-k via
    * the native `jaccard_shingles` kernel — query set broadcast over
    * the corpus (the bruteForceTopK discipline: the corpus never
    * moves), bounded `topk_any` select. At corpus scale swap in the
    * q71 BM25 postings or the q124 prefix-filter join as the arm;
    * this form exists because it is EXACT and SQL-replayable, so the
    * hybrid row keeps a DuckDB hash-exact oracle. */
  def lexicalJaccardTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val words = (c: Column) => array_distinct(split(c, " "))
    val d = corpus.select(col(idCol).as("neighbor_id"),
      words(col(textCol)).as("__dw"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      words(col(textCol)).as("__qw")))
    val cond =
      if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true)
    val scored = d.join(q, cond)
      .select(col("query_id"), col("neighbor_id"),
        call_function("jaccard_shingles", col("__qw"), col("__dw"))
          .as("__sim"))
    Ann.topKSelect(scored, "__sim", k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Per-query BM25 top-k — the INDEX-BACKED lexical arm (Okapi
    * BM25, the q71 scoring verbatim, generalized from one fixed term
    * list to one term set PER QUERY document): corpus postings build
    * once ((doc, term, tf, len) — the only corpus-sized exchange,
    * map-side combined, checkpointed because both the document-
    * frequency aggregate and the score join consume it — the q107
    * lesson), the union of all queries' terms broadcasts to prune
    * the postings (an equi-join on term — never an all-pairs
    * doc×query comparison, which is what makes this the 100 TB
    * lexical arm where [[lexicalJaccardTopK]] is the test-scale
    * exact one), and each (query, doc) score sums the matched terms'
    * BM25 contributions.
    *
    * Ranking uses the ROUNDED score (round 4, the q71 discipline)
    * with the id tie-break: a float sum's last ulp depends on
    * addition order, which no engine pair reproduces — rounding
    * before ranking is what keeps the rank lists (and q196's fusion
    * of them) hash-exact. */
  def bm25TopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = true): DataFrame = {
    // (n, avgdl) fold into the postings pass via an Observation on the
    // pre-explode projection (r18 verdict: the old separate
    // corpus.agg(...).head() re-read and re-split every document — a
    // second full corpus scan that at 100 TB costs as much as the
    // postings build itself). The checkpoint below is EAGER so the
    // metrics are available here; same aggregate arithmetic
    // (count + double-sum avg), so n/avgdl are the values the old scan
    // produced. The corpus is now scanned exactly once.
    val obs = new org.apache.spark.sql.Observation()
    val docs = Parallelism.ensure(
      corpus.select(col(idCol).as("neighbor_id"), col(textCol).as("__t")))
      .select(col("neighbor_id"), split(col("__t"), " ").as("__ws"))
      .observe(obs, count(lit(1)).as("n"), avg(size(col("__ws"))).as("avgdl"))
    val words = docs.select(col("neighbor_id"),
      size(col("__ws")).as("__len"),
      explode(col("__ws")).as("term"))
    val qterms = queries.select(col(idCol).as("query_id"),
      explode(array_distinct(split(col(textCol), " "))).as("term"))
    val hits = words
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("neighbor_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("__len")).as("len"))
      .localCheckpoint() // eager: materialises postings AND fills obs
    val metrics = obs.get
    // Empty-side guard (r19 review): with NO query terms AQE's
    // empty-relation propagation prunes the whole observed corpus
    // subtree, so the Observation comes back EMPTY (not zero) — and
    // with an empty corpus avgdl is null. In every such case `hits`
    // is itself empty, so finish the pipeline with inert scalars: it
    // evaluates over zero rows and preserves the exact output schema
    // the pre-observation code returned.
    if (!metrics.contains("n") || metrics("n").asInstanceOf[Long] == 0L ||
        metrics("avgdl") == null) {
      val scored0 = hits
        .join(broadcast(qterms), Seq("term"))
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(round(sum(lit(0.0)), 4).as("__bm"))
      return Ann.topKSelect(scored0, "__bm", k)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          col("__score").as("score"))
    }
    val n = metrics("n").asInstanceOf[Long]
    val avgdl = metrics("avgdl").asInstanceOf[Double]
    val dfreq = hits.groupBy(col("term"))
      .agg(countDistinct(col("neighbor_id")).as("nt"))
    val idf = log((lit(n.toDouble) - col("nt") + 0.5) /
      (col("nt") + 0.5) + 1.0)
    val scored = hits
      .join(broadcast(dfreq), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id")
              else lit(true))
      .withColumn("__s", idf * col("tf") * (k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / avgdl)))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(round(sum(col("__s")), 4).as("__bm"))
    Ann.topKSelect(scored, "__bm", k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("__score").as("score"))
  }

  /** Dense cosine arm with the UNROUNDED score exposed as `rel` —
    * what [[mmrRerank]] consumes. [[Ann.bruteForceTopK]] rounds its
    * reported cosine to 4 places (presentation contract), but a
    * 4-decimal relevance times a short-decimal λ lands EXACTLY on
    * 5-decimal half-boundaries, where Spark (HALF_UP over the
    * shortest decimal string) and DuckDB (exact binary) round
    * opposite ways — q194's first hash mismatch was literally
    * round(0.7·0.3985, 4). Full-precision doubles put the boundary
    * probability back at measure zero, the same footing as every
    * other hash-exact double in the suite. */
  def denseCosineTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    import graft.functions.VectorFunctions._
    val c = Parallelism.ensure(corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("__cv")))
      .withColumn("__cn", norm(col("__cv")))
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn")))
    val cond =
      if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true)
    val scored = c.join(q, cond)
      .select(col("query_id"), col("neighbor_id"),
        cosinePrenormed(dot(col("__qv"), col("__cv")), col("__qn"),
          col("__cn")).as("__cos"))
    Ann.topKSelect(scored, "__cos", k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("__score").as("rel"))
  }

  /** Maximal-marginal-relevance diversification rerank (Carbonell &
    * Goldstein 1998) — the retrieval-time face of the dedup family:
    * after candidate generation, greedily re-select k of the top-N so
    * near-duplicate candidates don't crowd the final list
    * (score = λ·rel − (1−λ)·max cosine to the already-selected).
    *
    * `candidates` carries (query_id, neighbor_id bigint, rel double,
    * vec array<float>) — the upstream top-N cut, BOUNDED by
    * construction, so the greedy runs as one codegen'd expression per
    * query over a collect_list'd struct array (tens of rows, a few KB
    * — never the corpus; the only exchange is the bounded group-by).
    * Ties break on the lowest neighbor_id at every step; similarity
    * accumulation matches the `dot_f`/oracle replay bit-for-bit, so
    * q194 stays DuckDB hash-exact (see [[graft.functions.MmrImpl]]'s
    * determinism contract). */
  def mmrRerank(candidates: DataFrame, lambda: Double, k: Int): DataFrame =
    candidates
      .groupBy(col("query_id"))
      .agg(call_function("mmr_select",
        collect_list(struct(col("neighbor_id"), col("rel"), col("vec"))),
        lit(lambda), lit(k)).as("__sel"))
      .select(col("query_id"),
        posexplode(col("__sel")).as(Seq("__pos", "__e")))
      .select(col("query_id"), col("__e.id").as("neighbor_id"),
        (col("__pos") + 1).cast("int").as("rank"),
        round(col("__e.mmr"), 4).as("mmr_score"))
}
