package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

/** PCA training (Jacobi eigensolver) + whitening projection (q167). */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("recovers a planted principal axis") {
    // points spread along (3,4)/5 with tiny orthogonal noise: the top
    // eigenvector must align with the planted direction
    val pts = (0 until 200).map { i =>
      val t = (i - 100) / 10.0f
      val n = ((i % 7) - 3) / 100.0f
      (i.toLong, Seq(0.6f * t - 0.8f * n, 0.8f * t + 0.6f * n))
    }.toDF("vec_id", "embedding")
    val m = Pca.train(pts, "vec_id", "embedding", k = 2)
    val v = m.components.head
    val dot = math.abs(v(0) * 0.6 + v(1) * 0.8)
    assert(dot > 0.999, s"top axis misaligned: $v")
    // eigenvalues descending, both positive
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    assert(m.eigenvalues(1) >= 0.0)
    // sign convention: largest-|entry| component positive
    assert(m.components.forall(c => c(c.map(math.abs).zipWithIndex.max._2) >= 0))
  }

  test("whitening yields unit variance and zero mean per axis") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Pca.train(e, "vec_id", "embedding", k = 3)
    val w = Pca.whiten(e, "vec_id", "embedding", m, round4 = false)
    val row = w.agg(
      avg($"w1"), variance($"w1"), avg($"w3"), variance($"w3")).head()
    assert(math.abs(row.getDouble(0)) < 1e-6)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-3)
    assert(math.abs(row.getDouble(2)) < 1e-6)
    assert(math.abs(row.getDouble(3) - 1.0) < 1e-3)
    // components are orthonormal
    for (a <- m.components; b <- m.components) {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      if (a eq b) assert(math.abs(d - 1.0) < 1e-5)
      else assert(math.abs(d) < 1e-5)
    }
  }

  test("training is deterministic; null vectors are excluded") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m1 = Pca.train(e, "vec_id", "embedding", k = 2)
    val m2 = Pca.train(e, "vec_id", "embedding", k = 2)
    assert(m1 == m2)
    val withNull = e.select($"vec_id",
      when($"vec_id" === 0L, lit(null)).otherwise($"embedding")
        .as("embedding"))
    val w = Pca.whiten(withNull, "vec_id", "embedding", m1)
    assert(!w.select("vec_id").as[Long].collect().contains(0L))
  }

  // --- OPQ decision guard (r14): the r12 "skip the rotation" call was
  // data-dependent (isotropic embeddings). Both branches pinned:
  // isotropic data reports spread ≈ 1 → skip stands; anisotropic data
  // reports a large spread → the rotation trains and buys PQ recall
  // at equal bytes.

  /** Anisotropic fixture: strong eigenvalue decay (λ ∝ 0.7^j) mixed
    * by a fixed non-axis-aligned orthogonal-ish rotation, so the raw
    * coordinate axes straddle the energy directions the PQ subspace
    * split cuts across. */
  private def anisotropic(n: Int, d: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    // fixed random rotation via Gram-Schmidt on a seeded Gaussian
    val basis = Array.ofDim[Double](d, d)
    for (j <- 0 until d) {
      val v = Array.fill(d)(rnd.nextGaussian())
      for (p <- 0 until j) {
        val dp = (0 until d).map(t => v(t) * basis(p)(t)).sum
        for (t <- 0 until d) v(t) -= dp * basis(p)(t)
      }
      val nm = math.sqrt(v.map(x => x * x).sum)
      for (t <- 0 until d) basis(j)(t) = v(t) / nm
    }
    (0 until n).map { i =>
      val z = Array.tabulate(d)(j =>
        rnd.nextGaussian() * math.pow(0.7, j) * 10.0)
      val x = Array.tabulate(d)(t =>
        (0 until d).map(j => z(j) * basis(j)(t)).sum.toFloat)
      (i.toLong, x.toSeq)
    }
  }

  test("opq guard: isotropic data reports spread ~1 and skips the rotation") {
    val rnd = new scala.util.Random(11)
    val iso = (0 until 1500).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val m = Pca.train(iso, "vec_id", "embedding", k = 16)
    val spread = Pca.eigenSpread(m)
    assert(spread < 2.0, s"isotropic spread $spread")
    assert(!Pca.opqRecommended(m), s"skip branch must hold at $spread")
  }

  test("opq guard: anisotropic data recommends the rotation, and the " +
      "rotation buys PQ recall at equal bytes") {
    import graft.operators.Ann
    val d = 16
    val rows = anisotropic(1200, d, seed = 17)
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.train(df, "vec_id", "embedding", k = d)
    assert(Pca.opqRecommended(m),
      s"anisotropic spread ${Pca.eigenSpread(m)} must clear the bar")

    // allocation: every bucket same size, all dims covered once
    val perm = Pca.opqAllocation(m, 8)
    assert(perm.sorted == (0 until d), s"not a permutation: $perm")

    // pure rotation (with the OPQ-balanced dim order) preserves
    // geometry exactly (permutation of an orthonormal full basis)
    val rot = Pca.rotateOpq(df, "vec_id", "embedding", m, 8)
      .localCheckpoint()
    val normsBefore = df.select(col("vec_id"),
      graft.functions.VectorFunctions.norm(col("embedding")).as("n"))
      .as[(Long, Double)].collect().toMap
    val normsAfter = rot.select(col("vec_id"),
      graft.functions.VectorFunctions.norm(col("embedding")).as("n"))
      .as[(Long, Double)].collect().toMap
    normsBefore.foreach { case (id, n0) =>
      assert(math.abs(n0 - normsAfter(id)) < 1e-2 * math.max(1.0, n0),
        s"rotation changed the norm of $id") }

    // equal-bytes PQ (m=8 subspaces, ksub=16, one IVF cell so pure
    // ADC ranking decides): recall@10 vs brute force, raw vs rotated
    def recallAt10(corpus: org.apache.spark.sql.DataFrame): Double = {
      val queries = corpus.filter(col("vec_id") < 40)
      val truth = Ann.bruteForceTopK(corpus, queries, "vec_id",
        "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val cents = Ann.trainCentroids(corpus, "vec_id", "embedding",
        k = 1, iters = 1).withColumnRenamed("centroid_id", "vec_id")
      val books = Ann.trainPq(corpus, "vec_id", "embedding", m = 8,
        ksub = 16, iters = 5, maxTrain = 1200)
      val got = Ann.ivfPqTopK(corpus, queries, cents, books,
        "vec_id", "embedding", k = 10, nprobe = 1, refine = 0)
        .select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val per = truth.map { case (q, t) =>
        (t & got.getOrElse(q, Set.empty)).size.toDouble / t.size }
      per.sum / per.size
    }
    val raw = recallAt10(df)
    val rotated = recallAt10(rot)
    assert(rotated >= raw,
      s"rotated PQ recall $rotated below raw $raw at equal bytes")
    assert(rotated - raw > 0.02,
      s"rotation bought no recall on the anisotropic fixture " +
        s"($raw -> $rotated) — fixture or rotate() broken")
    // and the BALANCED allocation is what wins — the naive PCA order
    // concentrates variance in subspace 0 and measurably loses
    val naive = recallAt10(
      Pca.rotate(df, "vec_id", "embedding", m).localCheckpoint())
    assert(rotated > naive,
      s"balanced allocation $rotated not above naive PCA order $naive")
  }

  test("q176's anisotropic view fires the guard on the real embeddings") {
    // the registered query scales dim i by 0.87^i; that view's
    // eigen spread must clear the bar so the rotation branch is the
    // one the query actually exercises (were the raw corpus used,
    // the guard would skip — also checked)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val scaled = e.select(col("vec_id"),
      zip_with(col("embedding"),
        sequence(lit(0), size(col("embedding")) - 1),
        (x, i) => (x * pow(lit(0.87), i)).cast("float")).as("embedding"))
    val m = Pca.train(scaled, "vec_id", "embedding", k = 64)
    assert(Pca.opqRecommended(m),
      s"scaled view spread ${Pca.eigenSpread(m)} under the bar")
    val raw = Pca.train(e, "vec_id", "embedding", k = 64)
    assert(!Pca.opqRecommended(raw),
      s"raw isotropic corpus spread ${Pca.eigenSpread(raw)} fired")
  }

  test("frozen q167 model equals the sf0.01 trainer output") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val m = Pca.train(e, "vec_id", "embedding", k = 4)
    assert(m.components == SparkEntry.PcaComps, "components drifted")
    assert(m.offsets == SparkEntry.PcaOffsets, "offsets drifted")
    assert(m.scales == SparkEntry.PcaScales, "scales drifted")
  }
}
