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

  test("frozen q167 model equals the sf0.01 trainer output") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val m = Pca.train(e, "vec_id", "embedding", k = 4)
    assert(m.components == SparkEntry.PcaComps, "components drifted")
    assert(m.offsets == SparkEntry.PcaOffsets, "offsets drifted")
    assert(m.scales == SparkEntry.PcaScales, "scales drifted")
  }
}
