package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object StressDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/tmp/stress/documents.parquet")
    val embs = spark.read.parquet("/tmp/stress/embeddings.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $name%-28s ${(System.nanoTime()-t0)/1e9}%7.2f s  ($n rows)")
    }
    time("q31 minhash cands 200k")(Dedup.minhashCandidates(docs, "doc_id", "text", 3, 48, 16).count())
    time("q33 minhash near-dup 200k")(Dedup.minhashNearDup(docs, "doc_id", "text", 3, 48, 16, 0.5).count())
    time("q32 simhash h=3 200k")(Dedup.simhashCandidates(docs, "doc_id", "text", 2, 3).count())
    time("q41 hyperplane 14p 100k")(Dedup.embeddingNearDup(embs, "vec_id", "embedding", 64, 14, 0.8).count())
    time("q30 exact dedup 200k")(Dedup.exact(docs, "doc_id", "text").count())
    spark.stop()
  }
}
