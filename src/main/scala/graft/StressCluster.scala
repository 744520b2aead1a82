package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev stress for connected components: worst-case topology (one long
  * chain — maximum diameter, where naive min-propagation needs
  * O(diameter) rounds) and a realistic near-dup graph (many small
  * clusters + a few big ones), at millions of edges. */
object StressCluster {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => (Long, Long, Int)): Unit = {
      val t0 = System.nanoTime()
      val (nodes, comps, rounds) = f
      println(f"SCALE $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  ($nodes%d nodes, $comps%d components, $rounds%d rounds)")
    }

    // 1M-node single chain: i -- i+1, shuffled ids so the chain order
    // carries no locality
    val n = 1000000L
    val chain = spark.range(n - 1).select(
      xxhash64(col("id")).as("a"), xxhash64(col("id") + 1).as("b"))
    time("chain 1M nodes (diameter 1M)") {
      val (cc, rounds) = Dedup.connectedComponentsWithRounds(chain, "a", "b")
      (cc.count(), cc.select("component").distinct().count(), rounds)
    }

    // realistic near-dup graph: 2M nodes, 500k clusters of size 2-6
    // (geometric-ish), edges star-shaped within cluster + 10% extra
    // random intra-cluster edges
    val clusters = spark.range(500000L).select(
      col("id").as("cid"),
      (pmod(xxhash64(col("id")), lit(5)) + 2).as("sz"))
    val members = clusters.select(col("cid"),
      explode(sequence(lit(1), col("sz"))).as("i"))
      .select(col("cid"), (col("cid") * 10 + col("i")).as("node"))
    val edges = members.groupBy("cid")
      .agg(min(col("node")).as("hub"), collect_list(col("node")).as("ns"))
      .select(col("hub"), explode(col("ns")).as("node"))
      .filter(col("hub") =!= col("node"))
    time("near-dup graph 1.5M edges") {
      val (cc, rounds) = Dedup.connectedComponentsWithRounds(edges, "hub", "node")
      (cc.count(), cc.select("component").distinct().count(), rounds)
    }

    // full pipeline on the r4 stress corpus when present: LSH pairs →
    // verify → clusters → survivors
    val stressDocs = new java.io.File("/tmp/stress/documents.parquet")
    if (stressDocs.exists()) {
      val docs = spark.read.parquet(stressDocs.getPath)
      time("dropNearDuplicates 200k docs") {
        val kept = Dedup.dropNearDuplicates(docs, "doc_id", "text",
          shingleN = 3, numHashes = 48, bands = 16, threshold = 0.5)
        (kept.count(), 0L, 0)
      }
    }
    spark.stop()
  }
}
