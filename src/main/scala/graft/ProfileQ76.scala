package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Dedup}

/** Dev scratch: stage breakdown of q76 (semantic dedup) at sf0.1 —
  * train vs assign vs pair-scoring vs connected components. */
object ProfileQ76 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    println(s"n = ${vecs.count()}")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (pass <- 1 to 2) {
      println(s"-- pass $pass")
      val cents = t("train") {
        Ann.trainCentroids(vecs, "vec_id", "embedding", 16, 2, 42L)
          .localCheckpoint()
      }
      val assigned = t("assign") {
        val a = Ann.assignBuckets(vecs,
          cents.select(col("centroid_id").as("vec_id"), col("embedding")),
          "vec_id", "embedding")
          .select(col("vec_id").as("__id"), col("embedding").as("__v"),
            norm(col("embedding")).as("__n"), col("centroid_id"))
          .repartition(col("centroid_id"))
          .localCheckpoint(false)
        a.count(); a
      }
      val edges = t("pairs") {
        val a = assigned.select(col("centroid_id"), col("__id").as("a_id"),
          col("__v").as("__va"), col("__n").as("__na"))
        val b = assigned.select(col("centroid_id").as("__c2"),
          col("__id").as("b_id"), col("__v").as("__vb"), col("__n").as("__nb"))
        val e = a.join(b, col("centroid_id") === col("__c2") &&
            col("a_id") < col("b_id"))
          .filter(cosinePrenormed(dot(col("__va"), col("__vb")),
            col("__na"), col("__nb")) >= 0.35)
          .select("a_id", "b_id").localCheckpoint(false)
        println(s"  edges = ${e.count()}")
        e
      }
      val cc = t("components") {
        val c = Dedup.connectedComponents(edges, "a_id", "b_id")
        c.count(); c
      }
      t("keepers+anti") {
        val centN = cents.select(col("centroid_id"),
          col("embedding").as("__cv"), norm(col("embedding")).as("__cn"))
        val simToCent = assigned.join(broadcast(centN), "centroid_id")
          .select(col("__id").as("id"),
            cosinePrenormed(dot(col("__v"), col("__cv")),
              col("__n"), col("__cn")).as("__sc"))
        val keepers = cc.join(simToCent, "id")
          .groupBy(col("component"))
          .agg(min(struct(col("__sc"), col("id"))).as("__k"))
          .select(col("__k.id").as("id"))
        val losers = cc.join(keepers, Seq("id"), "left_anti")
          .select(col("id").as("vec_id"))
        vecs.join(losers, Seq("vec_id"), "left_anti").count()
      }
    }
    spark.stop()
  }
}
