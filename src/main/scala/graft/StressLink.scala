package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.FuzzyMatch

/** Dev utility: skew stress for the salted FuzzyMatch.link shuffle-join
  * path. Equal row counts, uniform blocks (50 even) vs skewed (half the
  * left rows in ONE block), roster NOT broadcast so the block key is a
  * real shuffle key. A healthy salted run keeps the skewed time within
  * ~2x of uniform; unsalted, the hot block serialises on one core.
  * `runMain graft.StressLink [nLeft] [saltBuckets]`
  */
object StressLink {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val salt = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.skewJoin.enabled", sys.env.getOrElse("STRESS_AQE_SKEW", "true"))
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join path
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def side(blocks: org.apache.spark.sql.Column) =
      spark.range(n.toLong).select(
        col("id"),
        concat(lit("First"), col("id").cast("string")).as("fn"),
        concat(lit("LastName"), col("id").cast("string")).as("ln"),
        blocks.cast("int").as("blk"))

    val uniformBlk = col("id") % 50
    // half the rows land in block 0, rest spread over 49 blocks
    val skewedBlk = when(col("id") % 2 === 0, lit(0)).otherwise(col("id") % 49 + 1)

    val roster = spark.range(2000L).select(
      col("id").as("rid"),
      concat(lit("FirstR"), col("id").cast("string")).as("rfn"),
      concat(lit("LastNameR"), col("id").cast("string")).as("rln"),
      (col("id") % 50).cast("int").as("rblk"))

    val wr = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      call_function("w_ratio", a, b)
    val rules = Seq(
      FuzzyMatch.Rule("fn", Seq("rfn"), wr, 80),
      FuzzyMatch.Rule("ln", Seq("rln"), wr, 80))

    def run(name: String, blocks: org.apache.spark.sql.Column, s: Int): Double = {
      val df = FuzzyMatch.link(side(blocks), roster, "id", "rid", "blk", "rblk",
        rules, requiredOverall = 80, broadcastRight = false, saltBuckets = s)
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STRESS $name%-22s $sec%.2f s")
      sec
    }

    val u = run(s"uniform salt=$salt", uniformBlk, salt)
    val sk = run(s"skewed  salt=$salt", skewedBlk, salt)
    val sk1 = run("skewed  salt=1", skewedBlk, 1)
    println(f"STRESS ratio salted=${sk / u}%.2f unsalted=${sk1 / u}%.2f")
    spark.stop()
  }
}
