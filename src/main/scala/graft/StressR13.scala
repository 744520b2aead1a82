package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.FuzzyMatch

/** A/B isolation for the r13 fuzzy-linkage changes: the q43 fixture
  * scored with and without the equal-fast scorer short-circuit,
  * INTERLEAVED in one JVM so host-speed drift between runs (the r12/
  * r13 records' dominant noise) cancels out of the comparison. Prints
  * per-variant medians — numbers go to SURVEY §6 / the round notes. */
object StressR13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // the q43 fixture (SparkEntry.q43's construction, verbatim shape)
    val k = col("c_custkey")
    val base = spark.read.parquet(s"$dir/customer.parquet").select(
      k.as("id"),
      concat(lit("First"), (k % 97).cast("string")).as("firstname"),
      when(k % 3 === 0,
        concat(call_function("char", lit(65) + (k % 26).cast("int")), lit("."))
      ).otherwise(lit("")).as("middlename"),
      concat(lit("Last"), (k % 53).cast("string")).as("lastname"),
      concat(lit("Nick"), (k % 41).cast("string")).as("nickname"),
      element_at(array(lit("Jr."), lit("Sr."), lit("")), (k % 3).cast("int") + 1)
        .as("suffix"),
      element_at(array(lit("U.S. House"), lit("U.S. Senate")),
        (k % 2).cast("int") + 1).as("office"),
      regexp_replace((k % 25).cast("string"), "^0+", "").as("district"),
      element_at(array(lit("Republican"), lit("Democratic"), lit("Independent")),
        (k % 3).cast("int") + 1).as("party"),
      (k % 50).cast("int").as("state_id"))
    val scraped = base.select(
      col("id").as("s_id"),
      when(col("id") % 13 === 0, col("nickname"))
        .otherwise(lower(col("firstname"))).as("firstname"),
      col("middlename"), col("lastname"), col("suffix"),
      col("office"), col("district"), col("party"), col("state_id"))
      .withColumn("__mid_lc", lower(col("middlename")))
    val roster = base.select(
      col("id").as("r_id"), col("firstname"), col("middlename"),
      col("lastname"), col("nickname"), col("suffix"),
      col("office"), col("district"), col("party"),
      col("state_id").as("r_state_id"))
      .withColumn("__mid_lc", lower(col("middlename")))
    val wr = (a: Column, b: Column) => call_function("w_ratio", a, b)
    val ptr = (a: Column, b: Column) =>
      call_function("partial_token_ratio", a, b)
    val rules = Seq(
      FuzzyMatch.Rule("firstname", Seq("firstname", "middlename", "nickname"),
        wr, threshold = 85),
      FuzzyMatch.Rule("__mid_lc", Seq("__mid_lc"), ptr, threshold = 90),
      FuzzyMatch.Rule("lastname", Seq("lastname"), wr, threshold = 88),
      FuzzyMatch.Rule("suffix", Seq("suffix"), wr, threshold = 98),
      FuzzyMatch.Rule("office", Seq("office"), wr, threshold = 100),
      FuzzyMatch.Rule("district", Seq("district"), wr, threshold = 95),
      FuzzyMatch.Rule("party", Seq("party"), wr, threshold = 100))
    def link(fast: Boolean): DataFrame = FuzzyMatch.link(
      scraped, roster, "s_id", "r_id", "state_id", "r_state_id",
      rules, requiredOverall = 75, dupMargin = 3.0, equalFast = fast)

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both plans, then interleave timed passes
    time(link(true)); time(link(false))
    val n = args.headOption.map(_.toInt).getOrElse(5)
    val fast = scala.collection.mutable.ListBuffer.empty[Double]
    val slow = scala.collection.mutable.ListBuffer.empty[Double]
    for (_ <- 1 to n) {
      fast += time(link(true))
      slow += time(link(false))
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    println(f"AB q43 equalFast=true  passes ${fast.map(x => f"$x%.2f").mkString(",")}  median ${med(fast.toSeq)}%.2f s")
    println(f"AB q43 equalFast=false passes ${slow.map(x => f"$x%.2f").mkString(",")}  median ${med(slow.toSeq)}%.2f s")
    spark.stop()
  }
}
