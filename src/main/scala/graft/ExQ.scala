package graft
import org.apache.spark.sql.SparkSession
object ExQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    println("EXCHANGES=" + "Exchange".r.findAllIn(plan).length)
    println("REUSED=" + "ReusedExchange".r.findAllIn(plan).length)
    println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan parquet")).mkString("\n"))
    spark.stop()
  }
}
