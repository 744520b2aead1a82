package graft.operators

import org.apache.spark.sql.DataFrame

/** Guards CPU-bound narrow stages against under-partitioned inputs.
  *
  * A single-file / single-row-group parquet scan yields one partition,
  * which serialises per-row-expensive operators (signature hashing,
  * pairwise scoring) onto one core no matter how many executors exist.
  * On a real cluster the scan usually has plenty of splits and this is
  * a no-op; when it doesn't, one cheap shuffle of the (pre-projection)
  * input buys full parallelism for the expensive stage.
  */
object Parallelism {

  /** Repartition up to the cluster's default parallelism iff the
    * current plan has fewer partitions. */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
