package graft.operators

import org.apache.spark.network.util.JavaUtils
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

  /** Estimated scan split count from LOGICAL plan statistics — no
    * physical planning, no job. FileSourceScan packs splittable files
    * into ~maxPartitionBytes partitions, so bytes / maxPartitionBytes
    * approximates the split count; column-pruned projections shrink
    * sizeInBytes, which only biases toward repartitioning (the safe
    * direction for a CPU-bound stage). The previous implementation
    * forced `df.rdd.getNumPartitions`, physical-planning a throwaway
    * copy of the query on every operator entry. */
  private def estimatedSplits(df: DataFrame): Long = {
    val maxPartBytes = JavaUtils.byteStringAsBytes(
      df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    (bytes / math.max(1L, maxPartBytes)).toLong + 1
  }

  /** Repartition up to the cluster's default parallelism iff the scan
    * would yield fewer splits. */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (estimatedSplits(df) < target) df.repartition(target) else df
  }
}
