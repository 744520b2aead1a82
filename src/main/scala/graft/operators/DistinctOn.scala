package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Postgres `SELECT DISTINCT ON (keys) ... ORDER BY keys, ord` emulation.
  *
  * The reference's roster queries all lead with `DISTINCT ON
  * (candidate_id)` (reference: queries/election_candidates_by_electionyear
  * .sql:9). Spark has no DISTINCT ON; the equivalent declarative plan is a
  * `row_number` window partitioned by the keys — a single hash shuffle on
  * the key, no sort of the whole relation, and Catalyst keeps filters
  * pushed below the window when they reference only partition keys.
  *
  * Scale note: this shuffles once on `keys`; at 100 TB that is the minimum
  * possible work for this semantic. Skewed keys are handled by AQE skew
  * splitting since the window partitions by the same key as the shuffle.
  */
object DistinctOn {
  /** Keep the first row per key combination under `order`. */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
