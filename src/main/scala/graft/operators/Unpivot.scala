package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide → long reshape (ref: the per-session scorecard columns in
  * national/_674/ratings/extract.py:27-33, which the reference melts
  * into one row per (candidate, session)).
  *
  * Uses Dataset.unpivot (Spark 3.4+) — a narrow map-side transform, no
  * shuffle; nulls in value columns are dropped (pandas melt keeps NaN,
  * the reference then discards them).
  */
object Unpivot {
  def apply(
      df: DataFrame,
      ids: Seq[String],
      values: Seq[String],
      varName: String,
      valueName: String,
      dropNulls: Boolean = true): DataFrame = {
    val out = df.unpivot(
      ids.map(col).toArray,
      values.map(col).toArray,
      varName, valueName)
    if (dropNulls) out.filter(col(valueName).isNotNull) else out
  }
}
