package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history over periodic full snapshots —
  * the warehouse operation that turns "a fresh copy of the dimension
  * every load" into versioned validity intervals (SCD type 2). The
  * reference re-stages full roster/candidate pulls every run into
  * timestamped stage folders (votervoice/__main__.py:15 writes one
  * dated export per run); answering "what did this row look like on
  * date D" over those piles is exactly this collapse.
  *
  * Scale shape: ONE hash exchange on the entity key — change
  * detection (lag), version numbering (running sum) and the
  * interval-close pass (lead) all share the (key, date) sort, and the
  * per-version rollup groups on the same key, so everything after the
  * single exchange is exchange-free. Attribute payloads ride along;
  * nothing fans out: output rows ≤ input rows.
  */
object History {

  /** Collapse one-row-per-(entity, snapshot date) full snapshots into
    * SCD2 validity intervals.
    *
    * A version is a maximal run of consecutive snapshots (per key,
    * date-ordered) whose `tracked` attributes are all equal
    * (null-safe). Output: one row per version — key, the tracked
    * attributes, `valid_from` (first snapshot date of the run),
    * `valid_to` (the NEXT version's valid_from; null while current)
    * and `is_current`. A gap in snapshot dates does NOT split a
    * version: versions change when values change, not when loads skip
    * a day.
    */
  def scd2(snapshots: DataFrame, keyCol: String, dateCol: String,
      tracked: Seq[String]): DataFrame = {
    require(tracked.nonEmpty, "scd2: at least one tracked column")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
    val state = struct(tracked.map(col): _*)
    // Null-safe: first row (lag null) and any attribute change start a
    // new version. struct equality compares all tracked fields at once.
    val changed = !(lag(state, 1).over(w) <=> state)
    val versions = snapshots
      .withColumn("__ver", sum(changed.cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__ver"))
      .agg(min(col(dateCol)).as("valid_from"),
        tracked.map(c => first(col(c)).as(c)): _*)
    val wv = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"))
    versions
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__ver")
      .select(col(keyCol) +: (tracked.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current"))): _*)
  }
}
