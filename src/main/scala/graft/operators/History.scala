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

  /** Apply ONE new full snapshot to an existing SCD2 history without
    * recollapsing it — the production nightly merge ([[scd2]] is the
    * initial backfill; at scale the history is never re-derived from
    * all snapshots). Current rows whose tracked attributes differ
    * (null-safely) from the new snapshot close at the snapshot date
    * and a new current version opens; keys new to the history open
    * their first version; keys absent from the snapshot keep their
    * current row (a skipped load is a gap, and gaps don't split
    * versions — same contract as [[scd2]]). The result is row-identical
    * to running [[scd2]] over all snapshots including the new one
    * (HistorySpec pins the equivalence).
    *
    * Scale shape: closed rows and past rows pass through untouched —
    * only the (small) current slice joins the snapshot, one hash
    * exchange per side, semi/anti reuse it; output = history +
    * changed-key rows. Partition the stored history by `is_current`
    * and the closed majority never even scans. */
  def scd2Apply(history: DataFrame, snapshot: DataFrame, keyCol: String,
      dateCol: String, tracked: Seq[String]): DataFrame = {
    require(tracked.nonEmpty, "scd2Apply: at least one tracked column")
    val past = history.filter(!col("is_current"))
    val cur = history.filter(col("is_current")).localCheckpoint(false)
    val snap = snapshot.select(
      col(keyCol) +: (tracked.map(col) :+ col(dateCol).as("__d")): _*)
      .localCheckpoint(false)
    val curK = cur.select(col(keyCol).as("__ck") +:
      tracked.map(c => col(c).as(s"__c_$c")): _*)
    val snapState = struct(tracked.map(col): _*)
    val curState = struct(tracked.map(c => col(s"__c_$c")): _*)
    // snapshot rows that open a version: no current row, or a change
    val opening = snap.join(curK, col(keyCol) === col("__ck"), "left")
      .filter(col("__ck").isNull || !(snapState <=> curState))
      .select(col(keyCol) +: (tracked.map(col) :+ col("__d")): _*)
      .localCheckpoint(false)
    val openingKeys = opening.select(col(keyCol).as("__ok"), col("__d"))
    // current rows for changed keys close at the snapshot date
    val closed = cur.join(openingKeys, col(keyCol) === col("__ok"))
      .withColumn("valid_to", col("__d"))
      .withColumn("is_current", lit(false))
      .drop("__ok", "__d")
    val untouched = cur.join(openingKeys, col(keyCol) === col("__ok"),
      "left_anti")
    val opened = opening.select(
      col(keyCol) +: (tracked.map(col) ++ Seq(
        col("__d").as("valid_from"),
        lit(null).cast(history.schema("valid_to").dataType).as("valid_to"),
        lit(true).as("is_current"))): _*)
    past.unionByName(untouched).unionByName(closed).unionByName(opened)
  }

  /** Apply a CDC change feed to a snapshot (SCD type 1 merge): the
    * highest-`seqCol` row per key wins, and a winning delete (`opCol`
    * = "D") removes the key. Changes carry the snapshot's payload
    * columns plus (seqCol, opCol); snapshot rows participate as
    * upserts at sequence 0, so a feed that never touched a key leaves
    * its snapshot row as-is, and a delete followed by a
    * higher-sequence upsert re-inserts the key.
    *
    * Scale shape: ONE hash exchange on the key — the union is
    * shuffle-free, latest-wins is [[DistinctOn]]'s single keyed
    * window (AQE splits skewed keys), the delete filter is a pure
    * projection on top. Output ≤ |snapshot| + |upserted keys|. At
    * 100 TB the snapshot side dominates and moves exactly once,
    * which is the lower bound for a keyed merge.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
      keyCol: String, seqCol: String, opCol: String): DataFrame = {
    val base = snapshot
      .withColumn(seqCol, lit(0L))
      .withColumn(opCol, lit("U"))
    val all = base.unionByName(changes.select(base.columns.map(col): _*))
    DistinctOn(all, Seq(col(keyCol)), Seq(col(seqCol).desc))
      .filter(col(opCol) =!= "D")
      .drop(seqCol, opCol)
  }
}
