package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (binned) range join: pairs of rows whose numeric/timestamp
  * values lie within a window of each other, in the same key group.
  * The naive SQL (`a.key = b.key AND abs(a.v - b.v) <= w`) carries an
  * inequality predicate, so Spark plans the key equi-part as a join and
  * re-checks the band per pair — fine — but when the key is ABSENT or
  * low-cardinality, the plan degenerates toward nested-loop. The scale
  * formulation bins values into window-sized buckets: a pair within `w`
  * is always in the same or adjacent bin, so joining on
  * (key, bin) with the left side exploded to {bin-1, bin, bin+1} makes
  * the whole predicate an EQUI-join (hash/sort-merge, AQE-skew-safe),
  * with the exact band filter applied post-join. Candidate volume is
  * bounded by bin occupancy, never |A|x|B|.
  *
  * Emits each unordered pair once (a_id < b_id); `gap_ms` is signed
  * (b's time minus a's — pairs are ordered by id, not time).
  */
object RangeJoin {

  /** Pairs of events within `windowMs` milliseconds per key.
    *
    * @param df      input rows
    * @param keys    equality key columns (may be empty: pure band join)
    * @param idCol   unique row id (pair dedup + ordering)
    * @param tsMs    millisecond-valued column expression to band on
    */
  def withinWindow(
      df: DataFrame, keys: Seq[String], idCol: String, tsMs: Column,
      windowMs: Long): DataFrame = {
    require(windowMs > 0, "windowMs must be positive")
    val base = df.select(
      keys.map(col) ++ Seq(col(idCol).as("__id"), tsMs.as("__ms")): _*)
    // right side sits in its own bin; left probes bin-1, bin, bin+1
    val binned = base.withColumn("__bin", floor(col("__ms") / windowMs))
    val probe = binned.withColumn("__bin",
      explode(array(col("__bin") - 1, col("__bin"), col("__bin") + 1)))
    val joinKeys = keys :+ "__bin"
    val a = probe.select(joinKeys.map(col) :+ col("__id").as("a_id") :+
      col("__ms").as("__ams"): _*)
    val b = binned.select(joinKeys.map(col) :+ col("__id").as("b_id") :+
      col("__ms").as("__bms"): _*)
    // each pair matches exactly once: the join key is b's home bin and
    // a's three probe bins are distinct, so no post-join distinct needed
    a.join(b, joinKeys, "inner")
      .filter(col("a_id") < col("b_id") &&
        abs(col("__ams") - col("__bms")) <= windowMs)
      .select((keys.map(col) :+ col("a_id") :+ col("b_id") :+
        (col("__bms") - col("__ams")).as("gap_ms")): _*)
  }
}
