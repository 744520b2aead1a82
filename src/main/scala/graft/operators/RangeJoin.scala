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

  /** Generic two-relation INTERVAL OVERLAP join: every (a, b) pair in
    * the same key group whose closed intervals intersect
    * (aStart ≤ bEnd AND bStart ≤ aEnd) — the "which maintenance
    * windows hit which sessions" shape that plain SQL writes as an
    * inequality join (nested-loop at scale).
    *
    * Banding generalised to intervals: each side explodes to EVERY
    * `binMs`-sized bin its interval touches, the join is an EQUI-join
    * on (keys, bin), and the exact overlap predicate filters
    * post-join. Two intervals that overlap share at least one bin.
    * Each pair is emitted exactly ONCE without a distinct: only in
    * the first bin both touch (bin == greatest(floor(aStart/w),
    * floor(bStart/w)) — the canonical report-once rule), so no
    * second dedup shuffle exists in the plan.
    *
    * Cost: each row lands in span/binMs + 1 bins — pick `binMs` near
    * the typical interval span (a row's fan-out is its own span
    * ratio, never a global constant), and candidate volume is bin
    * co-occupancy, never |A|×|B|. A row spanning more than
    * `maxBinsPerRow` bins raises a CLEAR error instead of silently
    * exploding the executor (the open-end-sentinel trap: one
    * 9999-12-31 end date at hour bins is ~70M bins for that row) —
    * split such intervals or raise binMs. Bin arithmetic is exact
    * integer floor division (a double `floor(x / w)` rounds the
    * operand above 2^53 and can silently mis-bin nanosecond-scale
    * values). Output: keys, a_id, b_id, and the intersection
    * [overlap_start_ms, overlap_end_ms].
    */
  def overlapJoin(
      a: DataFrame, b: DataFrame, keys: Seq[String],
      aId: String, aStart: Column, aEnd: Column,
      bId: String, bStart: Column, bEnd: Column,
      binMs: Long, maxBinsPerRow: Int = 10000): DataFrame = {
    require(binMs > 0, "binMs must be positive")
    require(maxBinsPerRow > 0, "maxBinsPerRow must be positive")
    // exact floor division on longs: subtract the (always-positive)
    // pmod first, then IntegralDivide an exact multiple — truncation
    // of an exact multiple IS the floor, negatives included
    def binOf(c: Column): Column =
      call_function("div", c - pmod(c, lit(binMs)), lit(binMs))
    def binned(df: DataFrame, id: String, s: Column, e: Column,
        side: String): DataFrame = {
      val (lo, hi) = (col(s"__${side}lo"), col(s"__${side}hi"))
      df.select(keys.map(col) ++ Seq(col(id).as(s"${side}_id"),
        s.as(s"__${side}s"), e.as(s"__${side}e")): _*)
        .filter(col(s"__${side}s") <= col(s"__${side}e"))
        .withColumn(s"__${side}lo", binOf(col(s"__${side}s")))
        .withColumn(s"__${side}hi", binOf(col(s"__${side}e")))
        .withColumn("__bin", explode(sequence(lo,
          when(hi - lo < maxBinsPerRow.toLong, hi)
            .otherwise(raise_error(format_string(
              s"overlapJoin: interval [%s, %s] spans more than " +
                s"$maxBinsPerRow bins of $binMs — raise binMs, " +
                "maxBinsPerRow, or split the interval",
              col(s"__${side}s"), col(s"__${side}e"))).cast("long")))))
        .drop(s"__${side}lo", s"__${side}hi")
    }
    val joinKeys = keys :+ "__bin"
    binned(a, aId, aStart, aEnd, "a")
      .join(binned(b, bId, bStart, bEnd, "b"), joinKeys, "inner")
      .filter(col("__as") <= col("__be") && col("__bs") <= col("__ae") &&
        col("__bin") === greatest(binOf(col("__as")), binOf(col("__bs"))))
      .select(keys.map(col) ++ Seq(col("a_id"), col("b_id"),
        greatest(col("__as"), col("__bs")).as("overlap_start_ms"),
        least(col("__ae"), col("__be")).as("overlap_end_ms")): _*)
  }
}
