package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * `right.ts <= left.ts` in the same key group — the standard
  * event-enrichment shape (e.g. each purchase annotated with the last
  * view before it) that plain SQL joins express only as an
  * inequality join, which Spark executes as a broadcast-nested-loop.
  *
  * Spark-first plan: NO join at all. Both sides union into one stream
  * tagged by side, one window over (keys) ordered by (ts, side) carries
  * the latest right payload forward (`last(_, ignoreNulls)` over an
  * unbounded-preceding frame), and left rows project it out. Cost: a
  * single hash exchange on the keys + one sort — the same price as one
  * shuffle join, but with no candidate blow-up and no range search.
  * Right rows at the exact left ts match (right sorts before left on
  * the tie via the side tag, matching ASOF's `>=`).
  *
  * Left rows with no prior right row keep null payloads (ASOF LEFT
  * JOIN semantics). If several right rows share one (key, ts), the
  * greatest payload struct wins (deterministic; cross-engine oracle
  * parity then requires (key, ts) unique on the right, which event
  * streams with sub-second timestamps satisfy).
  *
  * Skew bound: like every keyed window, one pathological key (a single
  * user holding a large fraction of all events) serialises that key's
  * sort into one task — the per-task cost is O(max-key-rows log
  * max-key-rows), not O(total). That is the standard as-of plan and
  * strictly better than the BNLJ inequality join it replaces; when a
  * single key approaches a partition's memory, use [[asOfSkewed]] —
  * the two-level variant that range-partitions time into chunks and
  * carries each chunk's last right row forward as a boundary payload.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightPayload: Seq[String], prefix: String = "right_"): DataFrame = {
    require(keys.nonEmpty, "asOf needs at least one key column")
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftType = left.select(leftStruct).schema.head.dataType

    val l = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__side"),
        leftStruct.as("__l"),
        lit(null).cast(payloadType).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__side"),
        lit(null).cast(leftType).as("__l"),
        payloadStruct.as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(n => col(s"__l.$n").as(n)).toSeq ++
        rightPayload.map(n => col(s"__m.$n").as(s"$prefix$n")): _*)
  }

  /** The two-level variant for pathologically hot keys — same output as
    * [[asOf]], row for row.
    *
    * [[asOf]]'s window serialises each key's sort into one task; when a
    * single key holds a large fraction of all events that task becomes
    * the straggler (and eventually the memory bound). Here time is cut
    * into `chunks` range buckets (boundaries from one constant-memory
    * approx-quantile sketch of the right side's timestamps, applied to
    * BOTH sides so equal timestamps land in equal chunks):
    *
    *  1. level 1 runs the union+window per (key, chunk) — max task is
    *     ~1/chunks of the hot key;
    *  2. each chunk's LAST right payload aggregates per (key, chunk)
    *     (map-side combined, tiny output);
    *  3. a second window carries those chunk-last payloads forward per
    *     key over the chunk axis (partitions of ≤ `chunks` rows);
    *  4. left rows with no within-chunk match coalesce to the carried
    *     boundary payload.
    *
    * Three extra bounded exchanges buy an O(hot-key/chunks) task bound
    * — use when a key approaches a partition's memory, [[asOf]]
    * otherwise. */
  def asOfSkewed(
      left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightPayload: Seq[String], prefix: String = "right_",
      chunks: Int = 32, relErr: Double = 0.01): DataFrame = {
    require(keys.nonEmpty, "asOfSkewed needs at least one key column")
    require(chunks >= 2, "asOfSkewed: chunks >= 2 (chunks = 1 is asOf)")
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftType = left.select(leftStruct).schema.head.dataType

    val bounds = right.select(col(tsCol).cast("double").as("__t"))
      .stat.approxQuantile("__t",
        (1 until chunks).map(_.toDouble / chunks).toArray, relErr)
    val chunkOf = graft.functions.LayoutFunctions
      .quantileBucket(col("__ts").cast("double"), bounds)

    val l = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__side"),
        leftStruct.as("__l"),
        lit(null).cast(payloadType).as("__r")): _*)
      .withColumn("__chunk", chunkOf)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__side"),
        lit(null).cast(leftType).as("__l"),
        payloadStruct.as("__r")): _*)
      .withColumn("__chunk", chunkOf)
    val u = l.unionByName(r)

    val chunkKeyCols = (keys :+ "__chunk").map(col)
    val w1 = Window.partitionBy(chunkKeyCols: _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val level1 = u
      .withColumn("__m1", last(col("__r"), ignoreNulls = true).over(w1))

    // every (key, chunk) either side touches needs a carry row — a left
    // row in a right-empty chunk must still see earlier chunks' payload
    val chunkKeys = u.select(chunkKeyCols: _*).distinct()
    val chunkLast = r.groupBy(chunkKeyCols: _*)
      .agg(max(struct(col("__ts"), col("__r"))).as("__last"))
    val wc = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__chunk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = chunkKeys
      .join(chunkLast, keys :+ "__chunk", "left")
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wc))
      .select(chunkKeyCols :+ col("__carry.__r").as("__cr"): _*)

    level1.filter(col("__side") === 1)
      .join(carry, keys :+ "__chunk", "left")
      .withColumn("__m", coalesce(col("__m1"), col("__cr")))
      .select(left.columns.map(n => col(s"__l.$n").as(n)).toSeq ++
        rightPayload.map(n => col(s"__m.$n").as(s"$prefix$n")): _*)
  }

  /** First-match-within-window join — [[asOf]]'s dual: for each left
    * row, attach the EARLIEST right row with `right.ts` in
    * `[left.ts − windowMs, left.ts]` in the same key group (the
    * first-touch attribution shape: each purchase credited to the
    * first view in the preceding window, not the last).
    *
    * Carrying-forward can't express "earliest within a bounded band"
    * (old matches must expire), so the window here is a RANGE frame:
    * both sides union tagged, ordered per key by epoch millis, and
    * `min(payload-struct)` over `rangeBetween(-windowMs, 0)` finds the
    * earliest in-band right row for every row position — left rows
    * project it, right rows are dropped. Still NO join and ONE hash
    * exchange, same as [[asOf]]. The payload struct leads with the
    * millis, so min = earliest (ties by the remaining payload fields,
    * deterministic given unique ids).
    *
    * Cost note: min is not invertible, so Spark re-scans each sliding
    * range frame — per-task cost is O(rows × max in-band rows per
    * key), the band's own candidate bound (same bound the q55 banded
    * join carries). Left rows with no in-band right keep null payloads.
    */
  def firstWithin(
      left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightPayload: Seq[String], windowMs: Long,
      prefix: String = "first_"): DataFrame = {
    require(keys.nonEmpty, "firstWithin needs at least one key column")
    require(windowMs > 0, "windowMs must be positive")
    import graft.functions.TimeFunctions.tsMillis
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val payloadStruct = struct(
      tsMillis(col(tsCol)).as("__rms") +: rightPayload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftType = left.select(leftStruct).schema.head.dataType

    val l = left.select(
      keys.map(col) ++ Seq(
        tsMillis(col(tsCol)).as("__ms"), lit(1).as("__side"),
        leftStruct.as("__l"),
        lit(null).cast(payloadType).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        tsMillis(col(tsCol)).as("__ms"), lit(0).as("__side"),
        lit(null).cast(leftType).as("__l"),
        payloadStruct.as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ms"))
      .rangeBetween(-windowMs, 0)

    l.unionByName(r)
      .withColumn("__m", min(col("__r")).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(n => col(s"__l.$n").as(n)).toSeq ++
        (col("__m.__rms").as(s"${prefix}ms") +:
          rightPayload.map(n => col(s"__m.$n").as(s"$prefix$n"))): _*)
  }
}
