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
  * strictly better than the BNLJ inequality join it replaces; if a
  * real corpus ever concentrates events that hard, the fix is a
  * two-level variant (range-partition each hot key by time, carry the
  * last right row of each chunk forward as a boundary row) — not
  * needed until a single key approaches a partition's memory.
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
}
