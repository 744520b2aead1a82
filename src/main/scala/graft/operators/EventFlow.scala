package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey analytics over an event stream — the ordered-sequence
  * queries (funnel, cohort retention) a product/events warehouse runs
  * beside the windowed aggregates (q20/q21).
  *
  * Both operators key every shuffle on the user id: the funnel is a
  * chain of min-over-partition windows sharing ONE partition spec (one
  * exchange, no sort — the windows are unordered full-partition mins),
  * and retention is two user-keyed aggregates whose final rollup is
  * cohort-bounded. Event payloads never fan out; at 100 TB the plans
  * move (user, ts) pairs only.
  */
object EventFlow {

  /** Step definition: `name` matches `typeCol`'s value. */
  final case class Step(name: String)

  /** Ordered conversion funnel: for each user, step 1 anchors at the
    * user's EARLIEST step-1 event; each later step matches its earliest
    * event STRICTLY AFTER the previous step's match and within
    * `windowDays` of the anchor (the standard product-analytics funnel
    * semantics: fixed conversion window from entry, strict ordering).
    * Output: one row per step — (step_no, step, users reached).
    *
    * Plan shape: filter to step events at the scan (pushed), then one
    * hash exchange on the user; each step's match time is a
    * min-over-partition window that references the previous step's
    * column, so the chain is N Window operators over the SAME
    * unordered partition spec — Catalyst collapses them onto one
    * exchange with no sorts. The per-user reduction and the final
    * 3-row rollup are map-side-combined aggregates.
    */
  def funnel(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[Step], windowDays: Int): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step")
    require(steps.map(_.name).distinct.size == steps.size,
      "funnel: step names must be distinct")
    val w = Window.partitionBy(col("__u"))
    val base = events
      .filter(col(typeCol).isin(steps.map(_.name): _*))
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(typeCol).as("__t"))
    val deadline = col("__t1") + expr(s"INTERVAL $windowDays DAYS")
    val withTimes = steps.zipWithIndex.foldLeft(base) {
      case (df, (step, 0)) =>
        df.withColumn("__t1",
          min(when(col("__t") === step.name, col("__ts"))).over(w))
      case (df, (step, i)) =>
        df.withColumn(s"__t${i + 1}",
          min(when(col("__t") === step.name &&
              col("__ts") > col(s"__t$i") && col("__ts") <= deadline,
            col("__ts"))).over(w))
    }
    val perUser = withTimes
      .groupBy(col("__u"))
      .agg(min(col("__t1")).as("__m1"),
        steps.indices.drop(1).map(i =>
          min(col(s"__t${i + 1}")).as(s"__m${i + 1}")): _*)
    perUser
      .select(explode(array(steps.zipWithIndex.map { case (step, i) =>
        struct(lit(i + 1).as("step_no"), lit(step.name).as("step"),
          col(s"__m${i + 1}").isNotNull.as("__reached"))
      }: _*)).as("__s"))
      .filter(col("__s.__reached"))
      .groupBy(col("__s.step_no").as("step_no"), col("__s.step").as("step"))
      .agg(count(lit(1)).as("users"))
  }

  /** Weekly cohort retention: users cohort by the ISO week (Monday
    * truncation) of their first event; each (user, active week) pair
    * counts once; output is the classic retention triangle —
    * (cohort_week, week_offset, users). Two user-keyed shuffles (first
    * event + distinct active weeks) that AQE plans back-to-back on the
    * same key, then a cohort×offset-bounded rollup.
    */
  def retention(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val wk = to_date(date_trunc("week", col(tsCol)))
    val first = events
      .groupBy(col(userCol).as("__u"))
      .agg(min(wk).as("cohort_week"))
    val active = events
      .select(col(userCol).as("__u"), wk.as("__wk"))
      .distinct()
    active
      .join(first, Seq("__u"))
      .groupBy(col("cohort_week"),
        (datediff(col("__wk"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** Exact cumulative distinct users by day — the corpus/product
    * growth curve ("how many unique users/contributors ever, as of
    * each day") that naive SQL writes as COUNT(DISTINCT) OVER (ORDER
    * BY day), a plan that re-deduplicates the entire history per day.
    *
    * The identity that makes it distributable: a user enters the
    * cumulative count exactly once, on their FIRST day — so reduce to
    * (user → min day) with a map-side-combined aggregate, roll up new
    * users per day, and prefix-sum the day-grain table. The running
    * sum's window is global but bounded by construction: one row per
    * DAY (a decade ≈ 3.7k rows — the trainCentroids allowance, pinned
    * in PlanAuditSpec), after two aggregates that both combine
    * map-side. The raw stream shuffles once, on the user key.
    */
  def cumulativeUsers(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(min(to_date(date_trunc("day", col(tsCol)))).as("day"))
    val daily = first.groupBy(col("day"))
      .agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_users", sum(col("new_users")).over(w))
  }

  /** Peak concurrency per key: the maximum number of half-open
    * intervals [start, end) alive at once — the "how many sessions /
    * connections / jobs overlapped" question, solved with the classic
    * sweep: +1 at each start, -1 at each end, running-sum, max.
    *
    * Plan shape: the union of the two delta projections is free; the
    * running sum is one ordered window on the key (ties order by
    * delta, ends first — half-open semantics; the MAX is invariant to
    * order WITHIN equal (time, delta) rows, since equal-delta
    * neighbours only continue a monotone run), and the final per-key
    * max is an aggregate on the window's own key partitioning — ONE
    * hash exchange total (pinned in PlanAuditSpec). At 100 TB the
    * exchange moves (key, ts, ±1) triples; a key's sweep must fit one
    * partition's sort spill, which a time-bucketed pre-split (max per
    * (key, day) then a driver-free second sweep) would relax — not
    * needed at this grain.
    */
  def maxConcurrency(
      events: DataFrame, keyCol: String, startCol: Column,
      endCol: Column): DataFrame = {
    val starts = events.select(col(keyCol), startCol.as("__t"),
      lit(1).as("__d"))
    val ends = events.select(col(keyCol), endCol.as("__t"),
      lit(-1).as("__d"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts.unionByName(ends)
      .withColumn("__run", sum(col("__d")).over(w))
      .groupBy(col(keyCol))
      .agg(max(col("__run")).as("max_concurrent"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: for every consecutive (previous event type → this
    * event type) step in a user's timeline, the global count and the
    * conditional probability P(to | from) — the "what do users do
    * next" table behind funnel design and next-event prediction
    * features.
    *
    * Ordering inside a user is (ts, tieCol) so ties are deterministic
    * cross-engine. Plan shape: ONE hash exchange on the user for the
    * lag window (only (user, ts, tie, type) move); the pair rollup is
    * a map-side-combined aggregate bounded by |type vocabulary|², and
    * the per-from totals aggregate + broadcast join-back operate on
    * that already-tiny table — at 100 TB everything after the first
    * exchange is vocabulary-sized: the per-from totals are a window
    * over the REDUCED count table (bounded by construction — one row
    * per (from, to) pair), consuming the pair pipeline exactly once.
    * Probabilities are single divisions of exact counts, so
    * cross-engine parity holds at round(…, 6).
    */
  def transitions(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wTot = Window.partitionBy(col("from_type"))
    pairs.select(col("from_type"), col("to_type"), col("n"),
      round(col("n") / sum(col("n")).over(wTot), 6).as("p"))
  }
}
