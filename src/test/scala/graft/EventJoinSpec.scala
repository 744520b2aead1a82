package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

/** As-of join (union+window, no join node) and banded range join
  * (equi-join on window bins). */
class EventJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    // (id, key, ts)
    (100L, "u1", 50L), (101L, "u1", 10L), (102L, "u2", 30L),
    (103L, "u3", 99L))
    .toDF("id", "key", "ts")
  private val right = Seq(
    // (rid, key, ts, v)
    (1L, "u1", 10L, 1.5), (2L, "u1", 40L, 2.5), (3L, "u1", 60L, 3.5),
    (4L, "u2", 31L, 9.0))
    .toDF("rid", "key", "ts", "v")

  test("asOf picks the latest right row at-or-before each left row") {
    val got = AsOfJoin.asOf(left, right, Seq("key"), "ts",
      rightPayload = Seq("rid", "v"))
      .select("id", "right_rid", "right_v")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(got(100L) == ((Some(2L), Some(2.5)))) // 40 <= 50, not 60
    assert(got(101L) == ((Some(1L), Some(1.5)))) // exact tie ts=10 matches
    assert(got(102L) == ((None, None)))          // u2's only view is AFTER
    assert(got(103L) == ((None, None)))          // no u3 rows at all
  }

  test("asOf plan has no join node and exactly one exchange") {
    val plan = AsOfJoin.asOf(left, right, Seq("key"), "ts", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1, s"want 1 exchange:\n$plan")
  }

  test("asOf prunes unused left columns through the window (q54 shape)") {
    // the left-side struct carries ALL left columns pre-window; nested
    // schema pruning must cut the ones the final projection drops, so
    // the scan never reads the wide payload (props) at 100 TB
    val q54 = SparkEntry.queries("q54_asof_join")(
      spark, "/root/testdata/sf0.001")
    val scans = q54.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!scans.contains("props"), s"props not pruned:\n$scans")
  }

  test("asOfSkewed matches asOf on the fixture, including right-empty chunks") {
    val got = AsOfJoin.asOfSkewed(left, right, Seq("key"), "ts",
      rightPayload = Seq("rid", "v"), chunks = 3)
      .select("id", "right_rid", "right_v")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(got(100L) == ((Some(2L), Some(2.5))))
    assert(got(101L) == ((Some(1L), Some(1.5))))
    assert(got(102L) == ((None, None)))
    assert(got(103L) == ((None, None))) // u3: chunk with no right rows at all
  }

  test("asOfSkewed equals asOf row-for-row on a hot-keyed random corpus") {
    // one key holds half of all events — the shape the chunked variant
    // exists for. Equality must hold at every chunk granularity.
    val n = 5000L
    val hotLeft = spark.range(n).toDF("id")
      .withColumn("key", when(pmod(col("id"), lit(2)) === 0, "hot")
        .otherwise(concat(lit("u"), pmod(col("id"), lit(97)))))
      .withColumn("ts", pmod(xxhash64(col("id"), lit(7L)), lit(10000L)))
    val hotRight = spark.range(n / 2).toDF("rid")
      .withColumn("key", when(pmod(col("rid"), lit(2)) === 0, "hot")
        .otherwise(concat(lit("u"), pmod(col("rid"), lit(97)))))
      .withColumn("ts", pmod(xxhash64(col("rid"), lit(11L)), lit(10000L)))
      .withColumn("v", (pmod(xxhash64(col("rid")), lit(1000L))).cast("double"))
      // the tie rule (greatest payload at equal (key, ts)) is engine-
      // internal; dedupe (key, ts) so equality is well-defined
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("key", "ts").orderBy(col("rid"))))
      .filter(col("__rn") === 1).drop("__rn")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "right_rid", "right_v").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    val base = asSet(AsOfJoin.asOf(hotLeft, hotRight, Seq("key"), "ts",
      rightPayload = Seq("rid", "v")))
    for (chunks <- Seq(2, 8, 32)) {
      val skewed = asSet(AsOfJoin.asOfSkewed(hotLeft, hotRight, Seq("key"),
        "ts", rightPayload = Seq("rid", "v"), chunks = chunks))
      assert(skewed === base, s"asOfSkewed diverged at chunks=$chunks")
    }
  }

  test("asOfSkewed level-1 window partitions on (key, chunk), not key alone") {
    val plan = AsOfJoin.asOfSkewed(left, right, Seq("key"), "ts",
      Seq("rid"), chunks = 4)
      .queryExecution.optimizedPlan.toString
    // the hot-key bound comes from the chunked partition spec
    assert(plan.contains("windowspecdefinition(key#") &&
      plan.contains("__chunk"), s"chunked window missing:\n$plan")
  }

  test("withinWindow finds cross-bin pairs, honors boundary, no dups") {
    val ev = Seq(
      // bins of 100: 95 and 105 are adjacent bins, gap 10
      (1L, "k", 95L), (2L, "k", 105L),
      // exact boundary gap == window
      (3L, "k", 300L), (4L, "k", 400L),
      // same position, different keys: never paired
      (5L, "x", 95L),
      // gap just over the window
      (6L, "k", 702L), (7L, "k", 803L))
      .toDF("event_id", "key", "ms")
    val got = RangeJoin.withinWindow(ev, Seq("key"), "event_id",
      col("ms"), windowMs = 100L)
      .select("a_id", "b_id", "gap_ms")
      .as[(Long, Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 2L, 10L), (3L, 4L, 100L)))
  }

  test("withinWindow with no key columns is a pure band join") {
    val ev = Seq((1L, 10L), (2L, 15L), (3L, 500L)).toDF("event_id", "ms")
    val got = RangeJoin.withinWindow(ev, Nil, "event_id", col("ms"), 20L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("withinWindow plans as an equi-join, never nested-loop") {
    val ev = Seq((1L, "k", 10L)).toDF("event_id", "key", "ms")
    val plan = RangeJoin.withinWindow(ev, Seq("key"), "event_id",
      col("ms"), 100L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested loop:\n$plan")
  }

  private def tmin(min: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("firstWithin attaches the EARLIEST in-band right row, band inclusive") {
    val purchases = Seq(
      (900L, "u1", tmin(45)), // band [15, 45]: views 101 (20) and 102 (40)
      (901L, "u1", tmin(10)), // band [-20, 10]: view 100 (0)
      (902L, "u2", tmin(5)),  // u2's only view is AFTER → null
      (903L, "u3", tmin(50)), // no u3 views at all → null
      (904L, "u4", tmin(30))) // view exactly at ts − window → included
      .toDF("event_id", "key", "ts")
    val views = Seq(
      (100L, "u1", tmin(0)), (101L, "u1", tmin(20)),
      (102L, "u1", tmin(40)), (200L, "u2", tmin(20)),
      (105L, "u4", tmin(0)))
      .toDF("event_id", "key", "ts")
    val got = AsOfJoin.firstWithin(purchases, views, Seq("key"), "ts",
      rightPayload = Seq("event_id"), windowMs = 30L * 60 * 1000)
      .select(col("event_id"), col("first_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      900L -> Some(101L), // earliest in band, NOT the latest (102)
      901L -> Some(100L),
      902L -> None, 903L -> None,
      904L -> Some(105L)))
  }

  test("overlapJoin: exact closed-interval semantics, each pair once") {
    val a = Seq(
      // [0, 100] overlaps b1 [50, 150] and touches b2 [100, 200]
      (1L, "k", 0L, 100L),
      // [300, 1000] spans MANY bins shared with b3 [310, 990] — the
      // emit-once rule must not duplicate the pair per shared bin
      (2L, "k", 300L, 1000L),
      // disjoint from everything
      (3L, "k", 5000L, 5100L),
      // inverted interval (end < start) is dropped, not matched
      (4L, "k", 90L, 10L))
      .toDF("id", "key", "s", "e")
    val b = Seq(
      (10L, "k", 50L, 150L), (11L, "k", 100L, 200L),
      (12L, "k", 310L, 990L),
      // other key never matches
      (13L, "other", 0L, 10000L))
      .toDF("id", "key", "s", "e")
    val got = RangeJoin.overlapJoin(a, b, Seq("key"),
      "id", col("s"), col("e"), "id", col("s"), col("e"), binMs = 100L)
      .select(col("a_id"), col("b_id"),
        col("overlap_start_ms"), col("overlap_end_ms"))
      .as[(Long, Long, Long, Long)].collect().sorted
    assert(got.toSeq === Seq(
      (1L, 10L, 50L, 100L),
      (1L, 11L, 100L, 100L), // touching endpoints intersect (closed)
      (2L, 12L, 310L, 990L)))
  }

  test("overlapJoin: exact bins past 2^53; runaway fan-out raises, not OOMs") {
    // nanosecond-scale epochs (~1.7e18): double floor(x/w) rounds the
    // operand and can mis-bin — integer bin arithmetic must still pair
    // these two overlapping intervals
    val base = 1700000000000000000L
    val a = Seq((1L, "k", base + 1L, base + 1000L)).toDF("id", "key", "s", "e")
    val b = Seq((2L, "k", base + 500L, base + 2000L)).toDF("id", "key", "s", "e")
    val got = RangeJoin.overlapJoin(a, b, Seq("key"),
      "id", col("s"), col("e"), "id", col("s"), col("e"), binMs = 1000L)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L)))
    // an open-end sentinel (9999-12-31-style) at small bins would be
    // ~millions of bins for ONE row: a clear error, never an OOM
    val sentinel = Seq((3L, "k", 0L, 253402300799999L)).toDF("id", "key", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.overlapJoin(sentinel, b, Seq("key"),
        "id", col("s"), col("e"), "id", col("s"), col("e"),
        binMs = 3600000L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("spans more than")),
      s"wanted the fan-out guard, got: ${msgs(ex).mkString(" | ")}")
  }

  test("overlapJoin plans as an equi-join, never nested-loop") {
    val iv = Seq((1L, "k", 0L, 10L)).toDF("id", "key", "s", "e")
    val plan = RangeJoin.overlapJoin(iv, iv, Seq("key"),
      "id", col("s"), col("e"), "id", col("s"), col("e"), 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested loop:\n$plan")
  }

  test("firstWithin plan has no join node and exactly one exchange") {
    val purchases = Seq((1L, "k", tmin(1))).toDF("id", "key", "ts")
    val views = Seq((2L, "k", tmin(0))).toDF("id", "key", "ts")
    val plan = AsOfJoin.firstWithin(purchases, views, Seq("key"), "ts",
      Seq("id"), windowMs = 1000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1, s"want 1 exchange:\n$plan")
  }
}
