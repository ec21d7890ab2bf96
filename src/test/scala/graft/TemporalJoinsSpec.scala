package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** As-of / range join semantics (fixtures chosen for the edges:
  * inclusivity, tie-breaks, no-match, bucket boundaries, intervals
  * wider than the bucket) plus the two plan pins that ARE the scale
  * story: the as-of join is one key exchange (no pair blowup) and the
  * range join is an equi-join, never BroadcastNestedLoopJoin.
  */
class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def left: DataFrame = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")), // exact tie with right r2/r3
    (2L, 10L, ts("2024-01-01 09:30:00")), // between r1 and r2
    (3L, 10L, ts("2024-01-01 08:00:00")), // before any right row
    (4L, 20L, ts("2024-01-01 12:00:00")), // key with no right rows
    (5L, 30L, ts("2024-01-01 12:00:00"))  // single-right key
  ).toDF("id", "k", "t")

  private def right: DataFrame = Seq(
    (100L, 10L, ts("2024-01-01 09:00:00"), "r1"),
    (101L, 10L, ts("2024-01-01 10:00:00"), "r2"), // tie on time with 102
    (102L, 10L, ts("2024-01-01 10:00:00"), "r3"), // larger id wins the tie
    (103L, 30L, ts("2024-01-01 11:00:00"), "r4"),
    (104L, 30L, ts("2024-01-01 13:00:00"), "r5")  // after the only probe
  ).toDF("rid", "k", "t", "tag")

  private def runAsOf(): Map[Long, Option[String]] =
    TemporalJoins.asOfJoin(left, right,
        leftKey = col("k"), rightKey = col("k"),
        leftTime = col("t"), rightTime = col("t"),
        rightTieBreak = col("rid"),
        payload = Seq(col("tag"), col("rid")))
      .select(col("id"), col("as_of.tag"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

  test("asOfJoin: inclusive match, equal-time tie broken by largest key") {
    val got = runAsOf()
    assert(got(1L) == Some("r3")) // t == right t is a match; 102 > 101
    assert(got(2L) == Some("r1")) // strictly-prior row
    assert(got(3L) == None)       // nothing at or before
    assert(got(4L) == None)       // key absent on the right
    assert(got(5L) == Some("r4")) // later right row ignored
  }

  test("asOfJoin: lookback tolerance nulls out stale matches") {
    val got = TemporalJoins.asOfJoin(left, right,
        leftKey = col("k"), rightKey = col("k"),
        leftTime = col("t"), rightTime = col("t"),
        rightTieBreak = col("rid"),
        payload = Seq(col("tag")),
        toleranceSeconds = Some(1800L)) // 30 min
      .select(col("id"), col("as_of.tag"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) == Some("r3")) // zero gap: inside tolerance
    assert(got(2L) == Some("r1")) // 30-min gap: exactly at the bound
    assert(got(5L) == None)       // 60-min gap: outside → no match
  }

  test("asOfJoin forward: earliest at-or-after, same tie convention") {
    val got = TemporalJoins.asOfJoin(left, right,
        leftKey = col("k"), rightKey = col("k"),
        leftTime = col("t"), rightTime = col("t"),
        rightTieBreak = col("rid"),
        payload = Seq(col("tag")), direction = "forward")
      .select(col("id"), col("as_of.tag"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) == Some("r3")) // inclusive at equal time; 102 > 101
    assert(got(2L) == Some("r3")) // next right after 09:30 is the 10:00 pair
    assert(got(3L) == Some("r1")) // earliest right overall
    assert(got(4L) == None)       // key absent on the right
    assert(got(5L) == Some("r5")) // earlier right row ignored
    val tol = TemporalJoins.asOfJoin(left, right,
        leftKey = col("k"), rightKey = col("k"),
        leftTime = col("t"), rightTime = col("t"),
        rightTieBreak = col("rid"),
        payload = Seq(col("tag")),
        toleranceSeconds = Some(1800L), direction = "forward")
      .select(col("id"), col("as_of.tag"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(tol(2L) == Some("r3")) // 30-min lookahead: exactly at bound
    assert(tol(3L) == None)       // 60-min gap: outside
    assert(tol(5L) == None)       // 60-min gap: outside
  }

  test("asOfJoin: left-row count is preserved (left-outer semantics)") {
    val out = TemporalJoins.asOfJoin(left, right, col("k"), col("k"),
      col("t"), col("t"), col("rid"), Seq(col("tag")))
    assert(out.count() == left.count())
  }

  test("asOfJoin plan: exactly one exchange, no join operator") {
    val out = TemporalJoins.asOfJoin(left, right, col("k"), col("k"),
      col("t"), col("t"), col("rid"), Seq(col("tag")))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one key exchange:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not materialize pairs:\n$plan")
  }

  private def points: DataFrame = Seq(
    (1L, ts("2024-01-01 10:00:00")), // == interval start: inside
    (2L, ts("2024-01-01 10:09:59")), // last second: inside
    (3L, ts("2024-01-01 10:10:00")), // == half-open end: outside
    (4L, ts("2024-01-01 10:19:59")), // inside the wide interval only
    (5L, ts("2024-01-01 09:59:59"))  // just before: outside
  ).toDF("pid", "pt")

  private def intervals: DataFrame = Seq(
    (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")), // width = W
    (11L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00")), // width 2W
    (12L, ts("2024-01-01 23:00:00"), ts("2024-01-01 23:10:00"))  // matches none
  ).toDF("iid", "s", "e")

  private def runRange(bucketSeconds: Long): Set[(Long, Long)] =
    TemporalJoins.rangeJoin(points, intervals, col("pt"), col("s"), col("e"),
        bucketSeconds)
      .select(col("iid"), col("pid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private val expected = Set(
    (10L, 1L), (10L, 2L),            // [10:00, 10:10): 1, 2
    (11L, 1L), (11L, 2L), (11L, 3L), (11L, 4L)) // [10:00, 10:20): 1-4

  test("rangeJoin: half-open bounds, wide interval spans buckets") {
    assert(runRange(600L) == expected)
  }

  test("rangeJoin: result is bucket-width invariant (incl. misaligned)") {
    for (w <- Seq(60L, 601L, 7200L)) {
      assert(runRange(w) == expected, s"bucketSeconds=$w")
    }
  }

  test("rangeJoin: matches the naive cross-filter join on the sf0.001 shape") {
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    val er = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("iid"), col("ts").as("s"),
        (col("ts") + expr("INTERVAL '10' MINUTE")).as("e"))
    val cl = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("pid"), col("ts").as("pt"))
    val got = TemporalJoins.rangeJoin(cl, er, col("pt"), col("s"), col("e"), 600L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    val naive = er.crossJoin(cl)
      .filter(col("pt") >= col("s") && col("pt") < col("e"))
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got == naive && naive.nonEmpty)
  }

  test("rangeJoin plan: equi-join on the bucket, not nested-loop") {
    val out = TemporalJoins.rangeJoin(points, intervals, col("pt"), col("s"),
      col("e"), 600L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }

  test("pre-epoch timestamps bucket with floor semantics") {
    val p = Seq((1L, ts("1969-12-31 23:59:30"))).toDF("pid", "pt")
    val iv = Seq((10L, ts("1969-12-31 23:59:00"), ts("1970-01-01 00:00:30")))
      .toDF("iid", "s", "e")
    val got = TemporalJoins.rangeJoin(p, iv, col("pt"), col("s"), col("e"), 60L)
    assert(got.count() == 1)
  }

  private def funnelEvents: DataFrame = Seq(
    // user 1: full A→B→C inside the span
    (1L, 1L, ts("2024-01-01 10:00:00"), "A"),
    (2L, 1L, ts("2024-01-01 11:00:00"), "B"),
    (3L, 1L, ts("2024-01-01 12:00:00"), "C"),
    // user 2: B precedes the first A — strictly-after drops it; the
    // later B matches, C at the SAME instant as B must NOT chain
    (4L, 2L, ts("2024-01-01 09:00:00"), "B"),
    (5L, 2L, ts("2024-01-01 10:00:00"), "A"),
    (6L, 2L, ts("2024-01-01 10:30:00"), "B"),
    (7L, 2L, ts("2024-01-01 10:30:00"), "C"),
    // user 3: anchored at the FIRST A; B arrives past its 1 h span
    // even though a second A would have put it in range
    (8L, 3L, ts("2024-01-01 08:00:00"), "A"),
    (9L, 3L, ts("2024-01-01 09:30:00"), "A"),
    (10L, 3L, ts("2024-01-01 10:00:00"), "B"),
    // user 4: only non-step events — absent from the output
    (11L, 4L, ts("2024-01-01 08:00:00"), "Z")
  ).toDF("event_id", "user_id", "ts", "event_type")

  test("funnel: anchored-earliest semantics, strict ordering, span cut") {
    val got = graft.operators.Funnel.funnel(funnelEvents, Seq("A", "B", "C"),
        maxSpanSeconds = Some(3600L))
      .orderBy("user").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byUser = got.map(r => r.getLong(0) ->
      (r.getInt(1), (2 to 4).map(i => Option(r.getTimestamp(i))))).toMap
    assert(byUser(1L)._1 == 2) // C at 12:00 past the 1 h span from A
    assert(byUser(1L)._2(0).contains(ts("2024-01-01 10:00:00")))
    assert(byUser(1L)._2(1).contains(ts("2024-01-01 11:00:00")))
    assert(byUser(1L)._2(2).isEmpty)
    assert(byUser(2L)._1 == 2) // same-instant C cannot follow B
    assert(byUser(2L)._2(1).contains(ts("2024-01-01 10:30:00")))
    assert(byUser(3L)._1 == 1) // anchored at first A, B out of span
    // without a span, user 1 completes and user 3's B lands
    val free = graft.operators.Funnel.funnel(funnelEvents, Seq("A", "B", "C"))
      .orderBy("user").collect()
    assert(free.map(r => r.getLong(0) -> r.getInt(1)).toMap ==
      Map(1L -> 3, 2L -> 2, 3L -> 2))
    // conversion summary: users reaching ≥ each step
    val conv = graft.operators.Funnel.conversion(
      graft.operators.Funnel.funnel(funnelEvents, Seq("A", "B", "C")), 3)
      .head()
    assert((0 to 3).map(conv.getLong) == Seq(3L, 3L, 3L, 1L))
  }

  test("funnel plan: exactly one exchange, no join, no window") {
    val plan = graft.operators.Funnel.funnel(funnelEvents, Seq("A", "B", "C"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"funnel must be one key exchange:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"funnel must not join or window:\n$plan")
  }

  test("cohortRetention: hand-computed matrix, in-period dups collapse") {
    import spark.implicits._
    // 10 s periods: u1 active in periods {0,1,3} (two events in p0 —
    // must count once), u2 in {0,1}, u3 in {1,3}
    val ev = Seq(
      (1L, 0L), (1L, 5L), (1L, 12L), (1L, 33L),
      (2L, 3L), (2L, 15L),
      (3L, 11L), (3L, 30L)).toDF("user_id", "sec")
      .select(col("user_id"), timestamp_micros(col("sec") * 1000000L).as("ts"))
    val got = graft.operators.Retention
      .cohortRetention(ev, col("ts"), col("user_id"), periodSeconds = 10L)
      .orderBy("cohort_start", "periods_since")
      .collect().map(r => (r.getTimestamp(0).getTime / 1000L, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      (0L, 0L, 2L, 2L, 1.0), (0L, 1L, 2L, 2L, 1.0), (0L, 3L, 1L, 2L, 0.5),
      (10L, 0L, 1L, 1L, 1.0), (10L, 2L, 1L, 1L, 1.0)))
  }

  test("cohortRetention plan: no window, sizes join broadcasts") {
    import spark.implicits._
    val ev = Seq((1L, 0L)).toDF("user_id", "sec")
      .select(col("user_id"), timestamp_micros(col("sec")).as("ts"))
    val plan = graft.operators.Retention
      .cohortRetention(ev, col("ts"), col("user_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"retention must not window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"cohort sizes must broadcast:\n$plan")
  }
}
