package graft

import graft.EventTime.Ops
import graft.operators.Sessionize
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gaps-and-islands: boundary is >= gap (exclusive session end)") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")),  // 10 min < 30 -> same session
      (1L, ts("2024-01-01 10:40:00")),  // EXACTLY 30 min -> NEW session
      (1L, ts("2024-01-01 11:09:59")),  // 29:59 < 30 -> same
      (2L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Sessionize.assign(df, "user_id", "ts", 1800L)
      .select($"user_id", $"ts", $"session_seq").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(out == Set(
      (1L, "2024-01-01 10:00:00.0", 1L),
      (1L, "2024-01-01 10:10:00.0", 1L),
      (1L, "2024-01-01 10:40:00.0", 2L),
      (1L, "2024-01-01 11:09:59.0", 2L),
      (2L, "2024-01-01 10:00:00.0", 1L)))
  }

  test("tied timestamps at a session boundary land in ONE session") {
    // two events at the identical instant, 31 min after the previous:
    // whichever the lag order picks, the RANGE cumsum must put both in
    // the same (new) session
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:31:00")),
      (1L, ts("2024-01-01 10:31:00"))
    ).toDF("user_id", "ts")
    val seqs = Sessionize.assign(df, "user_id", "ts", 1800L)
      .where($"ts" === ts("2024-01-01 10:31:00"))
      .select("session_seq").as[Long].collect().toSet
    assert(seqs == Set(2L), s"tied pair split across sessions: $seqs")
  }

  test("batch sessions equal native session_window on the events table") {
    // the same partition of events two ways: the operator's
    // gaps-and-islands vs Spark's session_window run in batch mode.
    // Session identity maps as (user, session_start == window.start);
    // counts must agree pairwise and in total.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read
      .option("mergeSchema", "false").parquet(s"$sf/events.parquet")
      .normalizeEventTime
      .select("user_id", "ts", "value")
    val ours = Sessionize.sessions(ev, "user_id", "ts", 1800L)
      .select($"user_id", $"session_start", $"n_events")
    val native = ev.groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"session_window".getField("start").as("session_start"),
        $"n_events")
    assert(ours.count() > 0)
    assert(ours.exceptAll(native).isEmpty && native.exceptAll(ours).isEmpty)
  }

  test("session roll-up: duration, bounds, extra aggregates") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 10:05:00"), 20.0),
      (1L, ts("2024-01-01 12:00:00"), 5.0)
    ).toDF("user_id", "ts", "value")
    val out = Sessionize.sessions(df, "user_id", "ts", 1800L,
        round(sum("value"), 4).as("v_sum"))
      .orderBy("session_seq")
      .collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("duration_us") == 300000000L)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(0).getAs[Double]("v_sum") == 30.0)
    assert(out(1).getAs[Long]("duration_us") == 0L)
    assert(out(1).getAs[Double]("v_sum") == 5.0)
  }

  test("funnel: anchored-greedy matching, horizon, and partial reach") {
    import graft.operators.Sessionize
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // u1 completes in order within horizon
      (1L, t(100), "a"), (1L, t(200), "b"), (1L, t(300), "c"),
      // u2: b BEFORE the anchor must not count; the later b does
      (2L, t(50), "b"), (2L, t(100), "a"), (2L, t(400), "b"), (2L, t(500), "c"),
      // u3 reaches b only
      (3L, t(100), "a"), (3L, t(150), "b"),
      // u4 completes but outside the 1000s horizon
      (4L, t(100), "a"), (4L, t(200), "b"), (4L, t(2000), "c"),
      // u5 never starts (no 'a') -> no row
      (5L, t(100), "c"))
      .toDF("user_id", "ts", "event_type")

    val out = Sessionize.funnel(ev, "user_id", "ts", "event_type",
        Seq("a", "b", "c"), horizonSeconds = 1000L)
      .as[(Long, Long, Option[Long], Option[Long], Int, Boolean)]
      .collect().map(r => r._1 -> r).toMap

    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((1L, 100000000L, Some(200000000L), Some(300000000L), 3, true)))
    assert(out(2L)._3.contains(400000000L), "pre-anchor step must not match")
    assert(out(2L)._6, "u2 completes within horizon")
    assert(out(3L) == ((3L, 100000000L, Some(150000000L), None, 2, false)))
    assert(out(4L)._5 == 3 && !out(4L)._6, "reached but missed the horizon")
  }

  test("funnel: key column starting with 't' does not collide with anchor columns") {
    // regression (r10 ADVICE): internal anchor columns were rediscovered
    // via columns.filter(_.startsWith("t")), so keyCol = "token_id"
    // entered the filter and "oken_".toInt threw. Anchors are now
    // tracked by their reserved __t{i}_us names.
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, t(100), "a"), (1L, t(200), "b"), (1L, t(300), "c"),
      (2L, t(100), "a"))
      .toDF("token_id", "ts", "type")
    val out = Sessionize.funnel(ev, "token_id", "ts", "type",
        Seq("a", "b", "c"), horizonSeconds = 1000L)
    assert(out.columns.toSeq ==
      Seq("token_id", "t1_us", "t2_us", "t3_us", "steps_reached", "completed"))
    val rows = out.as[(Long, Long, Option[Long], Option[Long], Int, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows(1L) == ((1L, 100000000L, Some(200000000L), Some(300000000L), 3, true)))
    assert(rows(2L)._5 == 1 && !rows(2L)._6)
  }

  test("retention: cohorts by first-event period, offsets count distinct actives") {
    import graft.operators.Sessionize
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val period = 100L
    // u1 joins period 0, active 0 and 2 (twice in 2 — counted once);
    // u2 joins period 0, active 0 only; u3 joins period 1, active 1,3
    val ev = Seq(
      (1L, t(10)), (1L, t(250)), (1L, t(260)),
      (2L, t(50)),
      (3L, t(150)), (3L, t(320)))
      .toDF("user_id", "ts")
    val got = Sessionize.retention(ev, "user_id", "ts", period)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 0L, 2L), // u1, u2 in their join period
      (0L, 2L, 1L), // u1 returns two periods later (deduped)
      (1L, 0L, 1L), // u3's join period
      (1L, 2L, 1L))) // u3 returns at offset 2
  }

  test("pathNgrams: session-bounded, tie-ordered, short tails excluded") {
    // user 1: one session a,b,c,d; after the gap a second session b,c
    // user 2: ties at the same ts ordered by event_id -> x,y,z
    val base = 1700000000000000L
    val ev = Seq(
      (1L, base, "a", 1L), (1L, base + 1000000L, "b", 2L),
      (1L, base + 2000000L, "c", 3L), (1L, base + 3000000L, "d", 4L),
      (1L, base + 4000000000L, "b", 5L), (1L, base + 4001000000L, "c", 6L),
      (2L, base + 100L, "x", 7L), (2L, base + 100L, "y", 8L),
      (2L, base + 100L, "z", 9L))
      .toDF("user_id", "ts_us", "event_type", "event_id")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val got = Sessionize.pathNgrams(
      ev, "user_id", "ts", "event_type", "event_id", 1800L, n = 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a>b" -> 1L, "b>c" -> 2L, "c>d" -> 1L,
      "x>y" -> 1L, "y>z" -> 1L), s"got $got")
  }
}
