package graft

import graft.EventTime.Ops
import graft.streaming.StreamingSessionize
import graft.operators.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous sessionization: exactly-once emission as the watermark
  * closes sessions across micro-batches, and parity with the batch
  * gaps-and-islands operator.
  */
class StreamingSessionizeSpec extends SparkTestBase {
  import spark.implicits._
  import StreamingSessionize.Event

  private def awaitRows(table: String, n: Long, q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    // timeout firings ride no-data micro-batches that can land just
    // after processAllAvailable returns — poll briefly
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (spark.table(table).count() < n && System.nanoTime() < deadline) {
      q.processAllAvailable(); Thread.sleep(100)
    }
  }

  test("sessions emit exactly once as the watermark closes them") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val name = s"sess_state_${System.nanoTime()}"
    val q = StreamingSessionize(stream.toDS(), gapSeconds = 30)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    // offset: a row at exactly epoch 0 ties the INITIAL watermark (0)
    // and is dropped by the late filter - an artifact of test times,
    // not a session boundary case
    def us(sec: Long) = (sec + 1000L) * 1000000L

    // batch 1: key 1 at t=0s,10s (one session); key 2 at t=5s
    stream.addData(Event(1L, us(0), 1.0), Event(1L, us(10), 2.0),
      Event(2L, us(5), 7.0))
    q.processAllAvailable()
    assert(spark.table(name).count() == 0,
      "nothing is provably closed while the watermark trails the data")

    // batch 2: key 1 at t=100s -> watermark ~99s closes key 1's [0,10]
    // and key 2's [5,5] (via its event-time timeout)
    stream.addData(Event(1L, us(100), 4.0))
    q.processAllAvailable()
    awaitRows(name, 2, q)
    val afterB2 = spark.table(name)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(afterB2 == Set(
      (1L, us(0), us(10), 2L, 3.0),
      (2L, us(5), us(5), 1L, 7.0)), s"got $afterB2")

    // batch 3: key 1 at t=200s -> closes [100,100]; [200] stays open
    stream.addData(Event(1L, us(200), 8.0))
    q.processAllAvailable()
    awaitRows(name, 3, q)
    val afterB3 = spark.table(name)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(afterB3.length == 3, s"no duplicate emissions: ${afterB3.toSeq}")
    assert(afterB3.toSet.contains((1L, us(100), us(100), 1L, 4.0)))
    q.stop()
  }

  test("late event within the watermark merges; beyond it is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val name = s"sess_late_${System.nanoTime()}"
    val q = StreamingSessionize(stream.toDS(), gapSeconds = 30,
        watermarkDelay = "100 seconds")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    // offset: a row at exactly epoch 0 ties the INITIAL watermark (0)
    // and is dropped by the late filter - an artifact of test times,
    // not a session boundary case
    def us(sec: Long) = (sec + 1000L) * 1000000L
    stream.addData(Event(1L, us(0), 1.0), Event(1L, us(50), 2.0))
    q.processAllAvailable()
    // wm = 50-100 < 0: everything open. A late bridging event at t=25
    // must MERGE [0] and [50] into one session.
    stream.addData(Event(1L, us(25), 10.0))
    q.processAllAvailable()
    // close it: advance the watermark far past 50+30
    stream.addData(Event(1L, us(500), 3.0))
    q.processAllAvailable()
    awaitRows(name, 1, q)
    val got = spark.table(name).as[(Long, Long, Long, Long, Double)]
      .collect().toSet
    assert(got == Set((1L, us(0), us(50), 3L, 13.0)),
      s"bridged session expected, got $got")
    q.stop()
  }

  test("parity with the batch operator over the events table") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .normalizeEventTime
      .select($"user_id".as("key"), unix_micros($"ts").as("tsMicros"),
        $"value")
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(ev.as[Event].collect().toSeq)
    val name = s"sess_parity_${System.nanoTime()}"
    val q = StreamingSessionize(stream.toDS(), gapSeconds = 1800)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    // flush every real session: one sentinel per key far in the future
    val maxTs = ev.agg(max("tsMicros")).head().getLong(0)
    stream.addData(ev.select("key").distinct().as[Long].collect()
      .map(k => Event(k, maxTs + 10000L * 1000000L, 0.0)).toSeq: _*)
    q.processAllAvailable()
    val want = Sessionize.sessions(
        ev.select($"key", timestamp_micros($"tsMicros").as("ts"), $"value"),
        "key", "ts", 1800L, round(sum("value"), 4).as("v_sum"))
      .select($"key", unix_micros($"session_start").as("startMicros"),
        unix_micros($"session_end").as("endMicros"), $"n_events".as("n"),
        $"v_sum")
    awaitRows(name, want.count(), q)
    val got = spark.table(name)
      .select($"key", $"startMicros", $"endMicros", $"n",
        round($"vSum", 4).as("v_sum"))
    assert(got.count() == want.count(),
      s"session count: got ${got.count()} want ${want.count()}")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    q.stop()
  }
}
