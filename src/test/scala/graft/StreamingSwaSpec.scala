package graft

import graft.EventTime.Ops
import graft.streaming.StreamingSwa
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch/stream parity for sliding-window aggregation: the stateful
  * streaming operator must produce, for every purchase event, exactly
  * the batch SWA value with the spine equal to the source.
  */
class StreamingSwaSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming SWA matches the batch range-join aggregate per event") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val purchases = spark.read.parquet(s"$sf/events.parquet")
      .normalizeEventTime
      .where($"event_type" === "purchase")
      .select($"user_id".as("key"), unix_micros($"ts").as("tsMicros"), $"value")
    // duplicate (key, ts) pairs would make per-event emission ambiguous
    assert(purchases.groupBy("key", "tsMicros").count().where($"count" > 1).count() == 0)

    val events = purchases.as[StreamingSwa.Event]
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamingSwa.Event]
    stream.addData(events.collect().toSeq)

    val name = s"swa_out_${System.nanoTime()}"
    val q = StreamingSwa(stream.toDS(), windowSeconds = 7 * 86400)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table(name)
      .select($"key", $"tsMicros", round($"f_sum", 6).as("f_sum"), $"f_cnt",
        $"f_min", $"f_max", round($"f_avg", 6).as("f_avg"))

    // batch truth: range join of purchases onto itself
    val l = purchases.select($"key".as("k"), $"tsMicros".as("t"))
    val r = purchases.select($"key".as("rk"), $"tsMicros".as("rt"), $"value")
    val want = l.join(r, $"k" === $"rk" &&
        $"rt" > $"t" - lit(7 * 86400 * 1000000L) && $"rt" <= $"t")
      .groupBy($"k", $"t")
      .agg(round(sum($"value"), 6).as("f_sum"), count($"value").as("f_cnt"),
        min($"value").as("f_min"), max($"value").as("f_max"),
        round(avg($"value"), 6).as("f_avg"))
      .select($"k".as("key"), $"t".as("tsMicros"),
        $"f_sum", $"f_cnt", $"f_min", $"f_max", $"f_avg")

    assert(got.count() == want.count())
    val mismatches = got.join(want, Seq("key", "tsMicros"), "full_outer")
      .where(!(got("f_sum") <=> want("f_sum")) || !(got("f_cnt") <=> want("f_cnt")) ||
             !(got("f_min") <=> want("f_min")) || !(got("f_max") <=> want("f_max")))
      .count()
    assert(mismatches == 0)
  }

  test("sub-second window: a 1500ms Duration window evicts at exact micros") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamingSwa.Event]
    val ms = 1000L
    val name = s"swa_subsec_${System.nanoTime()}"
    val q = StreamingSwa(stream.toDS(), graft.model.Durations.parse("1500ms"))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    stream.addData(Seq(
      StreamingSwa.Event(1L, 1000 * ms, 1.0),
      StreamingSwa.Event(1L, 2400 * ms, 2.0),  // (900ms, 2400ms] = {1000, 2400}
      StreamingSwa.Event(1L, 2600 * ms, 3.0))) // (1100ms, 2600ms] = {2400, 2600}
    q.processAllAvailable(); q.stop()
    val got = spark.table(name).as[StreamingSwa.SwaResult].collect()
      .map(r => r.tsMicros / ms -> ((r.f_sum, r.f_cnt))).toMap
    assert(got(1000L) == ((1.0, 1L)))
    assert(got(2400L) == ((3.0, 2L)))
    assert(got(2600L) == ((5.0, 2L)))
  }

  test("idle keys evict on EventTimeTimeout; NoTimeout control retains state") {
    implicit val sqlCtx = spark.sqlContext
    val us = 1000000L
    // scenario (idle 10s < window 100s so eviction is OBSERVABLE): key 1
    // buffers an event at 10s; key 2 at 30s advances the watermark to
    // 29s, past key 1's timeout (10s + 10s = 20s) — the no-data batch
    // evicts key 1. Key 1's next event at 35s is NOT late (35s > 29s)
    // and its 100s window would include the 10s event had the buffer
    // survived: f_cnt = 1 proves eviction, the NoTimeout control's
    // f_cnt = 2 proves the probe detects retention.
    def run(evict: Boolean): Map[(Long, Long), Long] = {
      val stream = MemoryStream[StreamingSwa.Event]
      val events = stream.toDS()
      val name = s"swa_evict_${evict}_${System.nanoTime()}"
      val swa = if (evict)
        StreamingSwa(events, windowSeconds = 100, idleTimeoutSeconds = 10,
          watermarkDelaySeconds = 1)
      else StreamingSwa(events, windowSeconds = 100)
      val q = swa.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      stream.addData(Seq(StreamingSwa.Event(1L, 10 * us, 1.0)))
      q.processAllAvailable()
      stream.addData(Seq(StreamingSwa.Event(2L, 30 * us, 5.0)))
      q.processAllAvailable()
      stream.addData(Seq(StreamingSwa.Event(1L, 35 * us, 2.0)))
      q.processAllAvailable(); q.stop()
      spark.table(name).as[StreamingSwa.SwaResult].collect()
        .map(r => (r.key, r.tsMicros / us) -> r.f_cnt).toMap
    }
    val evicted = run(evict = true)
    assert(evicted((1L, 10L)) == 1L && evicted((2L, 30L)) == 1L)
    assert(evicted((1L, 35L)) == 1L,
      "idle key 1 must have been evicted before its 35s event arrived")
    // control: without the timeout the same sequence retains the buffer
    val retained = run(evict = false)
    assert(retained((1L, 35L)) == 2L,
      "NoTimeout control must retain state (otherwise this test proves nothing)")
  }

  test("state survives micro-batches; late events get exact windows") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamingSwa.Event]
    val us = 1000000L
    val name = s"swa_ooo_${System.nanoTime()}"
    val q = StreamingSwa(stream.toDS(), windowSeconds = 15)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    // batch 1: in-order
    stream.addData(Seq(
      StreamingSwa.Event(1L, 10 * us, 1.0),
      StreamingSwa.Event(1L, 20 * us, 2.0),
      StreamingSwa.Event(1L, 30 * us, 3.0)))
    q.processAllAvailable()
    // batch 2: one LATE event (25s < buffered 30s) + one in-order
    stream.addData(Seq(
      StreamingSwa.Event(1L, 25 * us, 2.5),
      StreamingSwa.Event(1L, 40 * us, 4.0)))
    q.processAllAvailable(); q.stop()

    val got = spark.table(name).as[StreamingSwa.SwaResult].collect()
      .map(r => r.tsMicros / us -> ((r.f_sum, r.f_cnt, r.f_min, r.f_max))).toMap
    assert(got(10L) == ((1.0, 1L, 1.0, 1.0)))
    assert(got(20L) == ((3.0, 2L, 1.0, 2.0))) // (5, 20] = {10, 20}
    assert(got(30L) == ((5.0, 2L, 2.0, 3.0))) // (15, 30] = {20, 30}
    // late 25s sees exactly (10, 25] = {20, 25} — and must NOT drop 30s
    assert(got(25L) == ((4.5, 2L, 2.0, 2.5)))
    // 40s sees (25, 40] = {30, 40}: the late event was kept then evicted
    assert(got(40L) == ((7.0, 2L, 3.0, 4.0)))
  }
}
