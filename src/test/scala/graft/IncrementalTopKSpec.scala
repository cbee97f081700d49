package graft

import graft.operators.{IncrementalSwa, IncrementalTopK, Spill}
import graft.operators.IncrementalTopK.Config

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalTopKSpec extends SparkTestBase {
  import spark.implicits._

  private val DayUs = 86400000000L

  private def ev(rows: (Long, Int, String)*): DataFrame =
    rows.toDF("k", "d", "item")
      .withColumn("ts", timestamp_micros(col("d") * DayUs + 3600000000L))
      .select("k", "ts", "item")

  private def top(df: DataFrame): Seq[(Long, String, Long, Int)] =
    df.select("k", "item", "cnt", "rank")
      .as[(Long, String, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq

  test("candidate sums rank correctly; ties break by item asc") {
    val cfg = Config(Seq("k"), "ts", "item", DayUs, candidatesPerBucket = 8)
    val dir = Spill.newPath(spark)
    // day 0: a x3, b x2, c x1 ; day 1: b x2, c x2
    IncrementalTopK.ingest(ev(
      (1L, 0, "a"), (1L, 0, "a"), (1L, 0, "a"),
      (1L, 0, "b"), (1L, 0, "b"), (1L, 0, "c")), dir, cfg, 0L)
    IncrementalTopK.ingest(ev(
      (1L, 1, "b"), (1L, 1, "b"), (1L, 1, "c"), (1L, 1, "c")), dir, cfg, 1L)
    // totals: a=3, b=4, c=3 -> b(4), then a before c on the tie
    assert(top(IncrementalTopK.serveTopK(spark, dir, cfg, 2 * DayUs, 2, 3)) ==
      Seq((1L, "b", 4L, 1), (1L, "a", 3L, 2), (1L, "c", 3L, 3)))
    // window = day 1 only
    assert(top(IncrementalTopK.serveTopK(spark, dir, cfg, 2 * DayUs, 1, 2)) ==
      Seq((1L, "b", 2L, 1), (1L, "c", 2L, 2)))
  }

  test("per-bucket truncation loses below-cut occurrences (lower bounds), deterministically") {
    val cfg = Config(Seq("k"), "ts", "item", DayUs, candidatesPerBucket = 1)
    val dir = Spill.newPath(spark)
    // day 0: a x2, b x1 (cut keeps a) ; day 1: b x2, a x1 (cut keeps b)
    IncrementalTopK.ingest(ev(
      (1L, 0, "a"), (1L, 0, "a"), (1L, 0, "b")), dir, cfg, 0L)
    IncrementalTopK.ingest(ev(
      (1L, 1, "b"), (1L, 1, "b"), (1L, 1, "a")), dir, cfg, 1L)
    // bounds: a=2 (day-1 occurrence lost), b=2 (day-0 lost); tie -> a first
    assert(top(IncrementalTopK.serveTopK(spark, dir, cfg, 2 * DayUs, 2, 2)) ==
      Seq((1L, "a", 2L, 1), (1L, "b", 2L, 2)))
  }

  test("compact merges candidates additively and serves unchanged") {
    val cfg = Config(Seq("k"), "ts", "item", DayUs, candidatesPerBucket = 8)
    val dir = Spill.newPath(spark)
    IncrementalTopK.ingest(ev((1L, 0, "a"), (1L, 0, "b")), dir, cfg, 0L)
    IncrementalTopK.ingest(ev((1L, 1, "a")), dir, cfg, 1L)
    val before = top(IncrementalTopK.serveTopK(spark, dir, cfg, 2 * DayUs, 2, 2))
    IncrementalTopK.compact(spark, dir, cfg)
    assert(IncrementalSwa.versions(spark, dir) == Seq(1L))
    assert(top(IncrementalTopK.serveTopK(spark, dir, cfg, 2 * DayUs, 2, 2))
      == before)
  }

  test("serveDaily = per-bucket ranking; serveAsOf = version truncation + rebased refusal") {
    val cfg = Config(Seq("k"), "ts", "item", DayUs, candidatesPerBucket = 8)
    val dir = Spill.newPath(spark)
    // v0 = day 0: a x2, b x1 ; v1 = day 1: b x2
    IncrementalTopK.ingest(ev(
      (1L, 0, "a"), (1L, 0, "a"), (1L, 0, "b")), dir, cfg, 0L)
    IncrementalTopK.ingest(ev((1L, 1, "b"), (1L, 1, "b")), dir, cfg, 1L)
    // daily, W=2: bucket 0 ranks day 0 alone; bucket 1 ranks both days
    val daily = IncrementalTopK.serveDaily(spark, dir, cfg,
        windowBuckets = 2, k = 2)
      .select(col("k"), col("bucket"), col("item"), col("cnt"), col("rank"))
      .as[(Long, Long, String, Long, Int)].collect()
      .sortBy(r => (r._2, r._5)).toSeq
    assert(daily == Seq(
      (1L, 0L, "a", 2L, 1), (1L, 0L, "b", 1L, 2),
      (1L, 1L, "b", 3L, 1), (1L, 1L, "a", 2L, 2)))
    // each daily row equals the boundary serve at (bucket + 1)
    assert(daily.filter(_._2 == 1L).map(r => (r._1, r._3, r._4, r._5)) ==
      top(IncrementalTopK.serveTopK(spark, dir, cfg, 2 * DayUs, 2, 2)))
    // as-of v0: day 1's candidates invisible
    assert(top(IncrementalTopK.serveAsOf(spark, dir, cfg, 2 * DayUs, 2, 2, 0L))
      == Seq((1L, "a", 2L, 1), (1L, "b", 1L, 2)))
    IncrementalTopK.compact(spark, dir, cfg)
    val e = intercept[IllegalArgumentException] {
      IncrementalTopK.serveAsOf(spark, dir, cfg, 2 * DayUs, 2, 2, 0L)
    }
    assert(e.getMessage.contains("rebased"), e.getMessage)
  }
}
