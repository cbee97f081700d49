package graft

import graft.operators.{IncrementalQuantile, IncrementalSwa, Spill}
import graft.operators.IncrementalQuantile.Config

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalQuantileSpec extends SparkTestBase {
  import spark.implicits._

  private val DayUs = 86400000000L
  // grid [0, 10) x 10 — bin = floor(v), cutoff = bin
  private val cfg = Config(Seq("k"), "ts", "v", DayUs, 0.0, 10.0, 10)

  private def ev(rows: (Long, Int, Double)*): DataFrame =
    rows.toDF("k", "d", "v")
      .withColumn("ts", timestamp_micros(col("d") * DayUs + 3600000000L))
      .select("k", "ts", "v")

  private def q(df: DataFrame): Map[(Long, Double), (Long, Double, Long)] =
    df.select("k", "q", "bin", "cutoff", "n_total")
      .as[(Long, Double, Long, Double, Long)].collect()
      .map { case (k, qq, b, c, n) => (k, qq) -> ((b, c, n)) }.toMap

  test("multi-version histograms merge; median and p95 on the grid") {
    val dir = Spill.newPath(spark)
    // key 1: values 1..8 on day 0, 9 and 9.5 on day 1 (10 values:
    // p50 -> 5th value = 5 -> bin 5; p95 -> 10th = 9.5 -> bin 9)
    IncrementalQuantile.ingest(
      ev((1 to 8).map(i => (1L, 0, i.toDouble)): _*), dir, cfg, 0L)
    IncrementalQuantile.ingest(
      ev((1L, 1, 9.0), (1L, 1, 9.5)), dir, cfg, 1L)
    val got = q(IncrementalQuantile.serveQuantiles(spark, dir, cfg,
      2 * DayUs, 2, Seq(0.5, 0.95)))
    assert(got((1L, 0.5)) == ((5L, 5.0, 10L)))
    assert(got((1L, 0.95)) == ((9L, 9.0, 10L)))
  }

  test("window excludes out-of-range buckets; clamping hits edge bins") {
    val dir = Spill.newPath(spark)
    IncrementalQuantile.ingest(
      ev((1L, 0, 1.0), (1L, 1, -5.0), (1L, 1, 42.0)), dir, cfg, 0L)
    // window = day 1 only: values clamp to bins 0 and 9
    val got = q(IncrementalQuantile.serveQuantiles(spark, dir, cfg,
      2 * DayUs, 1, Seq(0.5, 1.0)))
    assert(got((1L, 0.5)) == ((0L, 0.0, 2L)))
    assert(got((1L, 1.0)) == ((9L, 9.0, 2L)))
  }

  test("exact rational tie cum*10^4 == q10k*total is honored (float-ulp regression)") {
    // 400 rows, 14 in bin 0: q=0.035 -> cum 14 satisfies 14*10^4 =
    // 350*400 exactly. The former double comparison computed
    // 0.035*10000*400 = 140000.00000000003 and rejected the tie,
    // serving bin 1.
    val dir = Spill.newPath(spark)
    val rows = (1 to 14).map(i => (1L, 0, 0.5)) ++
      (1 to 386).map(i => (1L, 0, 1.5))
    IncrementalQuantile.ingest(ev(rows: _*), dir, cfg, 0L)
    val got = q(IncrementalQuantile.serveQuantiles(spark, dir, cfg,
      DayUs, 1, Seq(0.035)))
    assert(got((1L, 0.035))._1 == 0L, s"tie must resolve to bin 0: $got")
  }

  test("reads of a missing store fail by name and create nothing") {
    val dir = Spill.newPath(spark) + "/never_written"
    val e = intercept[IllegalArgumentException] {
      IncrementalQuantile.serveQuantiles(spark, dir, cfg, DayUs, 1, Seq(0.5))
    }
    assert(e.getMessage.contains("no incremental state"))
    assert(!new java.io.File(dir).exists())
  }

  test("serveDaily rows equal the per-boundary serves; serveAsOf truncates versions") {
    val dir = Spill.newPath(spark)
    IncrementalQuantile.ingest(
      ev((1 to 8).map(i => (1L, 0, i.toDouble)): _*), dir, cfg, 0L)
    IncrementalQuantile.ingest(ev((1L, 1, 9.0), (1L, 1, 9.5)), dir, cfg, 1L)
    val daily = IncrementalQuantile.serveDaily(spark, dir, cfg, 2, Seq(0.5))
      .select("k", "bucket", "q", "bin", "cutoff", "n_total")
      .as[(Long, Long, Double, Long, Double, Long)].collect()
      .map(r => r._2 -> ((r._4, r._5, r._6))).toMap
    // bucket 0: median of 1..8 -> bin 4; bucket 1: of 10 values -> bin 5
    assert(daily == Map(0L -> ((4L, 4.0, 8L)), 1L -> ((5L, 5.0, 10L))))
    assert(Map(1L -> daily(1L)).values.toSeq ==
      q(IncrementalQuantile.serveQuantiles(spark, dir, cfg,
        2 * DayUs, 2, Seq(0.5))).values.map(v => v).toSeq)
    // as-of v0: day 1's histogram rows invisible
    assert(q(IncrementalQuantile.serveAsOf(spark, dir, cfg,
      2 * DayUs, 2, Seq(0.5), 0L))((1L, 0.5)) == ((4L, 4.0, 8L)))
    IncrementalQuantile.compact(spark, dir, cfg)
    val e = intercept[IllegalArgumentException] {
      IncrementalQuantile.serveAsOf(spark, dir, cfg, 2 * DayUs, 2,
        Seq(0.5), 0L)
    }
    assert(e.getMessage.contains("rebased"), e.getMessage)
  }

  test("compact folds to one version and serves identically") {
    val dir = Spill.newPath(spark)
    IncrementalQuantile.ingest(
      ev((1 to 8).map(i => (1L, 0, i.toDouble)): _*), dir, cfg, 0L)
    IncrementalQuantile.ingest(ev((1L, 1, 9.0)), dir, cfg, 1L)
    val before = q(IncrementalQuantile.serveQuantiles(spark, dir, cfg,
      2 * DayUs, 2, Seq(0.5)))
    IncrementalQuantile.compact(spark, dir, cfg)
    assert(IncrementalSwa.versions(spark, dir) == Seq(1L))
    assert(q(IncrementalQuantile.serveQuantiles(spark, dir, cfg,
      2 * DayUs, 2, Seq(0.5))) == before)
    intercept[IllegalArgumentException] {
      IncrementalQuantile.ingest(ev((1L, 1, 9.0)), dir, cfg, 1L)
    }
  }
}
