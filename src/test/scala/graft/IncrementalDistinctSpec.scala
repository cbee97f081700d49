package graft

import graft.operators.{IncrementalDistinct, IncrementalSwa, Sketches, Spill}
import graft.operators.IncrementalDistinct.Config

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalDistinctSpec extends SparkTestBase {
  import spark.implicits._

  private val DayUs = 86400000000L
  private val cfg = Config(Seq("k"), "ts", "item", DayUs, p = 12)

  private def ev(rows: (Long, Int, String)*): DataFrame =
    rows.toDF("k", "d", "item")
      .withColumn("ts", timestamp_micros(col("d") * DayUs + 3600000000L))
      .select("k", "ts", "item")

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  /** one-shot reference: registers straight off the window's events */
  private def direct(all: DataFrame, asOfUs: Long, w: Int): DataFrame = {
    val in = all.withColumn("us", unix_micros(col("ts")))
      .where(col("us") >= asOfUs - w * DayUs && col("us") < asOfUs)
    Sketches.hllStats(
      Sketches.hllRegisters(in, col("item"), 12, Seq("k")), 12, Seq("k"))
  }

  private val d0 = ev((1L, 0, "a"), (1L, 0, "b"), (2L, 0, "a"))
  private val d1 = ev((1L, 1, "b"), (1L, 1, "c"), (2L, 1, "x"), (3L, 1, "y"))
  private val d2 = ev((1L, 2, "a"), (2L, 2, "x"))

  test("windowed distinct stats equal the one-shot recompute; duplicates collapse") {
    val dir = Spill.newPath(spark)
    Seq(d0, d1, d2).zipWithIndex.foreach { case (d, i) =>
      IncrementalDistinct.ingest(d, dir, cfg, i.toLong)
    }
    val all = d0.unionByName(d1).unionByName(d2)
    for (day <- 1 to 3; w <- Seq(1, 2, 3)) {
      assert(multiset(IncrementalDistinct.serveDistinct(
        spark, dir, cfg, day * DayUs, w)) ==
        multiset(direct(all, day * DayUs, w)), s"day $day window $w")
    }
    // small sets at p=12: n_registers IS the exact distinct count
    val got = IncrementalDistinct.serveDistinct(spark, dir, cfg, 3 * DayUs, 3)
      .select("k", "n_registers").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("serveDaily rows equal the per-boundary serves; serveAsOf truncates versions") {
    val dir = Spill.newPath(spark)
    Seq(d0, d1, d2).zipWithIndex.foreach { case (d, i) =>
      IncrementalDistinct.ingest(d, dir, cfg, i.toLong)
    }
    // each (bucket b) daily row = the boundary serve at (b + 1)·day
    val daily = IncrementalDistinct.serveDaily(spark, dir, cfg, 2)
    for (b <- 0L to 2L) {
      assert(multiset(daily.where(col("bucket") === b).drop("bucket")) ==
        multiset(IncrementalDistinct.serveDistinct(
          spark, dir, cfg, (b + 1) * DayUs, 2)), s"bucket $b")
    }
    // as-of v1: day 2's items invisible — k=1 back to {a,b,c} over W=3,
    // and the stats equal a direct recompute without d2
    assert(multiset(IncrementalDistinct.serveAsOf(
      spark, dir, cfg, 3 * DayUs, 3, 1L)) ==
      multiset(direct(d0.unionByName(d1), 3 * DayUs, 3)))
    IncrementalDistinct.compact(spark, dir, cfg)
    val e = intercept[IllegalArgumentException] {
      IncrementalDistinct.serveAsOf(spark, dir, cfg, 3 * DayUs, 3, 0L)
    }
    assert(e.getMessage.contains("rebased"), e.getMessage)
  }

  test("compact max-merges registers; serves unchanged and refuses replays") {
    val dir = Spill.newPath(spark)
    Seq(d0, d1, d2).zipWithIndex.foreach { case (d, i) =>
      IncrementalDistinct.ingest(d, dir, cfg, i.toLong)
    }
    val before = multiset(
      IncrementalDistinct.serveDistinct(spark, dir, cfg, 3 * DayUs, 3))
    IncrementalDistinct.compact(spark, dir, cfg)
    assert(IncrementalSwa.versions(spark, dir) == Seq(2L))
    assert(multiset(IncrementalDistinct.serveDistinct(
      spark, dir, cfg, 3 * DayUs, 3)) == before)
    intercept[IllegalArgumentException] {
      IncrementalDistinct.ingest(d1, dir, cfg, 1L)
    }
  }
}
