package graft

import graft.operators.{IncrementalSwa, Spill}
import graft.operators.IncrementalSwa.Config

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The flagship invariant of the incremental store, as a property:
  * for ANY event set, ANY partition of it into deltas, and ANY
  * delivery order of those deltas, every boundary serve equals the
  * one-shot batch ingest — additivity is what makes the O(delta)
  * refresh exact, so it gets the random-input treatment, not just
  * planted cases.
  */
class IncrementalSwaPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val DayUs = 86400000000L
  private val cfg = Config(Seq("k"), "ts", "v", DayUs)

  private def toDf(rows: Seq[(Long, Int, Int, Double)]): DataFrame =
    rows.toDF("k", "d", "h", "v")
      .withColumn("ts",
        timestamp_micros(col("d") * DayUs + col("h") * 3600000000L))
      .select("k", "ts", "v")

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  // keys 1..4, days 0..5, hours 0..23, cent-grid values
  private val eventGen = for {
    n <- Gen.chooseNum(1, 60)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(1L, 4L)
      d <- Gen.chooseNum(0, 5)
      h <- Gen.chooseNum(0, 23)
      c <- Gen.chooseNum(-500, 500)
    } yield (k, d, h, c / 100.0))
  } yield rows

  test("any delta partition in any order serves equal to one batch ingest") {
    val prop = Prop.forAll(eventGen, Gen.chooseNum(1, 4),
        Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (rows, nDeltas, seed) =>
      val rnd = new scala.util.Random(seed)
      // random partition into nDeltas groups, random delivery order
      val grouped = rows.map(r => (rnd.nextInt(nDeltas), r))
        .groupBy(_._1).values.map(_.map(_._2)).toSeq
      val order = rnd.shuffle(grouped)

      val inc = Spill.newPath(spark)
      order.zipWithIndex.foreach { case (g, i) =>
        IncrementalSwa.ingest(toDf(g), inc, cfg, i.toLong)
      }
      val direct = Spill.newPath(spark)
      IncrementalSwa.ingest(toDf(rows), direct, cfg, 0L)

      for (day <- Seq(2, 6); w <- Seq(1, 3, 6)) {
        assert(multiset(IncrementalSwa.serve(spark, inc, cfg, day * DayUs, w)) ==
          multiset(IncrementalSwa.serve(spark, direct, cfg, day * DayUs, w)),
          s"day $day window $w deltas ${order.size} seed $seed")
      }
      // compaction must also be invisible
      IncrementalSwa.compact(spark, inc, cfg)
      assert(multiset(IncrementalSwa.serve(spark, inc, cfg, 6 * DayUs, 6)) ==
        multiset(IncrementalSwa.serve(spark, direct, cfg, 6 * DayUs, 6)))
      true
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
