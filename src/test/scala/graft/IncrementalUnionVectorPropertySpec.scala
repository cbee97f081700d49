package graft

import graft.operators.{IncrementalUnion, IncrementalVector, Spill}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The [[IncrementalSwaPropertySpec]] invariant for the r13 stores:
  * for ANY item/vector set, ANY partition into deltas, and ANY
  * delivery order, every boundary serve equals the one-shot batch
  * ingest — set union is a semilattice (idempotent + commutative +
  * associative), grid vector sums are additive, and compaction is
  * invisible. Random inputs, not just planted cases.
  */
class IncrementalUnionVectorPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val DayUs = 86400000000L
  private val uCfg = IncrementalUnion.Config(Seq("k"), "ts", "item", DayUs)
  private val vCfg = IncrementalVector.Config(Seq("k"), "ts", "vec", DayUs)

  private def itemDf(rows: Seq[(Long, Int, String)]): DataFrame =
    rows.toDF("k", "d", "item")
      .withColumn("ts", timestamp_micros(col("d") * DayUs + 1000000L))
      .select("k", "ts", "item")

  private def vecDf(rows: Seq[(Long, Int, Seq[Double])]): DataFrame =
    rows.toDF("k", "d", "vec")
      .withColumn("ts", timestamp_micros(col("d") * DayUs + 1000000L))
      .select("k", "ts", "vec")

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  private val itemGen = for {
    n <- Gen.chooseNum(1, 50)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(1L, 4L)
      d <- Gen.chooseNum(0, 4)
      i <- Gen.oneOf("a", "b", "c", "d", "e", "f")
    } yield (k, d, i))
  } yield rows

  // dim-3 vectors on the cent grid (exact on the 1e-4 serve grid too)
  private val vecGen = for {
    n <- Gen.chooseNum(1, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(1L, 3L)
      d <- Gen.chooseNum(0, 4)
      xs <- Gen.listOfN(3, Gen.chooseNum(-300, 300))
    } yield (k, d, xs.map(_ / 100.0)))
  } yield rows

  test("union: any delta partition in any order serves equal to one batch ingest") {
    val prop = Prop.forAll(itemGen, Gen.chooseNum(1, 4),
        Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (rows, nDeltas, seed) =>
      val rnd = new scala.util.Random(seed)
      val order = rnd.shuffle(rows.map(r => (rnd.nextInt(nDeltas), r))
        .groupBy(_._1).values.map(_.map(_._2)).toSeq)
      val inc = Spill.newPath(spark)
      order.zipWithIndex.foreach { case (g, i) =>
        IncrementalUnion.ingest(itemDf(g), inc, uCfg, i.toLong)
      }
      val direct = Spill.newPath(spark)
      IncrementalUnion.ingest(itemDf(rows), direct, uCfg, 0L)
      for (day <- Seq(2, 5); w <- Seq(1, 5)) {
        assert(
          multiset(IncrementalUnion.serve(spark, inc, uCfg, day * DayUs, w)) ==
          multiset(IncrementalUnion.serve(spark, direct, uCfg, day * DayUs, w)),
          s"day $day window $w seed $seed")
      }
      IncrementalUnion.compact(spark, inc, uCfg)
      assert(multiset(IncrementalUnion.serve(spark, inc, uCfg, 5 * DayUs, 5)) ==
        multiset(IncrementalUnion.serve(spark, direct, uCfg, 5 * DayUs, 5)))
      true
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("vector: any delta partition in any order serves equal to one batch ingest") {
    val prop = Prop.forAll(vecGen, Gen.chooseNum(1, 3),
        Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (rows, nDeltas, seed) =>
      val rnd = new scala.util.Random(seed)
      val order = rnd.shuffle(rows.map(r => (rnd.nextInt(nDeltas), r))
        .groupBy(_._1).values.map(_.map(_._2)).toSeq)
      val inc = Spill.newPath(spark)
      order.zipWithIndex.foreach { case (g, i) =>
        IncrementalVector.ingest(vecDf(g), inc, vCfg, i.toLong)
      }
      val direct = Spill.newPath(spark)
      IncrementalVector.ingest(vecDf(rows), direct, vCfg, 0L)
      // compare the EXACT columns (grid sums, counts, raw min/max);
      // f_eavg divides by the count in one order on both sides
      def served(dir: String, w: Int) = multiset(
        IncrementalVector.serve(spark, dir, vCfg, 5 * DayUs, w)
          .select("k", "sum_grid", "f_ecnt", "f_emin", "f_emax", "f_eavg"))
      for (w <- Seq(1, 5))
        assert(served(inc, w) == served(direct, w), s"window $w seed $seed")
      IncrementalVector.compact(spark, inc, vCfg)
      assert(served(inc, 5) == served(direct, 5))
      true
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
}
