package graft

import graft.operators.RangeJoin

import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val W = 100L // small bucket width so edges are exercised

  test("bucketed join equals the theta join, boundaries inclusive, no dup pairs") {
    // intervals straddling bucket edges, zero-length, nested, disjoint
    val iv = Seq(
      (1L, 10L, 95L, 205L), // spans buckets 0,1,2
      (1L, 11L, 100L, 100L), // zero-length, exactly on a bucket edge
      (1L, 12L, 150L, 160L), // nested inside 10's span
      (2L, 20L, 0L, 50L),
      (3L, 30L, 400L, 500L))
      .toDF("k", "iv_id", "lo", "hi")
    val pts = Seq(
      (1L, 100L, 95L), (1L, 101L, 100L), (1L, 102L, 155L),
      (1L, 103L, 205L), (1L, 104L, 206L), // one past hi: no match with 10
      (2L, 200L, 50L), (2L, 201L, 51L),
      (3L, 300L, 399L), (4L, 400L, 450L)) // key 4 has no intervals
      .toDF("pk", "p_id", "t")

    val got = RangeJoin.pointInInterval(pts, "t", iv, "lo", "hi",
      Seq("pk" -> "k"), widthUs = W)
      .select("p_id", "iv_id").as[(Long, Long)].collect().sorted.toSeq
    val want = pts.as[(Long, Long, Long)].collect().flatMap { case (pk, pid, t) =>
      iv.as[(Long, Long, Long, Long)].collect().collect {
        case (k, ivId, lo, hi) if k == pk && t >= lo && t <= hi => (pid, ivId)
      }
    }.sorted.toSeq
    assert(got == want, s"got $got want $want")
    assert(got.distinct == got, "a pair must survive exactly once")
  }

  test("plan is an equi-join on (key, bucket) — no nested-loop, no cartesian") {
    val iv = (0L until 50L).map(i => (i % 5, i, i * 10, i * 10 + 25))
      .toDF("k", "iv_id", "lo", "hi")
    val pts = (0L until 200L).map(i => (i % 5, i, i * 3))
      .toDF("pk", "p_id", "t")
    val joined = RangeJoin.pointInInterval(pts, "t", iv, "lo", "hi",
      Seq("pk" -> "k"), widthUs = W)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join planned as a product:\n$plan")
    assert(joined.count() > 0)
  }

  test("guards: hi < lo and bucket explosion are named errors") {
    val pts = Seq((1L, 1L, 10L)).toDF("pk", "p_id", "t")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "t",
        Seq((1L, 1L, 50L, 40L)).toDF("k", "iv_id", "lo", "hi"),
        "lo", "hi", Seq("pk" -> "k"), widthUs = W)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "t",
        Seq((1L, 1L, 0L, 10000000L)).toDF("k", "iv_id", "lo", "hi"),
        "lo", "hi", Seq("pk" -> "k"), widthUs = W,
        maxBucketsPerInterval = 64L)
    }
    // empty intervals side: no stats row, no matches, no crash
    val empty = Seq.empty[(Long, Long, Long, Long)]
      .toDF("k", "iv_id", "lo", "hi")
    assert(RangeJoin.pointInInterval(pts, "t", empty, "lo", "hi",
      Seq("pk" -> "k"), widthUs = W).isEmpty)
  }

  test("random intervals/points match the brute-force reference at several widths") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 4) {
      // times straddle zero so truncating vs floor division bucket
      // boundaries are exercised on both signs
      val ivs = (0 until 60).map { i =>
        val lo = rnd.nextLong() % 5000L
        (rnd.nextInt(4).toLong, i.toLong, lo, lo + rnd.nextInt(700))
      }
      val pts = (0 until 300).map(i =>
        (rnd.nextInt(5).toLong, i.toLong, rnd.nextLong() % 5000L))
      val ivDf = ivs.toDF("k", "iv_id", "lo", "hi")
      val ptDf = pts.toDF("pk", "p_id", "t")
      val want = (for {
        (k, ivId, lo, hi) <- ivs
        (pk, pid, t) <- pts
        if pk == k && t >= lo && t <= hi
      } yield (pid, ivId)).sorted
      for (w <- Seq(37L, 128L, 1000L, 100000L)) {
        val got = RangeJoin.pointInInterval(ptDf, "t", ivDf, "lo", "hi",
          Seq("pk" -> "k"), widthUs = w)
          .select("p_id", "iv_id").as[(Long, Long)].collect().sorted.toSeq
        assert(got == want, s"round=$round width=$w")
      }
    }
  }

  test("keyless join still buckets (global time grid)") {
    val iv = Seq((10L, 95L, 205L), (20L, 300L, 310L))
      .toDF("iv_id", "lo", "hi")
    val pts = Seq((1L, 100L), (2L, 305L), (3L, 250L)).toDF("p_id", "t")
    val got = RangeJoin.pointInInterval(pts, "t", iv, "lo", "hi",
      widthUs = W)
      .select("p_id", "iv_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 10L), (2L, 20L)))
  }
}
