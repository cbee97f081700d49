package graft

import graft.operators.{Clustering, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkTestBase {
  import spark.implicits._

  // two well-separated prototypes in 4-d; members jitter one element
  private def planted: DataFrame = Seq(
    (1L, Array(10f, 0f, 0f, 0f)),
    (2L, Array(0f, 0f, 10f, 0f)),
    (3L, Array(9f, 1f, 0f, 0f)),
    (4L, Array(0f, 1f, 9f, 0f)),
    (5L, Array(10f, 1f, 0f, 0f)),
    (6L, Array(1f, 0f, 10f, 0f))
  ).toDF("vec_id", "embedding")

  private def q8(df: DataFrame): DataFrame =
    Similarity.quantizeInt8(df, "embedding")
      .select(col("vec_id"), col("embedding_q8"))

  test("Lloyd's iterations separate planted clusters; ids partition by prototype") {
    val r = Clustering.kmeansInt8(q8(planted), "vec_id", "embedding_q8",
      k = 2, iters = 2)
    val byCluster = r.assignments.as[(Long, Int, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // seed = ids 1 and 2 (smallest ids), so cluster 0 collects the
    // x-axis family and cluster 1 the z-axis family
    assert(byCluster(0) == Set(1L, 3L, 5L), s"got $byCluster")
    assert(byCluster(1) == Set(2L, 4L, 6L))
    assert(r.sizes == IndexedSeq(3L, 3L))
  }

  test("result is identical at any partitioning (integer-exact path)") {
    val base = q8(planted)
    val a = Clustering.kmeansInt8(base, "vec_id", "embedding_q8", 2, 2)
    val b = Clustering.kmeansInt8(base.repartition(7), "vec_id",
      "embedding_q8", 2, 2)
    assert(a.centroids.map(_.toSeq) == b.centroids.map(_.toSeq))
    assert(a.assignments.as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
      == b.assignments.as[(Long, Int, Long)].collect().sortBy(_._1).toSeq)
  }

  test("an emptied cluster keeps its previous centroid") {
    // both seeds quantize identically, so every row ties and the
    // argmin tiebreak sends ALL rows to cluster 0 — cluster 1 empties
    // and must keep its (identical) seed centroid rather than NaN/0
    val dup = Seq(
      (1L, Array(5f, 5f)), (2L, Array(5f, 5f)), (3L, Array(5f, 5f))
    ).toDF("vec_id", "embedding")
    val r = Clustering.kmeansInt8(q8(dup), "vec_id", "embedding_q8", 2, 2)
    assert(r.sizes == IndexedSeq(3L, 0L))
    assert(r.centroids(1).toSeq == r.centroids(0).toSeq)
  }

  test("quantile-threshold prune keeps the closest half, boundary ties all kept") {
    val a = Seq(
      // cluster 0: distances 1,1,1,9 — cum at dist=1 is 3 >= ceil(4/2),
      // so the cutoff is 1 and all three ties survive
      (1L, 0, 1L), (2L, 0, 1L), (3L, 0, 1L), (4L, 0, 9L),
      // cluster 1: distances 2,4 — cutoff 2 keeps exactly one
      (5L, 1, 2L), (6L, 1, 4L)
    ).toDF("vec_id", "cluster", "dist")
    val kept = Clustering.pruneByCentroidDist(a, 1, 2)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 5L), s"got $kept")
  }

  test("null seed vectors are skipped, and an all-null corpus is refused by name") {
    // a null vector among the k smallest ids used to surface as a bare
    // NPE from getSeq; it must be skipped (the next non-null rows seed)
    val withNull = Seq((0L, Option.empty[Seq[Int]]),
        (1L, Option(Seq(100, 0))), (2L, Option(Seq(0, 100))),
        (3L, Option(Seq(90, 10))))
      .toDF("vec_id", "embedding_q8")
    val r = Clustering.kmeansInt8(withNull, "vec_id", "embedding_q8", 2, 1)
    assert(r.centroids.length == 2)
    // the null row is excluded from the run entirely: it must not
    // appear in assignments nor count into any cluster's size
    assert(r.assignments.count() == 3 && r.sizes.sum == 3,
      s"null row leaked into the run: sizes=${r.sizes}")
    // and when nulls leave fewer than k usable rows, the error names
    // the column instead of NPEing
    val e = intercept[IllegalArgumentException] {
      Clustering.kmeansInt8(withNull, "vec_id", "embedding_q8", 4, 1)
    }
    assert(e.getMessage.contains("non-null") &&
      e.getMessage.contains("embedding_q8"), e.getMessage)
  }

  test("assignments are a stable reusable frame consistent with sizes " +
      "(r15: input cached across iterations, final assignment spilled)") {
    // the r15 rewrite persists the quantized input for the Lloyd's
    // iterations and returns the final assignments as a spilled flat
    // frame (multi-action consumers like pruneByCentroidDist read it
    // twice). Pin: (a) repeated consumption yields identical rows —
    // nothing depends on a cache that was released; (b) the sizes
    // vector equals a recount over the returned frame; (c) every dist
    // equals the exact integer distance to the returned centroid.
    val r = Clustering.kmeansInt8(q8(planted), "vec_id", "embedding_q8",
      k = 2, iters = 2)
    val first = r.assignments.as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    val second = r.assignments.as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(first == second)
    val recount = first.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(r.sizes.zipWithIndex.forall { case (n, j) =>
      recount.getOrElse(j, 0L) == n }, s"sizes=${r.sizes} recount=$recount")
    val qv = q8(planted).as[(Long, Seq[Int])].collect().toMap
    val S = Clustering.Scale
    for ((id, c, dist) <- first) {
      val x = qv(id); val cent = r.centroids(c)
      val want = x.zip(cent).map { case (xi, ci) =>
        val d = S * xi - ci; d * d }.sum
      assert(dist == want, s"id $id: dist $dist != exact $want")
    }
  }

  test("k larger than the corpus is refused by name") {
    val e = intercept[IllegalArgumentException] {
      Clustering.kmeansInt8(q8(planted), "vec_id", "embedding_q8", 99, 1)
    }
    assert(e.getMessage.contains("at least k"))
  }
}
