package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over int8-quantized embeddings, on an
  * exact integer grid — the corpus-clustering primitive under
  * cluster-balanced sampling, SemDeDup-style cluster-then-dedup, and
  * quantile pruning of far-from-centroid outliers (data curation's
  * standard embedding-space moves).
  *
  * The FAISS-posture trainers here ([[Similarity.trainCentroids]],
  * [[ProductQuant]]) fit codebooks on a bounded driver sample — right
  * for ANN, where the codebook is a compression device. Corpus
  * CURATION decisions (which documents to keep) must instead assign
  * every document against centroids fitted on the full corpus, so this
  * operator runs Lloyd's iterations as k bounded Spark jobs:
  *
  *  - assignment is a pure projection — centroids are collected to the
  *    driver (k·dim longs, bounded by construction) and injected as
  *    LITERAL arrays, the per-row argmin evaluating through the
  *    codegen'd [[graft.functions.DotProductExpr]] integer kernel; no
  *    shuffle, no join;
  *  - the update is one groupBy(k) with per-dimension LONG sums
  *    (map-side combine ⇒ k·dim longs per partition cross the wire,
  *    independent of corpus size — the [[Similarity.int8Centroids]]
  *    shape).
  *
  * Everything on the decision path is integer-exact, so the result is
  * bit-reproducible at any partitioning and in any engine:
  *
  *  - vectors are int8-quantized ([[Similarity.quantizeInt8]]);
  *  - centroids live on a 1/S grid, stored as `round(S·mean)` longs
  *    via the integer closed form `floorDiv(2·S·sum + n, 2n)`
  *    (round-half-up of `S·sum/n` without ever dividing floats);
  *  - distances compare as exact longs:
  *    `‖S·x − c‖² = S²·‖x‖² − 2S·(x·c) + ‖c‖²`, every term within
  *    long range (|x|≤127, |c|≤127·S, dim ≤ 2¹⁵ ⇒ |dist| < 2⁶²),
  *    the dot products exact through [[graft.functions.DotProduct]]'s
  *    long accumulator;
  *  - argmin ties break to the smallest cluster id; an emptied cluster
  *    keeps its previous centroid (deterministic, restatable).
  *
  * Cost: `iters` full scans (each one job), shuffle O(k·dim) per job.
  * At 100 TB that is the floor for exact Lloyd's — there is no
  * asymptotically cheaper exact iteration — and `iters` is a small
  * constant in curation practice (the clusters only feed
  * threshold/sampling decisions, not a nearest-neighbor contract).
  */
object Clustering {

  /** Centroid grid: one unit = 1/S of an int8 quantization step. */
  val Scale = 10000L

  /** Final state of a k-means run: per-cluster grid centroids plus the
    * assignment of every input row against them. */
  final case class KmeansResult(
      /** `(idCol, cluster int, dist long)` — dist is the exact
        * integer `‖S·x − c‖²` against the final centroid. */
      assignments: DataFrame,
      /** `centroids(j)` = grid centroid of cluster j (length dim). */
      centroids: IndexedSeq[Array[Long]],
      /** `sizes(j)` = rows assigned to j in the final assignment. */
      sizes: IndexedSeq[Long])

  /** Run `iters` Lloyd's updates from a deterministic seed (the `k`
    * rows with the smallest ids), then assign every row against the
    * final centroids. `qCol` must be an int8-quantized `array<int>`
    * ([[Similarity.quantizeInt8]]'s `_q8` column).
    */
  def kmeansInt8(df: DataFrame, idCol: String, qCol: String,
      k: Int, iters: Int): KmeansResult = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got $k, $iters")
    // null vectors are excluded from the WHOLE run, not just the seed
    // scan: left in, they NPE the seed collect, count into a cluster's
    // n while contributing nothing to its sum (diluting the centroid
    // toward the origin each iteration), and surface in assignments as
    // cluster-0 rows with a null distance
    //
    // persisted for the run: Lloyd's is inherently iterative — the
    // seed scan, every update iteration, and the final assignment each
    // re-read the source and re-evaluate the caller's quantization
    // otherwise (at scale that is iters+2 full parquet passes where
    // one suffices). Projected to (id, q) first so the cache holds
    // only the two columns the iterations touch; serialized
    // MEMORY_AND_DISK_SER so a corpus-sized cache degrades to compact
    // spilled blocks under executor memory pressure instead of
    // thrashing the heap the iterations need (r15 advice).
    val df0 = df.where(col(qCol).isNotNull)
      .select(col(idCol), col(qCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val seed = df0.orderBy(col(idCol)).limit(k)
      .select(col(qCol)).collect()
    require(seed.length == k,
      s"k-means needs at least k=$k rows with non-null '$qCol', " +
        s"found ${seed.length}")
    var cents: IndexedSeq[Array[Long]] = seed.toIndexedSeq
      .map(_.getSeq[Int](0).map(_.toLong * Scale).toArray)

    for (_ <- 0 until iters) {
      val assigned = df0.withColumn("__c", assignExpr(col(qCol), cents)("c"))
      val sums = Similarity.int8Centroids(assigned, "__c", qCol)
        .select(col("__c"), col("n"), col("sum_q8"))
        .collect()
        .map(r => r.getInt(0) ->
          (r.getLong(1), r.getSeq[Long](2).toArray)).toMap
      cents = cents.zipWithIndex.map { case (prev, j) =>
        sums.get(j) match {
          case Some((n, s)) =>
            // round-half-up of S·s/n in pure integer arithmetic:
            // floorDiv(2·S·s + n, 2n); |2·S·s| ≤ 2·10⁴·127·n·dim stays
            // in long range for any corpus (s is a sum of n int8s)
            s.map(si => Math.floorDiv(2L * Scale * si + n, 2L * n))
          case None => prev // emptied cluster: keep its centroid
        }
      }
    }

    // the final assignment is SPILLED (narrow rows: id, cluster int,
    // dist long): callers consume it more than once (pruning reads it
    // for the histogram pass AND the cutoff join), and each lazy
    // consumption would otherwise re-pay k integer dots per row; the
    // sizes count then reads the same flat spill, after which the
    // cached input is released
    val a =
      try Spill.roundTrip(df0
        .withColumn("__a", assignExpr(col(qCol), cents))
        .select(col(idCol), col("__a")("c").as("cluster"),
          col("__a")("dist").as("dist")))
      finally df0.unpersist()
    val sizeRows = a.groupBy(col("cluster")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    KmeansResult(a, cents, (0 until k).map(j => sizeRows.getOrElse(j, 0L)))
  }

  /** Per-cluster quantile-threshold pruning: keep the rows whose
    * distance-to-centroid is within the cluster's `keepNum/keepDen`
    * quantile — the "drop far-from-centroid outliers" curation move.
    * The cutoff is the smallest distance whose cumulative count
    * reaches `ceil(n·keepNum/keepDen)`; boundary ties are ALL kept
    * (a value-threshold contract — deterministic with no per-row
    * tiebreak, the property that lets it run without any per-cluster
    * rank window). Compares `cum·keepDen >= n·keepNum` in exact
    * integers — no float quantile on the decision path.
    *
    * Scale shape: one groupBy on (cluster, dist) — fine-grained keys,
    * no k-hot-key skew — then a window over the per-cluster DISTINCT
    * distances (bounded by value cardinality, not corpus rows), and a
    * broadcast of k cutoff rows back onto the assignment. The
    * corpus-sized frame is never windowed (the q_top_fraction
    * histogram-cutoff lesson, SCALE.md axis 12).
    */
  def pruneByCentroidDist(assignments: DataFrame, keepNum: Int,
      keepDen: Int): DataFrame = {
    require(keepNum > 0 && keepNum <= keepDen,
      s"keep fraction must be in (0, 1]: got $keepNum/$keepDen")
    import org.apache.spark.sql.expressions.Window
    val hist = assignments.groupBy(col("cluster"), col("dist")).count()
    val w = Window.partitionBy(col("cluster")).orderBy(col("dist"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("cluster"))
    val cutoff = hist
      .withColumn("cum", sum(col("count")).over(w))
      .withColumn("n", sum(col("count")).over(tot))
      // ceil(n·keepNum/keepDen) ≤ cum  ⇔  cum·keepDen ≥ n·keepNum
      .where(col("cum") * keepDen >= col("n") * keepNum)
      .groupBy(col("cluster")).agg(min(col("dist")).as("cut"))
    assignments.join(broadcast(cutoff), Seq("cluster"))
      .where(col("dist") <= col("cut"))
      .drop("cut")
  }

  /** `struct(dist, c)` of the argmin centroid for a quantized vector:
    * dist_j = S²·‖x‖² − 2S·(x·c_j) + ‖c_j‖² evaluated per literal
    * centroid, min over the k structs (field order makes ties pick the
    * smallest j). All codegen'd — the per-row cost is k integer dots.
    */
  private def assignExpr(q: Column,
      cents: IndexedSeq[Array[Long]]): Column = {
    val nx2 = graft.functions.DotProductExpr.dot(q, q).cast("long") *
      lit(Scale * Scale)
    val cands = cents.zipWithIndex.map { case (c, j) =>
      // centroid values |c| ≤ 127·S < 2³¹ — exact as an int literal
      // array, which keeps the dot on the dotII long-accumulator path
      val cLit = typedLit(c.map(_.toInt))
      val dot = graft.functions.DotProductExpr.dot(q, cLit).cast("long")
      val cn2 = c.map(v => v * v).sum
      struct(
        (nx2 - lit(2L * Scale) * dot + lit(cn2)).as("dist"),
        lit(j).as("c"))
    }
    array_min(array(cands: _*))
  }
}
