package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`) — SURVEY.md §2.11.
  *
  * Scale design: queries are the small side and are always broadcast;
  * the corpus is never collected or crossed with itself. Brute force is
  * the exact baseline (one pass over the corpus per query batch, then a
  * per-query top-k); IVF cuts the scanned fraction to the probed cells.
  */
object Similarity {

  /** Dot product of two equal-length float/double arrays — a native
    * codegen'd Catalyst expression ([[graft.functions.DotProductExpr]];
    * the HOF `aggregate`/`zip_with` formulation is CodegenFallback and
    * runs interpreted, unacceptable on the 100 TB scoring path).
    * Elements are widened to double BEFORE multiplying and summed in a
    * sequential left fold, so the result is bit-deterministic and
    * engine-portable (oracle parity).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProductExpr.dot(a, b)

  def l2Norm(a: Column): Column =
    graft.functions.DotProductExpr.l2Norm(a)

  /** Prefer scoring against per-side precomputed norms (see
    * [[bruteForceTopK]]) — this convenience form recomputes both norms
    * for every pair.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Per-query top-k of a (qId, id, score) frame. Integral ids go
    * through the bounded map-side-combinable
    * [[graft.functions.TopKAggregator]] — the shuffle carries at most
    * partitions × k rows per query and nothing is globally sorted.
    * (A Window `row_number` would shuffle and fully sort EVERY scored
    * pair; it remains only as the fallback for non-integral id
    * columns.) Both paths rank by (score desc, id asc) — identical
    * rows out.
    */
  private def perQueryTopK(scored: DataFrame, k: Int,
      qIdCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = scored.schema(idCol).dataType
    idType match {
      case LongType | IntegerType | ShortType | ByteType =>
        scored
          .groupBy(col(qIdCol))
          .agg(graft.functions.TopKAggregator(k)(
            col("score"), col(idCol).cast("long")).as("__tk"))
          .select(col(qIdCol), posexplode(col("__tk")).as(Seq("__r", "__p")))
          .select(col(qIdCol), col("__p._2").cast(idType).as(idCol),
            col("__p._1").as("score"), (col("__r") + 1).cast("int").as("rank"))
      case _ =>
        val w = Window.partitionBy(qIdCol).orderBy(col("score").desc, col(idCol).asc)
        scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
          .select(col(qIdCol), col(idCol), col("score"), col("rank"))
    }
  }

  /** Exact brute-force top-k by cosine: broadcast the query set, score
    * every (corpus row, query) pair map-side with the codegen'd dot
    * kernel — norms are computed ONCE per corpus row / per query before
    * the join, not per pair — then keep k per query via the bounded
    * partial top-k aggregate. Deterministic tie-break: higher score,
    * then lower corpus id.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol), l2Norm(col(vecCol)).as("__cn"))
    val q = queries.select(col(qIdCol), col(qVecCol), l2Norm(col(qVecCol)).as("__qn"))
    val scored = c.join(broadcast(q))
      .select(col(qIdCol), col(idCol),
        (dot(col(vecCol), col(qVecCol)) / (col("__cn") * col("__qn"))).as("score"))
    perQueryTopK(scored, k, qIdCol, idCol)
  }

  /** IVF (inverted-file) index: centroids := the `nCells` corpus rows
    * with the smallest `xxhash64(id)` (a deterministic pseudo-random
    * sample, fetched as a per-partition top-k — no driver-side
    * `count()`, no full sort); each corpus row is assigned to its
    * nearest centroid via one map-side-combinable `max_by` aggregation;
    * a query scans only `nProbe` nearest cells. Optional Lloyd
    * iterations refine the centroids; the (bounded, `nCells`-row)
    * centroid set is collected to the driver between iterations so the
    * plan depth stays constant. Deterministic end to end: same data +
    * same config ⇒ identical output.
    *
    * Returns the same schema as [[bruteForceTopK]]; recall < 1 by
    * construction — verify against the brute-force baseline in tests.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec",
      kmeansIters: Int = 0, kmeansTol: Double = 1e-6): DataFrame = {
    // the normed corpus projection feeds the centroid sample, every
    // Lloyd iteration, AND the final assignment. With
    // `spark.graft.ivf.cacheCorpus=true` it is persisted once
    // (MEMORY_AND_DISK) across those scans and released after the
    // (bounded) result spills — worth it when many Lloyd iterations
    // re-read an expensive upstream; OFF by default because for the
    // common small-iteration refinement the extra cache write + spill
    // round-trip costs more than the re-scan (and a 100 TB corpus
    // should re-scan parquet, not mirror itself into block storage).
    val normed0 = corpus.select(col(idCol), col(vecCol),
      l2Norm(col(vecCol)).as("__vn"))
    val cacheCorpus = kmeansIters > 0 && corpus.sparkSession.conf
      .get("spark.graft.ivf.cacheCorpus", "false").toBoolean
    val normed = if (cacheCorpus)
      normed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else normed0

    // TakeOrderedAndProject: per-partition top-nCells, driver merge of
    // nCells rows — scale-safe; id tie-break makes hash ties stable
    var centroids = normed
      .orderBy(xxhash64(col(idCol)).asc, col(idCol).asc)
      .limit(nCells)
      .select(col(idCol).as("cell_id"), col(vecCol).as("centroid"))

    // nearest-centroid assignment: broadcast centroids (norms computed
    // once per centroid / per corpus row, not per pair), fold per id
    // with min_by over (-cscore, cell_id) — partial-aggregable, no
    // Window (which would sort the whole corpus by id). Ties: higher
    // cscore, then lower cell_id; only the always-numeric score is
    // negated, so string id columns work (negating cell_id would bind
    // the operator to numeric ids). The corpus norm rides through the
    // fold so the scoring join never recomputes it.
    def assign(cents: DataFrame): DataFrame = {
      val cn = cents.select(col("cell_id"), col("centroid"),
        l2Norm(col("centroid")).as("__cen"))
      normed
        .join(broadcast(cn))
        .select(col(idCol), col(vecCol), col("__vn"), col("cell_id"),
          (dot(col(vecCol), col("centroid")) / (col("__vn") * col("__cen")))
            .as("cscore"))
        .groupBy(col(idCol))
        .agg(min_by(struct(col("cell_id"), col(vecCol).as("__v"),
            col("__vn").as("__n")),
          struct(-col("cscore"), col("cell_id"))).as("__a"))
        .select(col(idCol), col("__a.__v").as(vecCol),
          col("__a.__n").as("__vn"), col("__a.cell_id").as("cell_id"))
    }

    // Lloyd refinement with a convergence stop: iterate until no
    // centroid element moves more than `kmeansTol` (or `kmeansIters`
    // is exhausted) — `kmeansIters` is a CAP, not a fixed cost. New
    // centroid = element-wise mean of its cell (posexplode → avg per
    // (cell, position) → re-assemble). Centroids are nCells small
    // rows: collect + re-create instead of persisting an ever-deeper
    // lazy chain; the convergence check reuses the same collected rows.
    // The LAST possible iteration skips the collect round-trip and
    // chains lazily — there is no later work for the convergence check
    // to save, and the centroid plan collapses into the subsequent
    // broadcast exchange anyway (a kmeansIters=1 refinement runs zero
    // driver round-trips).
    var prev: Map[Any, Array[Float]] = null
    var iter = 0
    var converged = false
    while (iter < kmeansIters && !converged) {
      val next = assign(centroids)
        .select(col("cell_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cell_id", "pos").agg(avg(col("x")).as("m"))
        .groupBy("cell_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m").cast("float")).as("centroid"))
      if (iter == kmeansIters - 1) {
        centroids = next
      } else {
        val rows = next.collect().toSeq
        val cur = rows.map(r => r.get(0) -> r.getSeq[Float](1).toArray).toMap
        converged = prev != null && prev.keySet == cur.keySet &&
          cur.forall { case (c, a) =>
            val b = prev(c)
            a.length == b.length &&
              a.indices.forall(i => math.abs(a(i) - b(i)) <= kmeansTol)
          }
        prev = cur
        centroids = corpus.sparkSession.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, next.schema)
      }
      iter += 1
    }
    // localize the (nCells-row) centroid set ONCE: the assignment and
    // the query-probe below each broadcast a DIFFERENT projection of
    // it, and two non-identical broadcast exchanges would re-run the
    // whole centroid pipeline twice — a LocalRelation ships for free
    val centRows = centroids.collect().toSeq
    centroids = corpus.sparkSession.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(centRows).asJava,
      centroids.schema)
    val assigned = assign(centroids)

    // probe the nProbe nearest cells per query
    val wProbe = Window.partitionBy(qIdCol).orderBy(col("cscore").desc, col("cell_id").asc)
    val probed = queries.join(broadcast(centroids))
      .select(col(qIdCol), col(qVecCol), col("cell_id"),
        cosine(col(qVecCol), col("centroid")).as("cscore"))
      .withColumn("r", row_number().over(wProbe)).where(col("r") <= nProbe)
      .select(col(qIdCol), col(qVecCol), col("cell_id"))

    val scored = assigned
      .join(probed.withColumn("__qn", l2Norm(col(qVecCol))), "cell_id")
      .select(col(qIdCol), col(idCol),
        (dot(col(vecCol), col(qVecCol)) / (col("__vn") * col("__qn"))).as("score"))
    val topk = perQueryTopK(scored, k, qIdCol, idCol)
    if (!cacheCorpus) topk
    else {
      // the result is bounded (queries × k rows): spill it so the
      // corpus cache can be released before returning
      val out = Spill.roundTrip(topk)
      normed.unpersist(false)
      out
    }
  }

  /** Random-hyperplane LSH bucketing for cosine: bit i of the bucket id
    * is the sign of `dot(v, h_i)` where the `h_i` are deterministic
    * seeded hyperplanes materialized as LITERAL arrays — computed once
    * at plan build, not re-derived per row (the hash-per-element
    * formulation re-evaluated nBits×dim hash calls per row).
    * Same-bucket rows are near-duplicate candidates.
    */
  def cosineLshBucket(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val planes = Array.fill(nBits, dim)(rng.nextGaussian())
    val bits = planes.zipWithIndex.map { case (h, i) =>
      val hLit = array(h.map(lit): _*)
      when(dot(vec, hLit) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets: candidates
    * share a bucket (shuffle by bucket id only), verified by exact
    * cosine >= threshold. Bucket membership is capped against
    * degenerate hot buckets (near-constant embeddings) — see
    * [[Dedup.capBuckets]] — and pairs come from one in-bucket
    * expansion over the collected (bounded) member list, so the corpus
    * — and the nBits-dot-product hashing — is scanned ONCE, not once
    * per self-join side.
    */
  def embeddingNearDuplicates(
      corpus: DataFrame, threshold: Double, dim: Int, nBits: Int = 12,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = Dedup.capBuckets(
      corpus.select(col(idCol), col(vecCol),
        cosineLshBucket(col(vecCol), dim, nBits).as("bucket"),
        l2Norm(col(vecCol)).as("__n")),
      Seq("bucket"), idCol)
    val ms = "__graft_ms"
    b.groupBy(col("bucket"))
      .agg(array_sort(collect_list(struct(
        col(idCol).as("id"), col(vecCol).as("v"), col("__n").as("n")))).as(ms))
      .where(size(col(ms)) >= 2)
      .select(explode(flatten(transform(col(ms), (x, i) =>
        transform(slice(col(ms), i + 2, size(col(ms))),
          y => struct(x.getField("id").as("id_a"), y.getField("id").as("id_b"),
            (dot(x.getField("v"), y.getField("v")) /
              (x.getField("n") * y.getField("n"))).as("cos"))))))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.cos"))
      .where(col("cos") >= threshold)
      .distinct()
  }
}
