package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index — the two pruning regimes composed, each
  * already proven separately: the IVF layer reads only the probed
  * cells' PARTITIONS (~nProbe/nCells of the corpus, [[IvfIndex]] /
  * SCALE.md axis 8) and the PQ layer scans those cells as m-byte code
  * arrays instead of float vectors (32×, [[ProductQuant]] / axis 17).
  * A query batch therefore touches ~(probed/nCells)·(1/32) of the
  * index bytes before the bounded exact rescore — the FAISS IVFPQ
  * serving shape.
  *
  * Layout under `path`:
  *  - `centroids/` — IVF cell centroids (tiny).
  *  - `codebooks/` — `(sub, code, centroid)` PQ codebooks (tiny).
  *  - `vectors/`   — `(id, vector, codes, cell_id)` partitioned by
  *    cell: codes for the ADC scan, the float vector rides along for
  *    candidate rescore (columnar parquet: the ADC scan reads ONLY the
  *    codes column — column pruning keeps the float bytes on disk).
  *
  * Training is deterministic end to end (both layers train at the
  * driver over the xxhash64-ordered bounded sample), so rebuilds on
  * any partitioning produce byte-identical indexes.
  */
object IvfPqIndex {

  /** Persisted encoding version: codes are PQ over the RESIDUAL
    * v̂ − centroid(cell) (the FAISS IVFPQ default — residuals span a
    * far smaller ball than raw vectors, so the same m·kCodes budget
    * quantizes them more finely), and [[query]] adds the exact
    * dot(q̂, centroid) term per probed cell. An index written under a
    * different encoding would score garbage silently, so the marker is
    * persisted and [[query]] refuses a mismatch — the
    * [[NearDupIndex]] hash-family discipline.
    */
  private val Encoding = "pq_residual_v1"

  def build(corpus: DataFrame, path: String,
      nCells: Int, m: Int = 8, kCodes: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      kmeansIters: Int = 3, pqIters: Int = 5,
      trainSampleCap: Int = 1 << 16): Unit = {
    // training and encoding are the SAME code paths the incremental
    // store's rebuild runs ([[trainQuantizersTo]] / [[encodeResiduals]])
    // — one copy, so built and rebuilt indexes cannot drift an ulp
    // apart; the residual frame is spilled once inside the trainer and
    // reused by the encode
    val q = trainQuantizersTo(corpus, path, nCells, m, kCodes,
      idCol, vecCol, kmeansIters, pqIters, trainSampleCap)
    encodeResiduals(q.residuals, q.cb, idCol, vecCol)
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$path/vectors")
  }

  /** Freshly trained quantizers plus the spilled residual frame they
    * were trained over — so a caller re-encoding the SAME corpus (the
    * [[IncrementalIvfPq.rebuild]] retrain cycle) reuses the residuals
    * instead of paying the assignment cross-scoring a second time.
    */
  private[operators] case class TrainedQuantizers(centroids: DataFrame,
      cb: Array[Array[Array[Float]]], residuals: DataFrame)

  /** [[build]]'s training passes only, written to `qPath` (centroids /
    * codebooks / meta — no vectors): the quantizer-retrain half of the
    * FAISS `train()`+`add()` cycle, used by [[IncrementalIvfPq.rebuild]]
    * to stage NEW quantizers beside the live index before the atomic
    * generation swap. Same deterministic driver-side training as
    * [[build]].
    */
  private[operators] def trainQuantizersTo(corpus: DataFrame, qPath: String,
      nCells: Int, m: Int, kCodes: Int,
      idCol: String, vecCol: String,
      kmeansIters: Int, pqIters: Int,
      trainSampleCap: Int): TrainedQuantizers = {
    val spark = corpus.sparkSession
    val centroids = Similarity.trainCentroids(corpus, nCells, idCol, vecCol,
      kmeansIters, 1e-6, trainSampleCap)
    import spark.implicits._
    // after the centroids exist, the remaining actions form two
    // independent chains — {centroids, meta} layout writes vs the
    // residual spill → PQ training → codebooks write — with no data
    // dependency between them: overlapped, the wall is the heavy
    // residual chain, not the sum (guide §2.6; the build was measured
    // job-count-bound at the bench sf — ~35 sequential jobs × ~90 ms
    // fixed driver cost each). Same arithmetic, same files, same
    // determinism — only who waits for whom changes.
    var cb: Array[Array[Array[Float]]] = null
    var res: DataFrame = null
    Par.run(
      () => centroids.write.mode("overwrite").parquet(s"$qPath/centroids"),
      () => Seq(Encoding).toDF("encoding").coalesce(1)
        .write.mode("overwrite").parquet(s"$qPath/meta"),
      () => {
        val assigned = Similarity.assignCells(corpus, centroids, idCol, vecCol)
        val vhat = transform(col(vecCol),
          x => (x / greatest(col("__vn"), lit(1e-30))).cast("float"))
        res = Spill.roundTrip(
          assigned.join(broadcast(centroids), Seq("cell_id"))
            .select(col(idCol), col(vecCol), col("cell_id"),
              zip_with(vhat, col("centroid"),
                (a, b) => (a - b).cast("float")).as("__res")))
        cb = ProductQuant.trainCodebooks(res, m, kCodes, idCol, "__res",
          pqIters, trainSampleCap, normalizeInput = false)
        cb.zipWithIndex.flatMap { case (codes, s) =>
          codes.zipWithIndex.map { case (cent, c) => (s, c, cent.toSeq) }
        }.toSeq.toDF("sub", "code", "centroid")
          .write.mode("overwrite").parquet(s"$qPath/codebooks")
      })
    TrainedQuantizers(centroids, cb, res)
  }

  /** Encode a residual frame (the [[TrainedQuantizers.residuals]]
    * shape) against codebooks — [[build]]'s final step, shared with
    * the rebuild so the two cannot drift. Returns
    * (id, vector, cell_id, codes).
    */
  private[operators] def encodeResiduals(res: DataFrame,
      cb: Array[Array[Array[Float]]], idCol: String,
      vecCol: String): DataFrame =
    res.select(col(idCol), col(vecCol), col("cell_id"))
      .join(ProductQuant.encode(res, cb, idCol, "__res",
        normalizeInput = false), Seq(idCol))

  private[operators] def loadCodebooks(spark: SparkSession,
      path: String): Array[Array[Array[Float]]] = {
    val rows = spark.read.parquet(s"$path/codebooks")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val cb = Array.ofDim[Array[Float]](m, k)
    rows.foreach { case (s, c, cent) => cb(s)(c) = cent }
    cb.map(_.toArray)
  }

  /** The residual-encode pass shared by [[build]] and
    * [[IncrementalIvfPq.ingest]]: assign cells against the FROZEN
    * centroids, form normalized residuals, PQ-encode against the
    * FROZEN codebooks. Deterministic given its inputs, so an
    * incremental ingest encodes exactly as the build pass would have.
    * Returns (id, vector, cell_id, codes).
    */
  private[operators] def encodeAssign(corpus: DataFrame,
      centroids: DataFrame, cb: Array[Array[Array[Float]]],
      idCol: String, vecCol: String): DataFrame = {
    val assigned = Similarity.assignCells(corpus, centroids, idCol, vecCol)
    val vhat = transform(col(vecCol),
      x => (x / greatest(col("__vn"), lit(1e-30))).cast("float"))
    // spilled ONCE (the build pass's measured lesson): the encode join
    // consumes the residual frame on both sides, and an unspilled plan
    // re-runs the assignment cross-scoring and residual arithmetic —
    // the ingest's dominant work — per side
    val res = Spill.roundTrip(
      assigned.join(broadcast(centroids), Seq("cell_id"))
        .select(col(idCol), col(vecCol), col("cell_id"),
          zip_with(vhat, col("centroid"),
            (a, b) => (a - b).cast("float")).as("__res")))
    res.select(col(idCol), col(vecCol), col("cell_id"))
      .join(ProductQuant.encode(res, cb, idCol, "__res",
        normalizeInput = false), Seq(idCol))
  }

  /** Validate the persisted encoding marker — shared by every reader
    * of a `$path/{centroids,codebooks,meta}` quantizer layout.
    */
  private[operators] def requireEncoding(spark: SparkSession,
      path: String): Unit = {
    // a MISSING meta marks a pre-residual (v0) index and must say so;
    // any other read failure (wrong path, FS trouble) must surface
    // as itself, not masquerade as an encoding mismatch
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val enc = if (fs.exists(metaPath))
      spark.read.parquet(metaPath.toString).head().getString(0)
    else "pq_raw_v0"
    require(enc == Encoding,
      s"IVF-PQ index at $path was written under encoding '$enc', this " +
        s"engine scores '$Encoding' — ADC over mismatched codes is " +
        "silently wrong; rebuild the index with IvfPqIndex.build")
  }

  /** Top-k: probe → partition-pruned ADC scan over codes → bounded
    * candidates → exact rescore reading only candidate rows' vectors.
    */
  def query(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nProbe: Int, rescoreFactor: Int = 20,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame =
    queryVectors(spark, path, spark.read.parquet(s"$path/vectors"),
      queries, k, nProbe, rescoreFactor, idCol, vecCol, qIdCol, qVecCol)

  /** [[query]] over a caller-supplied vectors frame (id, vector,
    * cell_id, codes) — the quantizer layout (centroids / codebooks /
    * meta) still reads from `path`. [[IncrementalIvfPq]] passes its
    * version-partitioned live generation here, so the probe, the
    * partition-pruned ADC scan, and the bounded rescore are ONE code
    * path for the static and the maintained index.
    */
  private[operators] def queryVectors(spark: SparkSession, path: String,
      vectors: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int, rescoreFactor: Int = 20,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    // the serve's three bounded driver materializations — encoding
    // marker, codebooks, probed-cell set — are independent reads of
    // different index files: overlapped (guide §2.6), the serve's
    // fixed setup cost is the slowest of the three round-trips, not
    // their sum. A requireEncoding failure still aborts before any
    // result frame is built (Par.run rethrows the first error).
    val centroids = spark.read.parquet(s"$path/centroids")
    var cb: Array[Array[Array[Float]]] = null
    var probed: DataFrame = null
    var cells: Array[Int] = null
    Par.run(
      () => requireEncoding(spark, path),
      () => cb = loadCodebooks(spark, path),
      () => {
        probed = Similarity.probeCells(queries, centroids, nProbe,
          qIdCol, qVecCol)
        // bounded driver materialization (≤ nCells ints) for a literal
        // partition filter — the IvfIndex.query discipline
        cells = probed.select("cell_id").distinct().collect().map(_.getInt(0))
      })
    val kCodes = cb.head.length
    val pruned = vectors
      .where(col("cell_id").isin(cells.map(c => c: Any): _*))

    // ADC over (probed cells ∩ each query's OWN cells): join on cell_id
    // routes each query to its probe list only. Residual decomposition:
    // dot(q̂, v̂) = dot(q̂, centroid_cell) + dot(q̂, residual) — the first
    // term is EXACT per (query, cell), only the residual is quantized
    val qt = ProductQuant.queryTables(queries, cb, qIdCol, qVecCol)
      .join(probed.select(col(qIdCol), col("cell_id")), Seq(qIdCol))
      .join(broadcast(queries.select(col(qIdCol), col(qVecCol))), Seq(qIdCol))
      .join(broadcast(centroids), Seq("cell_id"))
      .select(col(qIdCol), col("cell_id"), col("__tbl"),
        (Similarity.dot(col(qVecCol), col("centroid")) /
          greatest(Similarity.l2Norm(col(qVecCol)), lit(1e-30))).as("__qc"))
    val scored = pruned
      .join(broadcast(qt), Seq("cell_id"))
      .select(col(qIdCol), col(idCol),
        (graft.functions.PqAdcExpr.pqAdc(col("codes"), col("__tbl"), kCodes) +
          col("__qc")).as("score"))
    val cands = Similarity.perQueryTopK(scored, rescoreFactor * k, qIdCol, idCol)
      .select(col(qIdCol), col(idCol))

    ProductQuant.rescoreExact(
      pruned.select(col(idCol), col(vecCol)), cands, queries,
      k, idCol, vecCol, qIdCol, qVecCol)
  }
}
