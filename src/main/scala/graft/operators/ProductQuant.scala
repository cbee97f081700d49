package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011) for embedding search — the
  * memory-bandwidth regime BEYOND int8: vectors are split into `m`
  * subspaces, each subvector replaced by the id of its nearest
  * per-subspace centroid, so a 64-dim float32 vector (256 B) scans as
  * `m` small code ids (8 B at m=8 — 32×). Scoring is ADC (asymmetric
  * distance computation): the query stays full-precision, and each
  * (query, subspace, code) partial dot product is precomputed ONCE
  * into an m·kCodes table, making the per-vector score `m` table
  * lookups instead of a d-element dot product.
  *
  * Training follows the repo's FAISS posture ([[Similarity.ivfTopK]]):
  * per-subspace k-means runs at the DRIVER over a deterministic
  * bounded sample (xxhash64 total order — same sample on any
  * partitioning), and the corpus feeds exactly one distributed encode
  * pass. Search is scan-over-codes → bounded top-`rescoreFactor·k`
  * candidates per query → exact float cosine rescore of candidates
  * only (identical scoring to [[Similarity.bruteForceTopK]]), so
  * recall failures are confined to true-neighbor codes falling outside
  * the candidate pool.
  */
object ProductQuant {

  /** `[m][kCodes][subDim]` codebooks. Pure function of (corpus ids +
    * vectors, parameters): deterministic sample, deterministic seeds
    * (first kCodes distinct subvectors), fixed Lloyd iterations.
    */
  def trainCodebooks(corpus: DataFrame, m: Int, kCodes: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      iters: Int = 5, trainSampleCap: Int = 1 << 16,
      normalizeInput: Boolean = true): Array[Array[Array[Float]]] = {
    require(m > 0 && kCodes > 1 && iters >= 0, s"bad PQ params: m=$m k=$kCodes")
    // normalizeInput=false is the RESIDUAL path (IvfPqIndex): inputs
    // are already v̂ − centroid differences, not unit vectors
    val vec = if (normalizeInput) normalized(col(vecCol))
      else transform(col(vecCol), x => x.cast("float"))
    val sample: Array[Array[Float]] = corpus
      .select(col(idCol), vec.as("__v"))
      .orderBy(xxhash64(col(idCol)).asc, col(idCol).asc)
      .limit(math.max(trainSampleCap, kCodes))
      .select("__v").collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "PQ training needs a non-empty corpus")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val sub = d / m

    Array.tabulate(m) { s =>
      val xs = sample.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
      // seeds: first kCodes DISTINCT subvectors in sample order (pad by
      // cycling when the subspace has fewer distinct points)
      val distinct = scala.collection.mutable.LinkedHashSet.empty[Seq[Float]]
      xs.iterator.takeWhile(_ => distinct.size < kCodes)
        .foreach(x => distinct += x.toSeq)
      val seeds = distinct.toArray
      var cents = Array.tabulate(kCodes)(i => seeds(i % seeds.length).toArray)

      for (_ <- 0 until iters) {
        val sums = Array.fill(kCodes)(new Array[Double](sub))
        val counts = new Array[Long](kCodes)
        xs.foreach { x =>
          val c = nearest(cents, x)
          counts(c) += 1
          var j = 0
          while (j < sub) { sums(c)(j) += x(j); j += 1 }
        }
        cents = Array.tabulate(kCodes)(c =>
          if (counts(c) == 0) cents(c) // empty cell keeps its seed
          else Array.tabulate(sub)(j => (sums(c)(j) / counts(c)).toFloat))
      }
      cents
    }
  }

  private def nearest(cents: Array[Array[Float]], x: Array[Float]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      var dist = 0.0; var j = 0
      val ct = cents(c)
      while (j < x.length) { val t = x(j) - ct(j); dist += t * t; j += 1 }
      if (dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    best
  }

  // float-rounded like the encode UDF's (e / n).toFloat, so training
  // and encoding see identical subvectors; same 1e-30 zero-vector
  // floor as the UDFs — train and encode must see the SAME values
  private def normalized(v: Column): Column =
    transform(v, x =>
      (x / greatest(Similarity.l2Norm(v), lit(1e-30))).cast("float"))

  /** One distributed pass: `(idCol, codes array<int>)` — the vector's
    * m nearest-centroid ids over the NORMALIZED vector (cosine
    * contract). Codebooks ship as a broadcast-sized closure literal.
    */
  def encode(corpus: DataFrame, codebooks: Array[Array[Array[Float]]],
      idCol: String = "vec_id", vecCol: String = "embedding",
      normalizeInput: Boolean = true): DataFrame = {
    val m = codebooks.length
    val enc = udf { (v: Seq[Float]) =>
      val x = if (normalizeInput) {
        val n = math.max(math.sqrt(v.iterator.map(x => x.toDouble * x).sum), 1e-30)
        v.toArray.map(e => (e / n).toFloat)
      } else v.toArray
      val sub = x.length / m
      Array.tabulate(m)(s =>
        nearest(codebooks(s), java.util.Arrays.copyOfRange(x, s * sub, (s + 1) * sub)))
    }
    corpus.select(col(idCol), enc(col(vecCol)).as("codes"))
  }

  /** ADC + exact-rescore top-k (cosine). The scan side reads only the
    * code arrays; queries broadcast WITH their per-(subspace, code)
    * dot-product tables; candidates (`rescoreFactor·k` per query, via
    * the bounded map-side top-k aggregate) rescore with the exact
    * float kernel — the [[Similarity.bruteForceTopKInt8]] two-regime
    * shape, one further memory-bandwidth octave down.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, kCodes: Int = 16, rescoreFactor: Int = 10,
      iters: Int = 5, trainSampleCap: Int = 1 << 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    val cb = trainCodebooks(corpus, m, kCodes, idCol, vecCol, iters, trainSampleCap)
    val codes = encode(corpus, cb, idCol, vecCol)
    pqTopKEncoded(codes, corpus, queries, cb, k, rescoreFactor,
      idCol, vecCol, qIdCol, qVecCol)
  }

  /** Search over PRE-ENCODED codes — the serving/ingest posture (train
    * once, store codes, search forever): the scan side never touches
    * the float vectors except for the bounded candidate rescore.
    */
  def pqTopKEncoded(codes: DataFrame, corpus: DataFrame, queries: DataFrame,
      cb: Array[Array[Array[Float]]], k: Int, rescoreFactor: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    val kCodes = cb.head.length
    val qt = queryTables(queries, cb, qIdCol, qVecCol)
    val scored = codes.join(broadcast(qt))
      .select(col(qIdCol), col(idCol),
        graft.functions.PqAdcExpr.pqAdc(col("codes"), col("__tbl"), kCodes)
          .as("score"))
    val cands = Similarity.perQueryTopK(scored, rescoreFactor * k, qIdCol, idCol)
      .select(col(qIdCol), col(idCol))
    rescoreExact(corpus, cands, queries, k, idCol, vecCol, qIdCol, qVecCol)
  }

  /** `(qIdCol, __tbl)` — per-query ADC tables,
    * `__tbl[s·kCodes + c] = dot(q̂_s, centroid_sc)`, broadcast-sized.
    */
  private[operators] def queryTables(queries: DataFrame,
      cb: Array[Array[Array[Float]]],
      qIdCol: String, qVecCol: String): DataFrame = {
    val m = cb.length
    val kCodes = cb.head.length
    val tableOf = udf { (qv: Seq[Float]) =>
      val n = math.max(math.sqrt(qv.iterator.map(x => x.toDouble * x).sum), 1e-30)
      val q = qv.toArray.map(e => (e / n).toFloat)
      val sub = q.length / m
      val t = new Array[Float](m * kCodes)
      var s = 0
      while (s < m) {
        var c = 0
        while (c < kCodes) {
          var dot = 0.0; var j = 0
          while (j < sub) { dot += q(s * sub + j) * cb(s)(c)(j); j += 1 }
          t(s * kCodes + c) = dot.toFloat
          c += 1
        }
        s += 1
      }
      t
    }
    queries.select(col(qIdCol), tableOf(col(qVecCol)).as("__tbl"))
  }

  /** Exact cosine over the candidate pairs only (broadcast pair list +
    * broadcast queries; one map-side pass over the corpus) — identical
    * scoring to [[Similarity.bruteForceTopK]].
    */
  private[operators] def rescoreExact(corpus: DataFrame, cands: DataFrame,
      queries: DataFrame, k: Int,
      idCol: String, vecCol: String,
      qIdCol: String, qVecCol: String): DataFrame = {
    val exact = corpus
      .join(broadcast(cands), Seq(idCol))
      .join(broadcast(queries.select(col(qIdCol), col(qVecCol))), Seq(qIdCol))
      .select(col(qIdCol), col(idCol),
        (Similarity.dot(col(vecCol), col(qVecCol)) /
          (Similarity.l2Norm(col(vecCol)) * Similarity.l2Norm(col(qVecCol))))
          .as("score"))
    Similarity.perQueryTopK(exact, k, qIdCol, idCol)
  }
}
