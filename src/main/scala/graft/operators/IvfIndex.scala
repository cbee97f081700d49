package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the SERVING shape for ANN at corpus scale
  * (reference behavior: feature stores materialize once and serve many
  * queries; `ivfTopK` re-trains and re-assigns on every call, which is
  * the right shape for one-shot analytics and the wrong one for a
  * query service).
  *
  * Layout under `path`:
  *  - `centroids/` — `(cell_id int, centroid array<float>)`, tiny.
  *  - `vectors/`   — `(id, vector, __vn, cell_id)` written
  *    `partitionBy("cell_id")`: a probe touching `nProbe` of `nCells`
  *    cells reads ONLY those directories — Spark's partition pruning
  *    turns the cell filter into skipped files, so a 20-query batch
  *    over a 4096-cell index scans ~(distinct probed cells)/4096 of
  *    the corpus instead of all of it. This is the property that makes
  *    IVF an INDEX at 100 TB rather than a full-scan with extra steps.
  *
  * Determinism: training/assignment are [[Similarity.ivfTopK]]'s
  * (bounded deterministic driver-side k-means, one distributed
  * assignment pass), so `build` + `query` returns exactly what
  * `ivfTopK` with the same configuration returns — the equivalence is
  * asserted in tests, not just claimed.
  */
object IvfIndex {

  /** Train centroids, assign every corpus row to its nearest cell, and
    * write the index. One corpus-sized shuffle (the assignment fold) +
    * one write; the partitioned layout costs nothing extra — the
    * assignment already grouped rows by cell.
    */
  def build(
      corpus: DataFrame, path: String,
      nCells: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      kmeansIters: Int = 0, kmeansTol: Double = 1e-6,
      trainSampleCap: Int = 1 << 16): Unit = {
    val centroids = Similarity.trainCentroids(corpus, nCells, idCol, vecCol,
      kmeansIters, kmeansTol, trainSampleCap)
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    Similarity.assignCells(corpus, centroids, idCol, vecCol)
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$path/vectors")
  }

  /** Incrementally index new vectors: assign them to the EXISTING
    * centroids and append to the partitioned layout — the daily-delta
    * shape (a full rebuild re-reads the whole corpus; an append reads
    * only the delta). Centroids are NOT re-trained, so cell balance
    * degrades if the data distribution drifts from what trained them —
    * standard IVF practice is to rebuild when the per-cell population
    * skew (or recall against a sampled exact baseline) crosses a
    * threshold. Appending an id that is already indexed creates a
    * duplicate: dedupe deltas upstream (the exact-dedup operator) —
    * the index is a layout, not a key-value store.
    */
  def append(
      corpus: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val centroids = corpus.sparkSession.read.parquet(s"$path/centroids")
    Similarity.assignCells(corpus, centroids, idCol, vecCol)
      .write.mode("append").partitionBy("cell_id")
      .parquet(s"$path/vectors")
  }

  /** Top-k over a persisted index. The probed cell set (bounded:
    * ≤ min(|queries| · nProbe, nCells) values) is collected and planted
    * as a PARTITION filter on the vectors scan — `.explain` shows it
    * under PartitionFilters, and only the probed cells' files are read.
    * The per-query cell routing then happens in the (pruned) join.
    */
  def query(
      spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val probed = Similarity.probeCells(queries, centroids, nProbe, qIdCol, qVecCol)
    // bounded driver materialization (≤ nCells ints) — the price of a
    // literal partition filter the scan can prune on; an id-join alone
    // would read every cell directory
    val cells = probed.select("cell_id").distinct().collect().map(_.getInt(0))
    val vectors = spark.read.parquet(s"$path/vectors")
      .where(col("cell_id").isin(cells.map(c => c: Any): _*))
    Similarity.scoreProbed(vectors, probed, k, idCol, vecCol, qIdCol, qVecCol)
  }

  /** The distinct cells a query batch would touch — the introspection
    * behind [[query]]'s partition filter, exposed for capacity
    * planning ("what fraction of the index does this batch read?") and
    * for the scale probe's ground-truth pruning measurement.
    */
  def probedCells(
      spark: SparkSession, path: String, queries: DataFrame, nProbe: Int,
      qIdCol: String = "q_id", qVecCol: String = "q_vec"): Seq[Int] = {
    val centroids = spark.read.parquet(s"$path/centroids")
    Similarity.probeCells(queries, centroids, nProbe, qIdCol, qVecCol)
      .select("cell_id").distinct().collect().map(_.getInt(0)).toSeq.sorted
  }
}
