package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** An incrementally-maintained IVF-PQ index — [[IvfPqIndex]]'s serving
  * shape over a vector corpus that GROWS (nightly embedding runs) and
  * FORGETS (GDPR) without rebuilding. The FAISS `add()` contract: the
  * quantizers (IVF centroids + PQ codebooks) are TRAINED ONCE at
  * [[build]] and frozen — new vectors are assigned to the nearest
  * existing cell and encoded against the existing codebooks
  * ([[IvfPqIndex.encodeAssign]], the build pass's exact arithmetic),
  * appended as one version partition per ingest. Queries are the
  * static index's one code path ([[IvfPqIndex.queryVectors]]): probe →
  * partition-pruned ADC → bounded exact rescore — `cell_id` remains a
  * partition column inside every version, so pruning survives
  * maintenance.
  *
  * Honest drift caveat: frozen quantizers quantize a DRIFTED
  * distribution progressively worse (recall decays as new vectors fall
  * between trained centroids) — the remedy is a periodic re-[[build]]
  * from the served corpus, exactly as FAISS re-trains. Compaction here
  * folds the version tail (codes stay valid — they were computed
  * against the frozen codebooks); it never re-trains silently.
  *
  * Lifecycle discipline shared with [[IncrementalBm25]]: append-only
  * monotone ids with a driver-side high-water meta (replay idempotent,
  * imposter deltas refused), [[queryAsOf]] version truncation with the
  * rebased-fold refusal, [[forgetVectors]] as one anti-join fold.
  */
object IncrementalIvfPq {
  import IncrementalSwa.{VCol, FoldPrefix}

  private def vecDir(root: String) = s"$root/vectors"
  private def metaDir(root: String) = s"$root/hwm"

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readAllMeta(spark: SparkSession, root: String): Seq[(Long, Long)] = {
    val p = new Path(metaDir(root))
    val f = fs(spark, metaDir(root))
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.collect {
      case s if s.isFile && s.getPath.getName.startsWith("v_") =>
        val in = f.open(s.getPath)
        val m = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
          .trim.toLong
        finally in.close()
        (s.getPath.getName.stripPrefix("v_").toLong, m)
    }
  }

  private def writeMeta(spark: SparkSession, root: String, version: Long,
      maxId: Long): Unit = {
    val p = new Path(s"${metaDir(root)}/v_$version")
    val out = fs(spark, metaDir(root)).create(p, true)
    try out.write(maxId.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Train the quantizers over `initial` (the [[IvfPqIndex.build]]
    * training pass, writing `centroids/`, `codebooks/`, `meta/` under
    * `root`) and ingest it as version 0.
    */
  def build(initial: DataFrame, root: String, nCells: Int, m: Int = 8,
      kCodes: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding", kmeansIters: Int = 3, pqIters: Int = 5,
      trainSampleCap: Int = 1 << 16): Unit = {
    // the static build already trains the quantizers and encodes the
    // initial corpus; its flat vectors/ dir becomes the versioned
    // store's version 0 by RENAME (parquet files are self-contained —
    // re-encoding the initial corpus a second time would double the
    // build's dominant cost)
    val spark = initial.sparkSession
    IvfPqIndex.build(initial, root, nCells, m, kCodes, idCol, vecCol,
      kmeansIters, pqIters, trainSampleCap)
    val f = fs(spark, root)
    val tmp = new Path(s"$root/_built_vectors")
    require(f.rename(new Path(vecDir(root)), tmp),
      s"could not stage the built vectors at $root")
    IncrementalSwa.locked(spark, vecDir(root)) {
      val gen = IncrementalSwa.liveGen(spark, vecDir(root))
      require(f.rename(tmp, new Path(s"$gen/$VCol=0")),
        s"could not install the built vectors as version 0 at $root")
      val maxId = initial.agg(max(col(idCol).cast("long"))).head().getLong(0)
      writeMeta(spark, root, 0L, maxId)
    }
  }

  /** Encode one vector delta against the frozen quantizers and append
    * it as `version` — O(delta) (the existing index is never
    * rescanned), `cell_id`-partitioned inside the version so query
    * pruning holds.
    */
  def ingest(delta: DataFrame, root: String, idCol: String = "vec_id",
      vecCol: String = "embedding", version: Long): Unit = {
    val spark = delta.sparkSession
    val missing = Seq(idCol, vecCol).filterNot(delta.columns.contains)
    require(missing.isEmpty, s"delta is missing columns $missing")
    IvfPqIndex.requireEncoding(spark, root)
    IncrementalSwa.locked(spark, vecDir(root)) {
      val folded = IncrementalSwa.foldedThrough(spark, vecDir(root))
      require(version > folded,
        s"version $version is at or below the compaction fold ($folded) at " +
          s"$root — the index cannot replay rebased history")
      val meta = readAllMeta(spark, root)
      val priorMax = meta.collect { case (v, m) if v < version => m }
        .foldLeft(Long.MinValue)(math.max)
      val b = delta.agg(
        min(col(idCol).cast("long")), max(col(idCol).cast("long"))).head()
      require(!b.isNullAt(0), "ingest called with an empty delta")
      val (dMin, dMax) = (b.getLong(0), b.getLong(1))
      require(dMin > priorMax,
        s"delta id $dMin <= already-indexed max id $priorMax: the index " +
          "is append-only over monotone ids; assign fresh ids above the " +
          "high-water mark")
      meta.collectFirst { case (`version`, m) => m }.foreach(recorded =>
        require(recorded == dMax,
          s"version $version of the index at $root was already written " +
            s"with a different delta (recorded high-water $recorded, this " +
            s"delta's $dMax); a replay must re-present the same vectors"))
      val centroids = spark.read.parquet(s"$root/centroids")
      val cb = IvfPqIndex.loadCodebooks(spark, root)
      IvfPqIndex.encodeAssign(delta, centroids, cb, idCol, vecCol)
        .write.mode("overwrite").partitionBy("cell_id")
        .parquet(s"${IncrementalSwa.liveGen(spark, vecDir(root))}/$VCol=$version")
      writeMeta(spark, root, version, dMax)
    }
  }

  /** Top-k over the maintained index — the static index's one query
    * path over the live generation.
    */
  def query(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nProbe: Int, rescoreFactor: Int = 20,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame =
    IvfPqIndex.queryVectors(spark, root,
      spark.read.parquet(
        IncrementalSwa.requireLiveGen(spark, vecDir(root))),
      queries, k, nProbe, rescoreFactor, idCol, vecCol, qIdCol, qVecCol)

  /** [[query]] as the index stood at `asOfVersion` — time travel with
    * the shared rebased-history refusal.
    */
  def queryAsOf(spark: SparkSession, root: String, queries: DataFrame,
      asOfVersion: Long, k: Int, nProbe: Int, rescoreFactor: Int = 20,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    val folded = IncrementalSwa.foldedThrough(spark, vecDir(root))
    require(folded < 0 || asOfVersion >= folded,
      s"version $asOfVersion predates the compaction fold ($folded) at " +
        s"$root — that history was rebased; serving the fold instead " +
        "would be a reproducibility lie")
    IvfPqIndex.queryVectors(spark, root,
      spark.read.parquet(
          IncrementalSwa.requireLiveGen(spark, vecDir(root)))
        .where(col(VCol) <= asOfVersion),
      queries, k, nProbe, rescoreFactor, idCol, vecCol, qIdCol, qVecCol)
  }

  /** Fold the version tail into one `cell_id`-partitioned partition —
    * [[IncrementalSwa.compactFold]]'s choreography with the extra
    * partitioning column (codes stay valid: the quantizers are frozen,
    * a fold moves rows, it never re-encodes).
    */
  def compact(spark: SparkSession, root: String): Long =
    foldVectors(spark, root, identity)

  /** GDPR erasure: one anti-join fold removes the vectors — absent
    * from every later query; their ids stay burned for re-ingest.
    */
  def forgetVectors(spark: SparkSession, root: String, ids: DataFrame,
      idCol: String = "vec_id"): Long = {
    val keys = ids.select(col(ids.columns.head).cast("long").as(idCol))
    foldVectors(spark, root,
      _.join(keys, Seq(idCol), "left_anti"))
  }

  private def foldVectors(spark: SparkSession, root: String,
      f: DataFrame => DataFrame): Long =
    IncrementalSwa.locked(spark, vecDir(root)) {
      val dir = vecDir(root)
      val fold = f(spark.read.parquet(
        IncrementalSwa.requireLiveGen(spark, dir)))
      val vs = IncrementalSwa.versions(spark, dir)
      require(vs.nonEmpty, s"index at $root is empty or missing")
      val vmax = vs.max
      Publish.publish(spark, dir) { gen =>
        fold.write.mode("overwrite").partitionBy("cell_id")
          .parquet(s"$gen/$VCol=$vmax")
        fs(spark, gen).create(new Path(s"$gen/$FoldPrefix$vmax"), false)
          .close()
      }
    }
}
