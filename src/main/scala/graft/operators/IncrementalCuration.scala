package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.hadoop.fs.Path

import java.nio.charset.StandardCharsets

/** The O(delta) nightly curation refresh — the production posture of a
  * 100 TB corpus, where re-running the batch funnel over the whole
  * corpus per delta is impossible. Composes the pieces that each exist
  * standalone:
  *
  *  - [[CurationPipeline]] supplies the declarative stage list; its
  *    per-document stages (quality, repetition, PII, domain blocklist,
  *    decontamination against a FIXED reference, hash sampling) apply
  *    to a delta in isolation, so the incremental run pays only
  *    delta-sized work for them;
  *  - [[NearDupIndex]] holds the one cross-corpus stage's state: every
  *    document that ever ENTERED the near-dup stage is banded and
  *    shingled once, so a delta is judged against the full history at
  *    O(delta) join cost (the reference band store streams, the
  *    delta side broadcasts);
  *  - [[MergeLog]] holds the curated corpus itself: each refresh
  *    appends its admitted documents as one version partition —
  *    O(delta) write, idempotent under replay, time-travel readable.
  *
  * The correctness CONTRACT is incremental ≡ batch: bootstrap(base)
  * followed by refresh(delta) must produce exactly the corpus that one
  * batch run of the same pipeline over base ∪ delta produces. That
  * forces the admission-order near-dup semantic
  * ([[Dedup.dropNearDuplicatesOrdered]]: drop iff a smaller-id
  * near-dup EXISTS among stage entrants) together with two pinned
  * invariants, both enforced here:
  *
  *  1. monotone ids — every delta id must exceed every previously
  *     ingested id (checked against persisted state; a violation is an
  *     error, not a silent reorder), since "admission order" and "id
  *     order" must be the same order for batch to reproduce it;
  *  2. entrants are indexed whether or not they were admitted — batch
  *     ordered-drop judges a doc against every smaller entrant, so the
  *     index must too (indexing only survivors would silently admit a
  *     doc whose only match was itself dropped).
  *
  * Stages with corpus-GLOBAL state (TopFraction's histogram cutoff,
  * Mix's domain counts, ParagraphDedup's doc frequencies, the terminal
  * reshapes Shuffle/PackTokens/Split/Chunk) cannot be maintained
  * incrementally and are refused by name at bootstrap — an incremental
  * pipeline that silently recomputed them per-delta would diverge from
  * its batch meaning.
  *
  * The pipeline config is persisted IN the state directory and read
  * back by [[refresh]] (never passed again) — the [[NearDupIndex]]
  * config-pinning posture: a refresh under a drifted config would
  * silently match nothing.
  *
  * Crash/replay posture: the merge-log append is version-overwrite
  * idempotent; a replayed refresh re-appends its band/shingle rows,
  * which duplicates index rows but cannot change any future admission
  * decision (candidates are distinct-ed, verification joins by id).
  * Single writer per state dir, the [[MergeLog]] assumption.
  */
object IncrementalCuration {

  import CurationStage._

  private def logDir(root: String) = s"$root/log"
  private def indexDir(root: String) = s"$root/neardup"
  private def metaDir(root: String) = s"$root/meta"
  private def configPath(root: String) = s"$root/pipeline.json"

  /** One-time batch pass: run the pipeline over the initial corpus,
    * persist the curated result as merge-log version 0 plus the
    * near-dup index over every stage entrant. Returns the curated
    * snapshot.
    */
  def bootstrap(corpus: DataFrame, pipeline: CurationPipeline, root: String,
      reference: Option[(DataFrame, String, String)] = None): DataFrame = {
    val spark = corpus.sparkSession
    val (pre, nd, post) = splitStages(pipeline)
    val maxRow = corpus.agg(max(col(pipeline.idCol).cast("long"))).head()
    require(!maxRow.isNullAt(0),
      "bootstrap called with an empty corpus — there is no high-water " +
        "mark to anchor incremental admission on")
    val maxId = maxRow.getLong(0)
    writeConfig(spark, root, pipeline)
    val entrants = Spill.roundTrip(
      runStages(corpus, pre, pipeline, reference))
    val admitted = nd match {
      case Some(NearDupDrop(threshold, _)) =>
        NearDupIndex.build(entrants, indexDir(root),
          pipeline.textCol, pipeline.idCol)
        // ordered drop FROM the just-built store — the build's
        // signature/shingle passes serve the drop decision too
        // (equality with Dedup.dropNearDuplicatesOrdered is spec-pinned)
        val losers = NearDupIndex.orderedLosers(spark, indexDir(root),
          threshold).select(col("id").as(pipeline.idCol))
        entrants.join(losers, Seq(pipeline.idCol), "left_anti")
      case None => entrants
    }
    val curated = runStages(admitted, post, pipeline, reference)
    MergeLog.append(curated, logDir(root), 0L, Seq(pipeline.idCol))
    writeMeta(spark, root, 0L, maxId)
    snapshot(spark, root)
  }

  /** One O(delta) refresh: per-document stages on the delta alone,
    * near-dup admission against the persisted index plus the delta's
    * own internal pairs, admitted survivors appended to index and log
    * as `version`. Returns the updated curated snapshot. No operation
    * here shuffles or rewrites the existing corpus — the index's
    * reference side streams from disk and the merge log grows by one
    * partition.
    */
  def refresh(delta: DataFrame, root: String, version: Long,
      reference: Option[(DataFrame, String, String)] = None): DataFrame = {
    val spark = delta.sparkSession
    val pipeline = readConfig(spark, root)
    val (pre, nd, post) = splitStages(pipeline)
    require(version > 0L, s"refresh versions start at 1 (0 is the bootstrap)")

    // the high-water mark is read over versions STRICTLY BEFORE this
    // one, so a crash-replay of the same version validates against the
    // same prior state instead of tripping over its own first attempt
    val priorMax = readMetaBefore(spark, root, version)
    val bounds = delta.agg(
      min(col(pipeline.idCol).cast("long")),
      max(col(pipeline.idCol).cast("long"))).head()
    require(!bounds.isNullAt(0), s"refresh called with an empty delta")
    val (dMin, dMax) = (bounds.getLong(0), bounds.getLong(1))
    require(dMin > priorMax,
      s"delta id $dMin <= already-ingested max id $priorMax: incremental " +
        "admission is id-ordered (batch equivalence needs monotone ids); " +
        "assign fresh ids above the high-water mark")
    // version-rewrite tripwire: a GENUINE crash replay re-presents the
    // same delta, so the recorded high-water for this version matches;
    // a mismatch means a different delta is claiming an already-written
    // version — the fresh-checkpoint-against-a-used-state-dir mistake —
    // and overwriting history with it must fail loudly
    metaFor(spark, root, version).foreach(recorded =>
      require(recorded == math.max(priorMax, dMax),
        s"version $version of the curation state at $root was already " +
          s"written with a different delta (recorded high-water " +
          s"$recorded, this delta's ${math.max(priorMax, dMax)}); a " +
          "replay must re-present the same data — if this is a new " +
          "stream, resume its checkpoint instead of starting a fresh one"))

    val entrants = Spill.roundTrip(
      runStages(delta, pre, pipeline, reference))
    val admitted = nd match {
      case Some(NearDupDrop(threshold, _)) =>
        // one-pass decision + append: the delta's bands are computed
        // once and reused; the decision is materialized inside admit
        // before anything lands in the store
        val losers = NearDupIndex.admit(spark, indexDir(root), entrants,
            pipeline.textCol, pipeline.idCol, threshold)
          .select(col("id").as(pipeline.idCol))
        entrants.join(losers, Seq(pipeline.idCol), "left_anti")
      case None => entrants
    }
    val curated = runStages(admitted, post, pipeline, reference)
    MergeLog.append(curated, logDir(root), version, Seq(pipeline.idCol))
    writeMeta(spark, root, version, math.max(priorMax, dMax))
    snapshot(spark, root)
  }

  /** Dry-run disposition report for a WOULD-BE [[refresh]]: every
    * delta document attributed to the first pre-stage that would drop
    * it (`"<idx>:<stageName>"`, absolute pipeline indices), the
    * near-dup admission verdict (`"<idx>:near_dup_drop"`), a
    * post-stage drop, or `"admitted"` — with NO state touched: no
    * index append, no log version, no meta row. The operational "why
    * would tonight's refresh reject this" answer, runnable before
    * committing the nightly version; the admission decision runs
    * through the same code as [[refresh]]
    * ([[NearDupIndex.previewLosers]] shares admit's decision path),
    * so the preview cannot drift from the commit. Validation mirrors
    * refresh's monotone-id check against the current high-water mark.
    */
  def previewRefresh(delta: DataFrame, root: String,
      reference: Option[(DataFrame, String, String)] = None): DataFrame = {
    val spark = delta.sparkSession
    val pipeline = readConfig(spark, root)
    val (pre, nd, post) = splitStages(pipeline)
    val priorMax = readMetaBefore(spark, root, Long.MaxValue)
    val b = delta.agg(min(col(pipeline.idCol).cast("long"))).head()
    require(!b.isNullAt(0), "previewRefresh called with an empty delta")
    require(b.getLong(0) > priorMax,
      s"delta id ${b.getLong(0)} <= already-ingested max id $priorMax: " +
        "incremental admission is id-ordered; assign fresh ids above " +
        "the high-water mark")
    val id = pipeline.idCol
    val parts = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var cur = Spill.roundTrip(delta.select(col(id), col(pipeline.textCol)))
    if (pre.nonEmpty) {
      // pre is a PREFIX of the pipeline, so the audit's stage indices
      // are already absolute
      val aud = Spill.roundTrip(
        CurationPipeline(pipeline.textCol, id, pre).audit(cur, reference))
      parts += aud.where(col("disposition") =!= "kept")
      cur = Spill.roundTrip(
        cur.join(aud.where(col("disposition") === "kept").select(id),
          Seq(id), "left_semi"))
    }
    nd.foreach { n =>
      val losers = Spill.roundTrip(
        NearDupIndex.previewLosers(spark, indexDir(root), cur,
          pipeline.textCol, id, n.threshold)
          .select(col("id").as(id))
          .withColumn("disposition", lit(s"${pre.length}:near_dup_drop")))
      parts += losers
      cur = Spill.roundTrip(
        cur.join(losers.select(id), Seq(id), "left_anti"))
    }
    if (post.nonEmpty) {
      val aud = Spill.roundTrip(
        CurationPipeline(pipeline.textCol, id, post).audit(cur, reference))
      val off = pre.length + nd.size
      val idx = split(col("disposition"), ":", 2)
      parts += aud.where(col("disposition") =!= "kept")
        .withColumn("disposition", concat(
          (idx.getItem(0).cast("int") + off).cast("string"),
          lit(":"), idx.getItem(1)))
      cur = cur.join(aud.where(col("disposition") === "kept").select(id),
        Seq(id), "left_semi")
    }
    val admitted = cur.select(col(id))
      .withColumn("disposition", lit("admitted"))
    (parts :+ admitted).reduce(_ unionByName _)
  }

  /** The curated corpus as of the latest refresh. */
  def snapshot(spark: SparkSession, root: String): DataFrame = {
    val pipeline = readConfig(spark, root)
    MergeLog.snapshot(spark, logDir(root), Seq(pipeline.idCol))
  }

  /** Validate and split the stage list around the (at most one)
    * cross-corpus near-dup stage. */
  private[operators] def splitStages(p: CurationPipeline)
      : (Seq[CurationStage], Option[NearDupDrop], Seq[CurationStage]) = {
    val perDoc: CurationStage => Boolean = {
      case _: Quality | _: Repetition | PiiRedact | _: DomainBlock |
           _: Decontaminate | _: LmCoverage | _: Sample |
           _: SampleWeighted => true
      case _ => false
    }
    val bad = p.stages.filter(st => !perDoc(st) && !st.isInstanceOf[NearDupDrop])
    require(bad.isEmpty,
      s"stages ${bad.map(_.getClass.getSimpleName).distinct.mkString(", ")} " +
        "cannot be maintained incrementally: they carry corpus-global " +
        "state (histogram cutoffs, domain counts, doc frequencies) or " +
        "terminally reshape the corpus; run them as a batch export over " +
        "the incremental snapshot instead")
    val ndIdx = p.stages.zipWithIndex.collect {
      case (_: NearDupDrop, i) => i
    }
    require(ndIdx.size <= 1,
      "at most one NearDupDrop stage can be maintained incrementally " +
        "(one persisted index per state dir)")
    p.stages.collect { case nd: NearDupDrop => nd }.foreach(nd =>
      require(nd.ordered,
        "NearDupDrop(ordered = false) keeps one doc per connected " +
          "CLUSTER — corpus-global state no refresh can maintain (a " +
          "delta doc bridging two clusters would retroactively drop an " +
          "admitted doc); declare NearDupDrop(threshold, ordered = true) " +
          "so the batch and incremental meanings coincide"))
    ndIdx.headOption match {
      case Some(i) =>
        (p.stages.take(i),
          Some(p.stages(i).asInstanceOf[NearDupDrop]), p.stages.drop(i + 1))
      case None => (p.stages, None, Nil)
    }
  }

  private def runStages(df: DataFrame, stages: Seq[CurationStage],
      p: CurationPipeline,
      reference: Option[(DataFrame, String, String)]): DataFrame =
    if (stages.isEmpty) df.select(col(p.idCol), col(p.textCol))
    else CurationPipeline(p.textCol, p.idCol, stages).run(df, reference)

  private def writeConfig(spark: SparkSession, root: String,
      p: CurationPipeline): Unit = {
    val path = new Path(configPath(root))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(CurationPipeline.toJson(p).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readConfig(spark: SparkSession, root: String): CurationPipeline = {
    val path = new Path(configPath(root))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path),
      s"no pipeline config at $path — bootstrap the state dir first")
    val in = fs.open(path)
    val json = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    CurationPipeline.fromJson(json)
  }

  /** High-water mark of ingested ids — the monotonicity witness. One
    * row per version (partition overwrite = replay-idempotent, the
    * [[MergeLog.append]] discipline). */
  private def writeMeta(spark: SparkSession, root: String, version: Long,
      maxId: Long): Unit = {
    import spark.implicits._
    Seq(maxId).toDF("max_ingested_id").coalesce(1)
      .write.mode("overwrite").parquet(s"${metaDir(root)}/__v=$version")
  }

  private def metaFor(spark: SparkSession, root: String,
      version: Long): Option[Long] = {
    val p = new Path(s"${metaDir(root)}/__v=$version")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(p.toString).head().getLong(0))
  }

  private def readMetaBefore(spark: SparkSession, root: String,
      version: Long): Long = {
    val r = spark.read.option("basePath", metaDir(root))
      .parquet(metaDir(root))
      .where(col("__v") < version)
      .agg(max(col("max_ingested_id"))).head()
    require(!r.isNullAt(0),
      s"no curation state before version $version at $root — bootstrap " +
        "first (version 0), then refresh in increasing version order")
    r.getLong(0)
  }
}
