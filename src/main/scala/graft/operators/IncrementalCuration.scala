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
  private def forgetDir(root: String) = s"$root/forget"
  private def configPath(root: String) = s"$root/pipeline.json"
  private def offsetPath(root: String) = s"$root/version_offset"

  /** Cumulative shift between CALLER refresh-version numbers and log
    * slots. Two out-of-band operations consume log slots the caller's
    * sequence doesn't know about — [[purgeForgotten]]'s compaction
    * folds into slot vmax+1, and [[forget]] allocates its own slot
    * above everything used — and either one used to wedge a
    * batchId-sequenced caller ([[graft.streaming.StreamingCuration]]
    * versions each micro-batch as batchId+1) permanently on the slot
    * guards, with no checkpoint-compatible recovery. Each such
    * operation therefore bumps this persisted offset by one, and
    * [[refresh]] resolves `slot = version + offset`, so a caller's
    * monotone version sequence keeps working across forgets and
    * purges without renumbering. Zero (no file) when neither ever ran
    * — the common case reads one FS existence probe. Bumps happen
    * only in maintenance windows at committed checkpoints (documented
    * on [[purgeForgotten]]/[[forget]]): a bump while a refresh sits
    * UNCOMMITTED in a streaming checkpoint would shift that batch's
    * replay onto the wrong slot.
    */
  private[graft] def versionOffset(spark: SparkSession, root: String): Long = {
    val path = new Path(offsetPath(root))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) 0L
    else {
      val in = fs.open(path)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  private def writeVersionOffset(spark: SparkSession, root: String,
      off: Long): Unit = {
    val path = new Path(offsetPath(root))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(off.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** One-time batch pass: run the pipeline over the initial corpus,
    * persist the curated result as merge-log version 0 plus the
    * near-dup index over every stage entrant. Returns the curated
    * snapshot.
    */
  /** Writer-lease wrap for every lineage MUTATION
    * (bootstrap/refresh/forget/purge): the curation state's documented
    * single-writer assumption, enforced cross-process the same way as
    * the incremental feature stores ([[WriterLease]]). Reads
    * (snapshot/preview) hold no lock.
    */
  private def locked[A](spark: SparkSession, root: String)(f: => A): A =
    WriterLease.withLease(spark, root, WriterLease.ownerOf(spark))(f)

  def bootstrap(corpus: DataFrame, pipeline: CurationPipeline, root: String,
      reference: Option[(DataFrame, String, String)] = None): DataFrame =
    locked(corpus.sparkSession, root) {
      bootstrapLocked(corpus, pipeline, root, reference)
    }

  private def bootstrapLocked(corpus: DataFrame, pipeline: CurationPipeline,
      root: String,
      reference: Option[(DataFrame, String, String)]): DataFrame = {
    val spark = corpus.sparkSession
    val (pre, nd, post) = splitStages(pipeline)
    val maxRow = corpus.agg(max(col(pipeline.idCol).cast("long"))).head()
    require(!maxRow.isNullAt(0),
      "bootstrap called with an empty corpus — there is no high-water " +
        "mark to anchor incremental admission on")
    val maxId = maxRow.getLong(0)
    writeConfig(spark, root, pipeline)
    // persisted, not spilled: the entrants feed the index build (two
    // concurrent scans), the loser anti-join, and the log append — a
    // spill would pay a dedicated full-text write job up front, while
    // the cache materializes inside the first consumer's action and
    // the rest read memory/disk blocks (the r14 barrier-count lever)
    val entrants = runStages(corpus, pre, pipeline, reference).persist()
    try {
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
    } finally entrants.unpersist()
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
      reference: Option[(DataFrame, String, String)] = None): DataFrame =
    locked(delta.sparkSession, root) {
      refreshLocked(delta, root, version, reference)
    }

  private def refreshLocked(delta: DataFrame, root: String, version: Long,
      reference: Option[(DataFrame, String, String)]): DataFrame = {
    val spark = delta.sparkSession
    val pipeline = readConfig(spark, root)
    val (pre, nd, post) = splitStages(pipeline)
    require(version > 0L, s"refresh versions start at 1 (0 is the bootstrap)")
    // caller versions are resolved through the purge offset so a
    // batchId-sequenced stream survives a purge's compaction fold
    // (see [[versionOffset]]); all state below is keyed by `slot`
    val slot = version + versionOffset(spark, root)

    // the high-water mark is read over versions STRICTLY BEFORE this
    // one, so a crash-replay of the same version validates against the
    // same prior state instead of tripping over its own first attempt
    val priorMax = readMetaBefore(spark, root, slot)
    // the caller's delta plan is arbitrary (and often expensive —
    // unions, normalization expressions); without a cache it would be
    // fully evaluated twice, once by the bounds aggregate and again
    // materializing the entrants. Deltas are O(delta)-bounded by the
    // incremental contract, so caching one is always safe
    val deltaC = delta.persist()
    try {
    // min/max drive the monotone-id checks; the count rides the same
    // job and spares the admission decision its own sizing action
    val bounds = deltaC.agg(
      min(col(pipeline.idCol).cast("long")),
      max(col(pipeline.idCol).cast("long")),
      count(lit(1))).head()
    require(!bounds.isNullAt(0), s"refresh called with an empty delta")
    val (dMin, dMax, dRows) =
      (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
    require(dMin > priorMax,
      s"delta id $dMin <= already-ingested max id $priorMax: incremental " +
        "admission is id-ordered (batch equivalence needs monotone ids); " +
        "assign fresh ids above the high-water mark")
    // version-rewrite tripwire: a GENUINE crash replay re-presents the
    // same delta, so the recorded high-water for this version matches;
    // a mismatch means a different delta is claiming an already-written
    // version — the fresh-checkpoint-against-a-used-state-dir mistake —
    // and overwriting history with it must fail loudly
    val recordedMeta = metaFor(spark, root, slot) // one read, two guards
    recordedMeta.foreach(recorded =>
      require(recorded == math.max(priorMax, dMax),
        s"version $version (slot $slot) of the curation state at $root " +
          s"was already written with a different delta (recorded " +
          s"high-water $recorded, this delta's " +
          s"${math.max(priorMax, dMax)}); a replay must re-present the " +
          "same data — if this is a new stream, resume its checkpoint " +
          "instead of starting a fresh one"))
    // a log partition with NO meta row is a compaction fold (e.g. from
    // purgeForgotten) — a refresh claiming that slot would silently
    // overwrite the folded base. With the purge offset this only
    // happens when a purge ran BETWEEN a refresh and its checkpoint
    // commit (the replay then lands on the fold of its own first
    // attempt) — purge in a maintenance window with the stream stopped
    // at a committed checkpoint.
    require(recordedMeta.isDefined ||
      !MergeLog.versions(spark, logDir(root)).contains(slot),
      s"log slot $slot at $root is a compaction fold, not a refresh " +
        s"slot; a purge interleaved with an uncommitted refresh of " +
        s"version $version — restore the checkpoint to the purge " +
        "boundary, or continue above MergeLog.nextVersion")

    // persisted, not spilled (the bootstrap's rationale): consumed by
    // the admission decision, the shingle append, and the log append
    val entrants = runStages(deltaC, pre, pipeline, reference).persist()
    try {
      nd match {
        case Some(NearDupDrop(threshold, _)) =>
          // one-pass decision, then OVERLAPPED appends: the decision is
          // materialized first (a lazy plan evaluated after the append
          // would find every delta doc matching itself), after which
          // the band/shingle appends and the merge-log version write
          // touch independent dirs and run concurrently — three
          // sequential write barriers become one. Entrants forgotten by
          // a version STRICTLY before this one are excluded from the
          // decision (strictly: a crash-replay of this version must see
          // the same exclusion set its first attempt saw).
          val (losers0, dBands) = NearDupIndex.admitDecide(spark,
            indexDir(root), entrants, pipeline.textCol, pipeline.idCol,
            threshold, exclude = forgottenBefore(spark, root, slot),
            deltaRowsHint = Some(dRows))
          val losers = losers0.select(col("id").as(pipeline.idCol))
          val admitted = entrants.join(losers, Seq(pipeline.idCol), "left_anti")
          val curated = runStages(admitted, post, pipeline, reference)
          Par.run(
            () => NearDupIndex.admitAppend(spark, indexDir(root), entrants,
              dBands, pipeline.textCol, pipeline.idCol),
            () => MergeLog.append(curated, logDir(root), slot,
              Seq(pipeline.idCol)))
        case None =>
          val curated = runStages(entrants, post, pipeline, reference)
          MergeLog.append(curated, logDir(root), slot, Seq(pipeline.idCol))
      }
      writeMeta(spark, root, slot, math.max(priorMax, dMax))
    } finally entrants.unpersist()
    } finally deltaC.unpersist()
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
    val b = delta.agg(min(col(pipeline.idCol).cast("long")), count(lit(1))).head()
    require(!b.isNullAt(0), "previewRefresh called with an empty delta")
    require(b.getLong(0) > priorMax,
      s"delta id ${b.getLong(0)} <= already-ingested max id $priorMax: " +
        "incremental admission is id-ordered; assign fresh ids above " +
        "the high-water mark")
    val id = pipeline.idCol
    val parts = scala.collection.mutable.ListBuffer.empty[DataFrame]
    // two spills carry the whole preview: the delta (cuts the caller's
    // lineage — every later frame scans flat parquet) and the audit
    // (consumed by three downstream legs). The kept-semi-join /
    // loser-anti-join stages stay LAZY — they re-scan those two spills
    // inside the final union's single action instead of paying a
    // materialization job each (the r13 job-count finding).
    var cur = Spill.roundTrip(delta.select(col(id), col(pipeline.textCol)))
    if (pre.nonEmpty) {
      // pre is a PREFIX of the pipeline, so the audit's stage indices
      // are already absolute
      val aud = Spill.roundTrip(
        CurationPipeline(pipeline.textCol, id, pre).audit(cur, reference))
      parts += aud.where(col("disposition") =!= "kept")
      cur = cur.join(aud.where(col("disposition") === "kept").select(id),
        Seq(id), "left_semi")
    }
    nd.foreach { n =>
      // previewLosers returns an already-spilled frame; the disposition
      // tag rides on top lazily
      val losers =
        NearDupIndex.previewLosers(spark, indexDir(root), cur,
          pipeline.textCol, id, n.threshold,
          exclude = forgottenBefore(spark, root, Long.MaxValue),
          deltaRowsHint = Some(b.getLong(1)))
          .select(col("id").as(id))
          .withColumn("disposition", lit(s"${pre.length}:near_dup_drop"))
      parts += losers
      cur = cur.join(losers.select(id), Seq(id), "left_anti")
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

  /** Right-to-be-forgotten, step 1 (logical — takes effect
    * immediately): record `ids` as forgotten at `version`, append
    * matching TOMBSTONES to the merge log (the snapshot stops serving
    * them the moment this returns), and exclude them from every
    * subsequent refresh's admission decision — a post-forget delta
    * twin of a forgotten document is ADMITTED, because the forgotten
    * content may no longer influence any output. Cost is O(|ids|):
    * no corpus scan, no index touch.
    *
    * Deliberately NOT re-adjudicated: documents dropped in the past
    * because they matched a now-forgotten entrant stay dropped —
    * admission history is an ordered fact, and re-admitting would
    * rewrite already-published corpus versions (the same reason
    * [[MergeLog.snapshotAsOf]] refuses rebased history). The forget
    * list itself retains only the ids (needed as the erasure
    * work-list) — never content.
    *
    * Step 2, [[purgeForgotten]], physically erases the content from
    * the index and log in a maintenance window.
    */
  def forget(ids: DataFrame, root: String, version: Long): Unit =
    locked(ids.sparkSession, root) { forgetLocked(ids, root, version) }

  private def forgetLocked(ids: DataFrame, root: String,
      version: Long): Unit = {
    val spark = ids.sparkSession
    val pipeline = readConfig(spark, root)
    require(version > 0L, "forget versions start at 1 (0 is the bootstrap)")
    // Forgets live in their OWN version sequence (`version` is the
    // forget's replay identity, e.g. a GDPR-request counter), not the
    // caller's refresh sequence: a forget consuming refresh-slot N
    // would collide with the next micro-batch of a batchId-sequenced
    // stream (the same wedge class as purge's compaction fold). The
    // slot is allocated ABOVE everything used — log versions, meta
    // slots, AND other forgets' marker-claimed slots (a crashed
    // forget's slot must never be handed to a different forget: its
    // replay would overwrite the other's work-list and tombstones,
    // silently losing an erasure) — pinned by a marker for replay
    // idempotence, with the refresh offset bumped so future caller
    // versions skip over it. Order is bump → marker → data (the
    // purge's bump-first discipline): a crash between bump and marker
    // costs a harmless skipped slot or two (the replay re-allocates
    // above the already-bumped offset, skipping the crashed slot AND
    // the one the bump reserved); a bump-last order would lose
    // the bump forever on a crash (the replay takes the marker-exists
    // branch, which never bumps) and wedge the stream's next refresh
    // on this slot's meta tripwire. Run forgets in a maintenance
    // window at a committed checkpoint, and re-run after a crash
    // (erasure needs verification anyway).
    val markerP = new Path(s"${forgetDir(root)}/_slot_of_$version")
    val fs = markerP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val slot = if (fs.exists(markerP)) {
      val in = fs.open(markerP)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    } else {
      val s = (MergeLog.versions(spark, logDir(root)) ++
        metaVersions(spark, root) ++ forgetMarkerSlots(spark, root)).max + 1
      writeVersionOffset(spark, root, versionOffset(spark, root) + 1)
      val out = fs.create(markerP, true)
      try out.write(s.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      s
    }
    val priorMax = readMetaBefore(spark, root, slot)
    // rewrite tripwire: a replayed forget re-records the unchanged
    // high-water; anything else claiming the marker's slot is a
    // single-writer violation and must not be overwritten
    metaFor(spark, root, slot).foreach(recorded =>
      require(recorded == priorMax,
        s"forget $version's slot $slot at $root was already written " +
          s"with a different high-water ($recorded vs $priorMax) — a " +
          "concurrent writer claimed the slot; verify the lineage"))
    val fl = ids.select(col(ids.columns.head).cast("long").as("id")).distinct()
    // tombstones must carry the log's exact schema (MergeLog pins it);
    // every non-key column rides as a typed null — the tombstone is
    // pure key + death marker, no content. snapshotSchema reads ONE
    // parquet footer; the full snapshot analysis here cost ~1/3 of the
    // whole forget call (r12 verdict's q_curate_forget trim)
    val logSchema = MergeLog.snapshotSchema(spark, logDir(root))
    val tombstones = fl.select(
      logSchema.fields.map(f =>
        if (f.name == pipeline.idCol) col("id").cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)).toSeq :+
        lit(true).as("__forget_dead"): _*)
    // the work-list write and the tombstone append touch independent
    // dirs (forget/ vs log/) and both derive from the tiny distinct-id
    // frame — overlapped, the refresh path's barrier discipline
    Par.run(
      () => fl.coalesce(1).write.mode("overwrite")
        .parquet(s"${forgetDir(root)}/__v=$slot"),
      () => MergeLog.append(tombstones, logDir(root), slot,
        Seq(pipeline.idCol), tombstoneCol = Some("__forget_dead")))
    writeMeta(spark, root, slot, priorMax)
  }

  /** Convenience overload for the bounded GDPR-request shape. */
  def forget(spark: SparkSession, ids: Seq[Long], root: String,
      version: Long): Unit = {
    import spark.implicits._
    forget(ids.toDF("id"), root, version)
  }

  /** Right-to-be-forgotten, step 2 (physical): rewrite the near-dup
    * store without the forgotten entrants' band/shingle rows
    * ([[NearDupIndex.purge]], crash-safe swap) and compact the merge
    * log — the fold keeps each forgotten key only as its tombstone
    * row (typed nulls, no content) and deletes the partitions that
    * held the original text. One linear pass over index + log,
    * independent of how many forgets accumulated; run it on the
    * erasure deadline, not per request.
    */
  def purgeForgotten(spark: SparkSession, root: String): Unit =
    locked(spark, root) {
    val pipeline = readConfig(spark, root)
    forgottenBefore(spark, root, Long.MaxValue).foreach { ids =>
      // the index purge and the log compaction touch independent state
      // (band/shingle dirs vs log partitions) — overlapped. Within the
      // log leg the lineage offset is bumped FIRST: the compact folds
      // into slot vmax+1, exactly the slot the caller's NEXT sequential
      // version resolves to (bump-then-compact is the crash-safe order:
      // a crash in the gap costs one skipped slot, harmless under the
      // strictly-before meta reads; compact-then-crash would leave the
      // next refresh pointing at the fold)
      Par.run(
        () => NearDupIndex.purge(spark, indexDir(root), ids),
        () => {
          writeVersionOffset(spark, root, versionOffset(spark, root) + 1)
          MergeLog.compact(spark, logDir(root), Seq(pipeline.idCol))
        })
    }
  }

  /** Union of forget-list versions strictly before `version`; None if
    * nothing was ever forgotten (the common case — admission pays no
    * read). */
  private def forgottenBefore(spark: SparkSession, root: String,
      version: Long): Option[DataFrame] = {
    val p = new Path(forgetDir(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a forget that crashed between its slot marker and its data write
    // leaves the dir existing with only underscore-hidden marker files
    // — no `__v=` partitions — and a bare parquet read of it fails
    // schema inference far from the cause; such a dir holds nothing
    // forgotten yet
    if (!fs.exists(p) || !fs.listStatus(p)
        .exists(s => s.isDirectory && s.getPath.getName.startsWith("__v=")))
      None
    else Some(spark.read.option("basePath", forgetDir(root))
      .parquet(forgetDir(root))
      .where(col("__v") < version)
      .select("id").distinct())
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
    * LONG per version, written as a plain text file on the DRIVER
    * (create-overwrite = replay-idempotent, the [[MergeLog.append]]
    * discipline): the lifecycle reads meta 2-3 times per phase, and a
    * one-row-per-version bookkeeping table has no business costing a
    * Spark job per read — at tiny per-job fixed overhead × a
    * bootstrap+refresh+forget+purge chain, the meta jobs alone were a
    * measurable slice of the refresh wall (r13 verdict's job-count
    * finding). Listing cost is O(versions), driver-side, trivial
    * against nightly-refresh version counts.
    */
  private def writeMeta(spark: SparkSession, root: String, version: Long,
      maxId: Long): Unit = {
    val p = new Path(s"${metaDir(root)}/v_$version")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(maxId.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Slots claimed by forget markers — including those of CRASHED
    * forgets that never wrote data (they appear in no log/meta
    * listing, but their replay will write to the claimed slot).
    */
  private def forgetMarkerSlots(spark: SparkSession,
      root: String): Seq[Long] = {
    val p = new Path(forgetDir(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("_slot_of_"))
      .map { s =>
        val in = fs.open(s.getPath)
        try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong
        finally in.close()
      }
  }

  /** All meta rows as (version, maxId) — one driver-side listing, no
    * Spark jobs for the current text format. Lineages written before
    * r14 carried meta as one-row `__v=<version>` parquet partitions;
    * those are still read (a one-row parquet head per legacy version,
    * paid only when such dirs exist) so an existing state dir keeps
    * working across the format change.
    */
  private def readAllMeta(spark: SparkSession, root: String): Seq[(Long, Long)] = {
    val p = new Path(metaDir(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.flatMap { s =>
      val name = s.getPath.getName
      if (s.isFile && name.startsWith("v_")) {
        val in = fs.open(s.getPath)
        val v = try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong
          finally in.close()
        Some((name.stripPrefix("v_").toLong, v))
      } else if (s.isDirectory && name.startsWith("__v=")) {
        Some((name.stripPrefix("__v=").toLong,
          spark.read.parquet(s.getPath.toString).head().getLong(0)))
      } else None
    }
  }

  /** Slots holding a meta row — with the log versions, the "everything
    * used" set [[forget]]'s slot allocation must clear.
    */
  private def metaVersions(spark: SparkSession, root: String): Seq[Long] =
    readAllMeta(spark, root).map(_._1)

  private def metaFor(spark: SparkSession, root: String,
      version: Long): Option[Long] =
    readAllMeta(spark, root).collectFirst { case (`version`, m) => m }

  private def readMetaBefore(spark: SparkSession, root: String,
      version: Long): Long = {
    val prior = readAllMeta(spark, root).collect { case (v, m) if v < version => m }
    require(prior.nonEmpty,
      s"no curation state before version $version at $root — bootstrap " +
        "first (version 0), then refresh in increasing version order")
    prior.max
  }
}
