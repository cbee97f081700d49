package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.hadoop.fs.Path

/** Incrementally-maintained sliding-window aggregate state — the
  * production shape of the M1 backfill loop. The step-loop
  * (feathr-rs/src/materialization.rs:200-231) recomputes each step's
  * features FROM RAW EVENTS; at 100 TB a nightly refresh cannot
  * re-shuffle the corpus, so this operator keeps per-(key, bucket)
  * ADDITIVE partial aggregates as a version-partitioned log and pays
  * only O(delta) per ingest:
  *
  *  - [[ingest]] folds ONE delta to (key, bucket) partials — sum on
  *    the exact integer cent grid, count, min, max — and appends them
  *    as `__v=<version>/`. Nothing but the delta is shuffled.
  *  - [[serve]] answers "window aggregates as of boundary T" by
  *    summing partials over the bucket range [T−W, T): SUM/COUNT add
  *    across versions, MIN/MAX fold, AVG = final sum/count. Because
  *    the state is additive, LATE-ARRIVING data needs no special
  *    path: ingest the correction delta as one more version and every
  *    subsequent serve is exact — no read-modify-write, no retraction.
  *  - [[serveAsOf]] truncates the read at a version: the feature-state
  *    time-travel primitive (rerunning backfill step N must see step
  *    N's state, the same contract as [[MergeLog.snapshotAsOf]]).
  *  - [[compact]] folds the version tail into a single partial per
  *    (key, bucket) in a NEW [[Publish]] generation and atomically
  *    flips the pointer. Additive state makes in-place compaction
  *    unsafe in a way latest-wins never is: writing a fold NEXT TO
  *    the versions it folds double-counts every row until the deletes
  *    finish, so the fold must become visible all-or-nothing — which
  *    is exactly the generation-pointer commit. A crash between fold
  *    and flip leaves the old generation live and correct.
  *
  * Serving is defined at bucket boundaries with window = k buckets
  * (the snapshot-generation contract, M2): features are exact with no
  * raw-event edge correction, which is what a daily/hourly
  * materialization serves anyway. Sub-bucket observation times belong
  * to the J3 join path, not the store.
  *
  * Scale posture: ingest shuffles the delta once (map-side-combinable
  * groupBy); state rows are bounded by keys × live buckets after
  * [[compact]], not by event count; partials are written sorted by
  * bucket so a serve's `[lo, hi)` range filter prunes parquet
  * row-groups. Replays are idempotent (a version overwrites itself);
  * versions at or below a compaction's fold are REFUSED with a named
  * error — additive state cannot re-apply rebased history without
  * double-counting (single-writer per store, the foreachBatch
  * posture).
  */
object IncrementalSwa {
  val VCol = "__v"
  val BCol = "__b"
  private[operators] val FoldPrefix = "_folded_through_"
  private[operators] val RetainPrefix = "_retained_from_"

  /** `bucketUs` is the maintenance grain (day/hour) in epoch-micros;
    * sums are maintained on the exact integer grid `round(value·100)`
    * so partial-order and engine differences cannot drift the result.
    */
  case class Config(keyCols: Seq[String], tsCol: String, valueCol: String,
      bucketUs: Long) {
    require(keyCols.nonEmpty, "at least one key column")
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
  }

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Operational snapshot of one incremental store — the dashboard /
    * runbook read (all driver-side metadata, NO Spark job): committed
    * [[Publish]] generations (old ones awaiting [[Publish.gc]]), the
    * live generation's version partitions, the compaction fold and
    * retention horizons, physical file count/bytes of the LIVE
    * generation, and the writer lease as it stands on disk (`owner` of
    * whatever lease FILE exists — possibly stale; `ageMs` against the
    * file's mtime is what [[WriterLease]]'s ttl reasoning reads).
    */
  case class StoreInfo(dir: String, committedGenerations: Seq[Long],
      liveGeneration: Option[Long], versions: Seq[Long],
      foldedThrough: Long, retainedFrom: Option[Long],
      liveFiles: Long, liveBytes: Long,
      leaseOwner: Option[String], leaseAgeMs: Option[Long])

  def describe(spark: SparkSession, dir: String): StoreInfo = {
    val f = fs(spark, dir)
    // one root listing (Publish markers) + ONE live-generation listing
    // shared by the version/fold/retention fields — versions(),
    // foldedThrough() and retainedFrom() each re-list the same dir,
    // which an object-store FS turns into per-call round trips
    val gens = Publish.committed(spark, dir)
    val live = gens.lastOption
    val (vs, folded, retained, files, bytes) = live.map { g =>
      val gp = new Path(Publish.genPath(dir, g))
      if (!f.exists(gp)) (Seq.empty[Long], -1L, None, 0L, 0L)
      else {
        val entries = f.listStatus(gp).toSeq
        val names = entries.map(_.getPath.getName)
        val vs = entries
          .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$VCol="))
          .map(_.getPath.getName.stripPrefix(s"$VCol=").toLong).sorted
        val folded = names.filter(_.startsWith(FoldPrefix))
          .map(_.drop(FoldPrefix.length).toLong).foldLeft(-1L)(math.max)
        val retained = names.filter(_.startsWith(RetainPrefix))
          .map(_.drop(RetainPrefix.length).toLong).maxOption
        val cs = f.getContentSummary(gp)
        (vs, folded, retained, cs.getFileCount, cs.getLength)
      }
    }.getOrElse((Seq.empty[Long], -1L, None, 0L, 0L))
    val lease = WriterLease.readLease(spark, dir)
    StoreInfo(dir, gens, live, vs, folded, retained, files, bytes,
      lease.map(_._1), WriterLease.leaseAgeMs(spark, dir))
  }

  /** The one-call store-level maintenance policy step shared by the
    * index stores ([[IncrementalBm25]]/[[IncrementalHamming]]/
    * [[IncrementalIvfPq]].maintain — the
    * [[IncrementalMaterializer.maintain]] decision rules at single-store
    * granularity): fold the version tail when the live generation holds
    * more than `compactWhenVersionsExceed` partitions, then gc all but
    * the newest `gcKeepGenerations` committed generations. Idempotent —
    * a second run finds one version and nothing to collect. Returns
    * whether a fold ran.
    */
  private[operators] def maintainStore(spark: SparkSession, dir: String,
      compactWhenVersionsExceed: Int, gcKeepGenerations: Int)(
      compactStore: () => Unit): Boolean = {
    require(compactWhenVersionsExceed >= 1,
      s"compactWhenVersionsExceed must be >= 1: $compactWhenVersionsExceed")
    // BOTH params validated before any action: a bad gc bound failing
    // only after the compaction fold would leave a half-applied call
    require(gcKeepGenerations >= 1,
      s"gcKeepGenerations must keep the live generation: $gcKeepGenerations")
    val folded = versions(spark, dir).size > compactWhenVersionsExceed
    if (folded) compactStore()
    Publish.gc(spark, dir, gcKeepGenerations)
    folded
  }

  /** Live generation dir if the store exists. Read paths go through
    * this (or [[requireLiveGen]]) so that a read of a mistyped or
    * missing path FAILS by name instead of committing an empty
    * generation there as a side effect.
    */
  private[operators] def liveGenOpt(spark: SparkSession,
      dir: String): Option[String] =
    Publish.current(spark, dir).map(Publish.genPath(dir, _))

  /** [[liveGenOpt]] or a named error — the read-path entry. */
  private[operators] def requireLiveGen(spark: SparkSession,
      dir: String): String =
    liveGenOpt(spark, dir).getOrElse(throw new IllegalArgumentException(
      s"no incremental state at $dir — ingest at least one delta first " +
        "(reads never create stores)"))

  /** Live generation dir for WRITERS, creating (and committing) an
    * empty generation 0 for a brand-new store.
    */
  private[operators] def liveGen(spark: SparkSession, dir: String): String = {
    val g = Publish.current(spark, dir)
      .getOrElse(Publish.publish(spark, dir) { p =>
        fs(spark, dir).mkdirs(new Path(p))
      })
    Publish.genPath(dir, g)
  }

  /** Versions present in the live generation, ascending; Nil for a
    * missing store (no side effects).
    */
  def versions(spark: SparkSession, dir: String): Seq[Long] =
    liveGenOpt(spark, dir).toSeq.flatMap { g =>
      val gen = new Path(g)
      val f = fs(spark, dir)
      if (!f.exists(gen)) Nil
      else f.listStatus(gen).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$VCol="))
        .map(_.getPath.getName.stripPrefix(s"$VCol=").toLong)
        .sorted
    }

  /** Highest version a [[compact]] has folded history through in the
    * live generation; -1 when never compacted (or no store yet).
    */
  def foldedThrough(spark: SparkSession, dir: String): Long =
    liveGenOpt(spark, dir).map(foldedThroughIn(spark, _)).getOrElse(-1L)

  /** [[foldedThrough]] read from an ALREADY-RESOLVED generation dir —
    * for lock-free readers that must resolve the generation pointer
    * exactly once and derive every read from it (a second resolution
    * can land on a generation published in between).
    */
  private[operators] def foldedThroughIn(spark: SparkSession,
      genDir: String): Long = {
    val gen = new Path(genDir)
    val f = fs(spark, genDir)
    if (!f.exists(gen)) -1L
    else f.listStatus(gen).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith(FoldPrefix))
      .map(_.drop(FoldPrefix.length).toLong)
      .foldLeft(-1L)(math.max)
  }

  /** Epoch-micros timestamp → bucket index under `bucketUs`. ONE
    * definition shared by every incremental store and gate — the
    * floor-div (not truncating div: timestamps can predate the epoch)
    * must never diverge between writers.
    */
  def bucketOf(ts: Column, bucketUs: Long): Column = {
    val us = unix_micros(ts)
    ((us - pmod(us, lit(bucketUs))) / lit(bucketUs)).cast("long")
  }

  private def bucketCol(cfg: Config): Column = bucketOf(col(cfg.tsCol), cfg.bucketUs)

  /** Cross-process writer-lease wrap shared by every incremental
    * store's write path (ingest/compact): the single-writer assumption,
    * enforced ([[WriterLease]]). Owner = `spark.graft.lease.owner`
    * when configured (same-owner crash-restart reclaim) else the
    * application id — [[WriterLease.ownerOf]], ONE resolution for
    * every leased writer in the engine.
    */
  private[operators] def locked[A](spark: SparkSession, dir: String)(f: => A): A =
    WriterLease.withLease(spark, dir, WriterLease.ownerOf(spark))(f)

  /** Shared compaction choreography for every incremental store: write
    * the fold as the single `__v=<vmax>` of a NEW [[Publish]]
    * generation, record the fold horizon marker, and atomically flip
    * the pointer. The caller supplies the store-specific fold
    * aggregation as a THUNK, evaluated under the writer lease: a
    * `spark.read.parquet` pins its file listing at plan construction,
    * so a fold built before the lock would silently drop any version a
    * concurrent leased ingest lands in the gap — the listing, the fold
    * read, and the vmax it is written as must all resolve inside one
    * lease scope.
    */
  private[operators] def compactFold(spark: SparkSession, dir: String,
      mkFold: () => DataFrame,
      newRetainedFrom: Option[Long] = None,
      sortCol: String = BCol,
      partitionCols: Seq[String] = Nil,
      install: String => Unit = _ => (),
      bumpVersion: Boolean = false): Long = locked(spark, dir) {
    val fold = mkFold()
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"state at $dir is empty or missing — ingest at " +
      "least one delta before compacting")
    // a plain compact folds AS the max version (as-of that version is
    // still answerable — the fold holds exactly its state); a fold that
    // CHANGES how existing versions would be answered (the IvfPq
    // rebuild: same corpus, new quantizers) bumps to a fresh slot so
    // every prior version is refused as rebased, not silently answered
    // under semantics it never had
    val vmax = if (bumpVersion) vs.max + 1 else vs.max
    // the retention horizon SURVIVES later plain compactions: without
    // the carry, a plain compact after a retaining one would drop the
    // marker and a serve reaching below the horizon would silently
    // under-aggregate instead of failing by name. An EXPLICIT horizon
    // REPLACES the carried one (not max): compactRetaining is the
    // operator's assertion "state is complete from minBucket", which
    // is exactly how a re-ingested history becomes servable again —
    // lowering it without re-ingesting is the operator's own claim to
    // make, loudly, through the same call.
    val carried = retainedFrom(spark, dir)
    val horizon = newRetainedFrom.orElse(carried)
    Publish.publish(spark, dir) { gen =>
      val w = fold.sortWithinPartitions(sortCol)
        .write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(s"$gen/$VCol=$vmax")
      val f = new Path(gen).getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.create(new Path(s"$gen/$FoldPrefix$vmax"), false).close()
      horizon.foreach(h =>
        f.create(new Path(s"$gen/$RetainPrefix$h"), false).close())
      // store-specific sidecar install (e.g. IncrementalIvfPq's
      // per-generation quantizers) — INSIDE the publish callback, so
      // the sidecar flips atomically with the fold under one marker
      install(gen)
    }
  }

  /** The oldest bucket the live generation still fully covers, if a
    * retention compaction ever trimmed history (None = everything ever
    * ingested is present).
    */
  def retainedFrom(spark: SparkSession, dir: String): Option[Long] =
    liveGenOpt(spark, dir).flatMap { g =>
      val gen = new Path(g)
      val f = fs(spark, dir)
      if (!f.exists(gen)) None
      else f.listStatus(gen).iterator
        .map(_.getPath.getName)
        .filter(_.startsWith(RetainPrefix))
        .map(_.drop(RetainPrefix.length).toLong)
        .maxOption
    }

  /** Named refusal shared by every store's serve path: a window
    * reaching below the retention horizon would silently
    * under-aggregate (the buckets are GONE, not empty).
    */
  private[operators] def requireWithinRetention(spark: SparkSession,
      dir: String, loB: Long): Unit =
    retainedFrom(spark, dir).foreach(h =>
      require(loB >= h,
        s"window reaches bucket $loB but the state at $dir was " +
          s"retention-compacted from bucket $h — buckets below the " +
          "horizon are erased, not empty; serve a window within the " +
          "retained range, or re-ingest the history and re-run " +
          "compactRetaining with the lower horizon (an explicit " +
          "horizon replaces the recorded one)"))

  /** Fold `delta` to per-(key, bucket) partials and append them as
    * `version`. Only the delta is shuffled; a replay of a live version
    * overwrites its own partition (idempotent); a version at or below
    * [[foldedThrough]] is refused — its history was rebased away.
    */
  def ingest(delta: DataFrame, dir: String, cfg: Config, version: Long): Unit = {
    val spark = delta.sparkSession
    val missing = (cfg.keyCols :+ cfg.tsCol :+ cfg.valueCol)
      .filterNot(delta.columns.contains)
    require(missing.isEmpty, s"delta is missing columns $missing")
    locked(spark, dir) { ingestLocked(delta, dir, cfg, version) }
  }

  private def ingestLocked(delta: DataFrame, dir: String, cfg: Config,
      version: Long): Unit = {
    val spark = delta.sparkSession
    val folded = foldedThrough(spark, dir)
    require(version > folded,
      s"version $version is at or below the compaction fold ($folded) at " +
        s"$dir — additive state cannot replay rebased history without " +
        "double-counting; re-ingest under a fresh version only if the " +
        "delta was never applied")
    val partials = delta
      .withColumn(BCol, bucketCol(cfg))
      .groupBy((cfg.keyCols :+ BCol).map(col): _*)
      .agg(
        sum(round(col(cfg.valueCol) * 100).cast("long")).as("psum_c"),
        count(col(cfg.valueCol)).as("pcnt"),
        min(col(cfg.valueCol)).as("pmin"),
        max(col(cfg.valueCol)).as("pmax"),
        // LATEST is semilattice-foldable: lexicographic max of
        // (event-time, value) — value as the deterministic tiebreak
        // (the union-sort rule) — merges across buckets, versions,
        // and compactions exactly like min/max
        max(struct(unix_micros(col(cfg.tsCol)).as("us"),
          col(cfg.valueCol).as("v"))).as("plast"))
    // sorted by bucket → parquet row-group min/max prune serve's
    // [lo, hi) range filter
    partials.sortWithinPartitions(BCol)
      .write.mode("overwrite")
      .parquet(s"${liveGen(spark, dir)}/$VCol=$version")
  }

  /** Left join `right` onto `left` with NULL-SAFE key equality — the
    * daily-table spine join. serve()'s groupBy treats a NULL key as a
    * group and returns its row; an EqualTo spine join would silently
    * drop exactly that row from the daily table, breaking the "each
    * row equals the boundary serve" contract for NULL-key state.
    */
  private[operators] def nullSafeLeftJoin(left: DataFrame, right: DataFrame,
      joinCols: Seq[String]): DataFrame = {
    val l = left.alias("__l")
    val r = right.alias("__r")
    val cond = joinCols.map(k => col(s"__l.$k") <=> col(s"__r.$k"))
      .reduce(_ && _)
    val rightCols = right.columns.filterNot(joinCols.contains)
    l.join(r, cond, "left_outer")
      .select(joinCols.map(k => col(s"__l.$k").as(k)) ++
        rightCols.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** Each state row re-addressed to every output bucket its time
    * bucket feeds (`__day` ∈ [bucket, min(bucket + W − 1, hiB)]) — the
    * daily-table expansion shared by the stores whose window aggregate
    * has NO inverse (set union, register max, candidate counts): a
    * rolling frame cannot subtract the leaving bucket, so the one-pass
    * daily table pays O(state rows × W) intermediate rows instead —
    * still ONE state read vs the per-day serve loop's N (axis 28).
    */
  private[operators] def expandToWindows(st: DataFrame, windowBuckets: Int,
      hiB: Long): DataFrame =
    st.withColumn("__day", explode(sequence(col(BCol),
      least(col(BCol) + (windowBuckets - 1L), lit(hiB)))))

  /** The last output bucket a daily table emits: the state's last
    * event bucket by default (the publication shape), extendable by
    * the training-set join to min(throughBucket, hiB + W − 1) — past
    * that every window is empty, so emitting further is pure spine.
    */
  private[operators] def dailyCap(hiB: Long, windowBuckets: Int,
      throughBucket: Option[Long]): Long =
    throughBucket.map(t => math.min(math.max(t, hiB), hiB + windowBuckets - 1L))
      .getOrElse(hiB)

  /** The first output bucket whose window is COMPLETE over retained
    * state — the daily tables' default emission floor (erased ≠
    * empty; [[serveDaily]]'s horizon posture, shared by every store's
    * daily variant). `Long.MinValue` when no horizon applies or the
    * caller opted into left-edge semantics.
    */
  private[operators] def dailyCompleteFrom(spark: SparkSession, dir: String,
      windowBuckets: Int, includeHorizonPartialRows: Boolean): Long =
    if (includeHorizonPartialRows) Long.MinValue
    else retainedFrom(spark, dir).map(_ + windowBuckets - 1L)
      .getOrElse(Long.MinValue)

  private def readState(spark: SparkSession, dir: String): DataFrame =
    // partition discovery reads __v back as a column
    spark.read.parquet(requireLiveGen(spark, dir))

  private def finishAgg(state: DataFrame, cfg: Config, loB: Long,
      hiB: Long): DataFrame =
    state
      .where(col(BCol) >= loB && col(BCol) < hiB)
      .groupBy(cfg.keyCols.map(col): _*)
      .agg(
        sum(col("psum_c")).as("sum_c"),
        sum(col("pcnt")).as("f_cnt"),
        min(col("pmin")).as("f_min"),
        max(col("pmax")).as("f_max"),
        max(col("plast")).as("pl"))
      .withColumn("f_sum", col("sum_c") / 100.0)
      .withColumn("f_avg", col("f_sum") / col("f_cnt"))
      .select(cfg.keyCols.map(col) ++
        Seq(col("f_sum"), col("f_cnt"), col("f_avg"), col("f_min"),
          col("f_max"), col("pl").getField("v").as("f_latest")): _*)

  /** Window aggregates as of bucket boundary `asOfUs` over the last
    * `windowBuckets` buckets: events with ts ∈ [asOf − W, asOf). Keys
    * with no events in the window are absent (the left join against a
    * spine is the caller's).
    */
  def serve(spark: SparkSession, dir: String, cfg: Config, asOfUs: Long,
      windowBuckets: Int): DataFrame = {
    require(asOfUs % cfg.bucketUs == 0,
      s"asOf $asOfUs is not aligned to the ${cfg.bucketUs}µs bucket grid — " +
        "the store serves snapshot boundaries; sub-bucket observation " +
        "times belong to the windowed join (J3)")
    require(windowBuckets > 0, s"windowBuckets must be positive: $windowBuckets")
    val hiB = asOfUs / cfg.bucketUs
    requireWithinRetention(spark, dir, hiB - windowBuckets)
    finishAgg(readState(spark, dir), cfg, hiB - windowBuckets, hiB)
  }

  /** The daily feature TABLE in one pass: for every key × bucket in
    * the state's bucket range, the window aggregates over the
    * `windowBuckets` buckets ending AT that bucket (i.e. as served at
    * boundary (b+1)·bucketUs). A materialization that published 30
    * daily snapshots as 30 [[serve]] calls would scan the state 30
    * times; this is ONE merge of the partials, one spine join, and one
    * per-key rolling RANGE-frame window over the bucket GRID (rows =
    * keys × buckets — the size of the output itself, not of the event
    * history). Buckets whose window holds no events are omitted, same
    * as [[serve]]'s absent keys.
    *
    * Retention: after a [[compactRetaining]], buckets below the horizon
    * are ERASED, not empty — a row whose window reaches below it would
    * under-aggregate. Consistent with [[serve]]'s named refusal, such
    * rows are EXCLUDED by default (every emitted row is exact); pass
    * `includeHorizonPartialRows = true` to emit them anyway with
    * genuine-left-edge semantics (aggregating only retained buckets,
    * like the first `windowBuckets` days of any history) — training
    * over such a table must know its first days are partial.
    *
    * `throughBucket` extends the emitted range past the state's last
    * event bucket (to min(throughBucket, hiB + W − 1) — beyond that
    * every window is empty): the training-set join needs feature rows
    * at observation dates AFTER the last ingested event day, where the
    * window still reaches real state. Default keeps the publication
    * shape (rows end at the last day with data).
    */
  def serveDaily(spark: SparkSession, dir: String, cfg: Config,
      windowBuckets: Int, includeHorizonPartialRows: Boolean = false,
      throughBucket: Option[Long] = None): DataFrame = {
    require(windowBuckets > 0, s"windowBuckets must be positive: $windowBuckets")
    val merged = readState(spark, dir)
      .groupBy((cfg.keyCols :+ BCol).map(col): _*)
      .agg(sum(col("psum_c")).as("psum_c"), sum(col("pcnt")).as("pcnt"),
        min(col("pmin")).as("pmin"), max(col("pmax")).as("pmax"),
        max(col("plast")).as("plast"))
    // two longs to the driver: the global bucket range (the spine plan)
    val Array(loB, hiB) = {
      val r = merged.agg(min(col(BCol)), max(col(BCol))).head()
      require(!r.isNullAt(0), s"state at $dir holds no partials")
      Array(r.getLong(0), r.getLong(1))
    }
    val capB = dailyCap(hiB, windowBuckets, throughBucket)
    val spine = merged.select(cfg.keyCols.map(col): _*).distinct()
      .withColumn(BCol, explode(sequence(lit(loB), lit(capB))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(cfg.keyCols.map(col): _*)
      .orderBy(col(BCol))
      .rangeBetween(-(windowBuckets - 1L), 0L)
    // horizon rows are dropped AFTER the window: the range frame at the
    // first complete bucket still needs the retained buckets before it
    val completeFrom = dailyCompleteFrom(spark, dir, windowBuckets,
      includeHorizonPartialRows)
    nullSafeLeftJoin(spine, merged, cfg.keyCols :+ BCol)
      .withColumn("sum_c", sum(col("psum_c")).over(w))
      .withColumn("f_cnt", sum(col("pcnt")).over(w))
      .withColumn("f_min", min(col("pmin")).over(w))
      .withColumn("f_max", max(col("pmax")).over(w))
      .withColumn("pl", max(col("plast")).over(w))
      .where(col("f_cnt").isNotNull && col(BCol) >= completeFrom)
      .withColumn("f_sum", col("sum_c") / 100.0)
      .withColumn("f_avg", col("f_sum") / col("f_cnt"))
      .select(cfg.keyCols.map(col) ++ Seq(col(BCol).as("bucket"),
        col("f_sum"), col("f_cnt"), col("f_avg"), col("f_min"),
        col("f_max"), col("pl").getField("v").as("f_latest")): _*)
  }

  /** [[serve]] as the state stood at `asOfVersion` — partials of later
    * versions excluded. Refuses versions the live generation's
    * compaction fold has rebased away.
    */
  def serveAsOf(spark: SparkSession, dir: String, cfg: Config, asOfUs: Long,
      windowBuckets: Int, asOfVersion: Long): DataFrame = {
    val folded = foldedThrough(spark, dir)
    require(folded < 0 || asOfVersion >= folded,
      s"version $asOfVersion predates the compaction fold ($folded) at " +
        s"$dir — that history was rebased; serving the fold instead would " +
        "be a reproducibility lie")
    require(asOfUs % cfg.bucketUs == 0,
      s"asOf $asOfUs is not aligned to the ${cfg.bucketUs}µs bucket grid")
    val hiB = asOfUs / cfg.bucketUs
    requireWithinRetention(spark, dir, hiB - windowBuckets)
    finishAgg(readState(spark, dir).where(col(VCol) <= asOfVersion), cfg,
      hiB - windowBuckets, hiB)
  }

  /** Fold the live generation's version tail into one partial per
    * (key, bucket) and atomically flip the [[Publish]] pointer to it.
    * The fold keeps the highest version's number (ingests continue
    * above it) and records `_folded_through_<vmax>`; superseded
    * generations are reclaimed by [[Publish.gc]] under its reader
    * retention horizon. Returns the new generation number.
    */
  def compact(spark: SparkSession, dir: String, cfg: Config): Long =
    compactFold(spark, dir, () => foldState(spark, dir, cfg))

  private def foldState(spark: SparkSession, dir: String,
      cfg: Config): DataFrame =
    readState(spark, dir)
      .groupBy((cfg.keyCols :+ BCol).map(col): _*)
      .agg(
        sum(col("psum_c")).as("psum_c"),
        sum(col("pcnt")).as("pcnt"),
        min(col("pmin")).as("pmin"),
        max(col("pmax")).as("pmax"),
        max(col("plast")).as("plast"))

  /** Retention compaction: [[compact]] dropping buckets below
    * `minBucket` — the knob that keeps state bounded by the serving
    * horizon FOREVER (keys × retained buckets), instead of growing
    * with corpus age. The horizon is recorded in the new generation
    * (and carried through later compactions); a serve whose window
    * reaches below it fails by name rather than silently
    * under-aggregating over erased buckets.
    */
  def compactRetaining(spark: SparkSession, dir: String, cfg: Config,
      minBucket: Long): Long =
    compactFold(spark, dir,
      () => foldState(spark, dir, cfg).where(col(BCol) >= minBucket),
      newRetainedFrom = Some(minBucket))

  /** GDPR erasure for feature state: fold the live generation WITHOUT
    * `keys`' rows into a new generation — one linear pass, atomic
    * flip, nothing of the keys' history remains (additive partials
    * cannot retract selectively; erasing the key's rows entirely is
    * exactly what an erasure obligation wants). Serves return the
    * keys as absent thereafter; a later ingest may legally re-admit
    * them with fresh data.
    */
  def forgetKeys(spark: SparkSession, dir: String, cfg: Config,
      keys: DataFrame): Long =
    compactFold(spark, dir,
      () => foldState(spark, dir, cfg).join(keys, cfg.keyCols, "left_anti"))
}
