package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.hadoop.fs.Path

/** Windowed per-key UNION (collect-set, A4) from incrementally-
  * maintained state. Set union is a SEMILATTICE (idempotent,
  * commutative, associative), so it folds across buckets, versions,
  * and compactions exactly like [[IncrementalSwa]]'s LATEST and
  * [[IncrementalDistinct]]'s HLL registers: the state holds one
  * distinct-item set per (key, time-bucket) and a serve merges the
  * window's sets — late data is one more version, replay overwrites
  * itself, no retraction path needed.
  *
  * The ONE hazard additive scalars don't have: set state per
  * (key, bucket) grows with the bucket's distinct-item count, so a
  * high-cardinality item column silently turns the "bounded state"
  * contract into an event-log copy. `maxSetPerBucket` therefore CAPS
  * the per-(key, bucket) set and an ingest/compact that exceeds it
  * FAILS BY NAME (the offending key in the message) rather than
  * truncating — a truncated union is a wrong feature, not a smaller
  * one. Size the cap to the feature's semantic cardinality (devices
  * per user per day, not tokens per document); uncapped-cardinality
  * unions belong to [[IncrementalDistinct]]'s fixed-size sketches.
  *
  * Scale posture mirrors the sibling stores: ingest shuffles only the
  * delta (map-side-combinable collect_set), state rows are keys ×
  * live buckets, serve shuffles bounded state (≤ windowBuckets × cap
  * items per key), partials are bucket-sorted for row-group pruning.
  */
object IncrementalUnion {
  import IncrementalSwa.{BCol, VCol}

  case class Config(keyCols: Seq[String], tsCol: String, itemCol: String,
      bucketUs: Long, maxSetPerBucket: Int = 10000) {
    require(keyCols.nonEmpty, "at least one key column")
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    require(maxSetPerBucket > 0,
      s"maxSetPerBucket must be positive: $maxSetPerBucket")
  }

  private def capCheck(spark: SparkSession, sets: DataFrame, cfg: Config,
      where: String): Option[String] = {
    val over = sets.where(size(col("pset")) > cfg.maxSetPerBucket)
      .select((cfg.keyCols.map(col) :+ col(BCol) :+
        size(col("pset")).as("__n")): _*)
      .limit(1).collect()
    over.headOption.map { r =>
      val key = cfg.keyCols.zipWithIndex
        .map { case (k, i) => s"$k=${r.get(i)}" }.mkString(", ")
      s"UNION state cap exceeded at $where: ($key) bucket " +
        s"${r.get(cfg.keyCols.size)} holds ${r.get(cfg.keyCols.size + 1)} " +
        s"distinct items > maxSetPerBucket=${cfg.maxSetPerBucket} — raise " +
        "the cap for a genuinely-bounded feature, or use " +
        "IncrementalDistinct's fixed-size sketch for unbounded cardinality"
    }
  }

  /** Fold `delta` to per-(key, bucket) distinct-item sets and append
    * as `version`; same replay/fold discipline as
    * [[IncrementalSwa.ingest]]. An over-cap set deletes its own
    * partition and fails by name — the store is left as before the
    * ingest.
    *
    * Crash recovery: a crashed (or cap-failed-then-killed) ingest
    * leaves a `_pending_<v>` staging dir — invisible to reads, but
    * garbage — which the next leased ingest sweeps. The final
    * delete→rename swap of a REPLAY has a window where the committed
    * version partition is absent; recovery from a crash inside it is
    * the replay itself (the foreachBatch/idempotent-version contract:
    * whoever re-runs the version completes the swap), the same
    * assumption every replay-overwrites-itself store makes.
    */
  def ingest(delta: DataFrame, dir: String, cfg: Config, version: Long): Unit = {
    val spark = delta.sparkSession
    val missing = (cfg.keyCols :+ cfg.tsCol :+ cfg.itemCol)
      .filterNot(delta.columns.contains)
    require(missing.isEmpty, s"delta is missing columns $missing")
    IncrementalSwa.locked(spark, dir) {
      val folded = IncrementalSwa.foldedThrough(spark, dir)
      require(version > folded,
        s"version $version is at or below the compaction fold ($folded) at " +
          s"$dir — state cannot replay rebased history")
      val b = IncrementalSwa.bucketOf(col(cfg.tsCol), cfg.bucketUs)
      val gen = IncrementalSwa.liveGen(spark, dir)
      val path = s"$gen/$VCol=$version"
      // stage to a PENDING path (the `_pending_` prefix is invisible to
      // versions()'s `__v=` filter), cap-check the staged files, and
      // only then swap into the version slot: writing straight to the
      // slot would let a failing REPLAY destroy the committed version
      // it was overwriting before the check had run
      val pending = s"$gen/_pending_$version"
      val fs = new Path(gen)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // sweep staging dirs stranded by crashed ingests (safe under the
      // lease: no other writer can have one in flight)
      fs.listStatus(new Path(gen)).iterator
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("_pending_"))
        .foreach(s => fs.delete(s.getPath, true))
      delta.withColumn(BCol, b)
        .groupBy((cfg.keyCols :+ BCol).map(col): _*)
        .agg(collect_set(col(cfg.itemCol)).as("pset"))
        .sortWithinPartitions(BCol)
        .write.mode("overwrite").parquet(pending)
      capCheck(spark, spark.read.parquet(pending), cfg,
        s"ingest of version $version into $dir").foreach { msg =>
        fs.delete(new Path(pending), true)
        throw new IllegalStateException(msg)
      }
      fs.delete(new Path(path), true)
      fs.rename(new Path(pending), new Path(path))
    }
  }

  /** Per-key distinct-item union over [asOf − W, asOf), as a SORTED
    * array (`f_union`) — collect_set order is partition-dependent, so
    * determinism requires the sort. Keys with no items in the window
    * are absent.
    */
  def serve(spark: SparkSession, dir: String, cfg: Config, asOfUs: Long,
      windowBuckets: Int): DataFrame = {
    require(asOfUs % cfg.bucketUs == 0,
      s"asOf $asOfUs is not aligned to the ${cfg.bucketUs}µs bucket grid")
    require(windowBuckets > 0, s"windowBuckets must be positive: $windowBuckets")
    val hiB = asOfUs / cfg.bucketUs
    IncrementalSwa.requireWithinRetention(spark, dir, hiB - windowBuckets)
    spark.read.parquet(IncrementalSwa.requireLiveGen(spark, dir))
      .where(col(BCol) >= hiB - windowBuckets && col(BCol) < hiB)
      .groupBy(cfg.keyCols.map(col): _*)
      .agg(array_sort(array_distinct(flatten(collect_list(col("pset")))))
        .as("f_union"))
  }

  /** The daily feature TABLE for set state: for every key × bucket,
    * the distinct-item union over the `windowBuckets` buckets ending
    * AT that bucket. NO RANGE-frame shortcut exists for sets — union
    * has no inverse, so a rolling frame cannot subtract the bucket
    * leaving the window; instead each stored item contributes itself
    * to the `windowBuckets` output buckets its bucket feeds
    * (explode + sequence) and one groupBy re-distincts. Honest cost:
    * O(state items × windowBuckets) intermediate rows — state items
    * are bounded by keys × buckets × cap, and this is still far below
    * the N serve() scans (each a full state read) a per-day loop pays.
    * Rows whose window holds no items are omitted; horizon rows are
    * excluded by default with the scalar store's opt-in
    * (`includeHorizonPartialRows`) for left-edge semantics.
    */
  def serveDaily(spark: SparkSession, dir: String, cfg: Config,
      windowBuckets: Int, includeHorizonPartialRows: Boolean = false,
      throughBucket: Option[Long] = None): DataFrame = {
    require(windowBuckets > 0, s"windowBuckets must be positive: $windowBuckets")
    val st = spark.read.parquet(IncrementalSwa.requireLiveGen(spark, dir))
    val hiB = {
      val r = st.agg(max(col(BCol))).head()
      require(!r.isNullAt(0), s"state at $dir holds no partials")
      r.getLong(0)
    }
    val capB = IncrementalSwa.dailyCap(hiB, windowBuckets, throughBucket)
    val completeFrom = IncrementalSwa.dailyCompleteFrom(spark, dir,
      windowBuckets, includeHorizonPartialRows)
    st.select(cfg.keyCols.map(col) :+ col(BCol) :+
        explode(col("pset")).as("__item"): _*)
      .select(cfg.keyCols.map(col) :+
        explode(sequence(col(BCol),
          least(col(BCol) + (windowBuckets - 1L), lit(capB)))).as("bucket") :+
        col("__item"): _*)
      .where(col("bucket") >= completeFrom)
      .groupBy((cfg.keyCols :+ "bucket").map(col): _*)
      .agg(array_sort(collect_set(col("__item"))).as("f_union"))
  }

  /** [[serve]] as the state stood at `asOfVersion` — time travel with
    * [[IncrementalSwa.serveAsOf]]'s rebased-history refusal.
    */
  def serveAsOf(spark: SparkSession, dir: String, cfg: Config, asOfUs: Long,
      windowBuckets: Int, asOfVersion: Long): DataFrame = {
    val folded = IncrementalSwa.foldedThrough(spark, dir)
    require(folded < 0 || asOfVersion >= folded,
      s"version $asOfVersion predates the compaction fold ($folded) at " +
        s"$dir — that history was rebased; serving the fold instead would " +
        "be a reproducibility lie")
    require(asOfUs % cfg.bucketUs == 0,
      s"asOf $asOfUs is not aligned to the ${cfg.bucketUs}µs bucket grid")
    require(windowBuckets > 0, s"windowBuckets must be positive: $windowBuckets")
    val hiB = asOfUs / cfg.bucketUs
    IncrementalSwa.requireWithinRetention(spark, dir, hiB - windowBuckets)
    spark.read.parquet(IncrementalSwa.requireLiveGen(spark, dir))
      .where(col(VCol) <= asOfVersion)
      .where(col(BCol) >= hiB - windowBuckets && col(BCol) < hiB)
      .groupBy(cfg.keyCols.map(col): _*)
      .agg(array_sort(array_distinct(flatten(collect_list(col("pset")))))
        .as("f_union"))
  }

  /** Fold the version tail: distinct union per (key, bucket) in a new
    * [[Publish]] generation. The merged per-bucket set is re-checked
    * against the cap (versions each under it can union past it) and
    * the compact fails by name BEFORE publishing — the live
    * generation stays as it was.
    */
  def compact(spark: SparkSession, dir: String, cfg: Config): Long =
    IncrementalSwa.compactFold(spark, dir,
      () => capChecked(spark, foldStateRaw(spark, dir, cfg), cfg,
        s"compaction of $dir"))

  /** The merged fold WITHOUT the cap check — callers apply the check
    * AFTER their own filters, so retention/erasure are never refused
    * because of the very rows they are about to delete (cross-version
    * folds can exceed the cap even when every ingest passed it).
    */
  private def foldStateRaw(spark: SparkSession, dir: String,
      cfg: Config): DataFrame =
    spark.read
      .parquet(IncrementalSwa.requireLiveGen(spark, dir))
      .groupBy((cfg.keyCols :+ BCol).map(col): _*)
      .agg(array_distinct(flatten(collect_list(col("pset")))).as("pset"))

  private def capChecked(spark: SparkSession, fold: DataFrame,
      cfg: Config, where: String): DataFrame = {
    capCheck(spark, fold, cfg, where)
      .foreach(msg => throw new IllegalStateException(msg))
    fold
  }

  /** Retention compaction — [[IncrementalSwa.compactRetaining]]'s
    * contract for set state: buckets below `minBucket` are erased and
    * serves below the recorded horizon fail by name. The cap applies
    * to what is KEPT, not what is dropped.
    */
  def compactRetaining(spark: SparkSession, dir: String, cfg: Config,
      minBucket: Long): Long =
    IncrementalSwa.compactFold(spark, dir,
      () => capChecked(spark,
        foldStateRaw(spark, dir, cfg).where(col(BCol) >= minBucket), cfg,
        s"retention compaction of $dir"),
      newRetainedFrom = Some(minBucket))

  /** GDPR erasure — [[IncrementalSwa.forgetKeys]]'s contract: the
    * keys' item sets are removed entirely in one atomic fold. NO cap
    * check here — erasure must never be blocked by unrelated over-cap
    * state (erasing the offender may be the remedy); the next
    * [[compact]] surfaces any violation among the survivors.
    */
  def forgetKeys(spark: SparkSession, dir: String, cfg: Config,
      keys: DataFrame): Long =
    IncrementalSwa.compactFold(spark, dir,
      () => foldStateRaw(spark, dir, cfg)
        .join(keys, cfg.keyCols, "left_anti"))
}
