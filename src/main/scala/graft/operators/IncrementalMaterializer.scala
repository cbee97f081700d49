package graft.operators

import graft.model.{Aggregation, Durations, GraftAggregation, Transformation, ValueType}
import graft.project.{AnchorFeature, DerivedFeature}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The DSL bridge onto the incremental stores: WindowAgg anchor
  * features (SURVEY §2.6) materialized by O(delta) REFRESH instead of
  * the M1 step-loop's from-raw recompute. Features sharing a
  * (defExpr, filter) measure share ONE [[IncrementalSwa]] store (its
  * partials already carry sum/count/min/max/latest of the measure —
  * five aggregations for one delta shuffle); [[snapshot]] serves every
  * feature at a bucket boundary and assembles the wide feature row
  * with one bounded join per distinct (measure, window).
  *
  * Scope, refused by name otherwise: scalar aggregations
  * SUM/COUNT/AVG/MIN/MAX/LATEST ride [[IncrementalSwa]]; UNION (a
  * semilattice — set union merges like LATEST) rides
  * [[IncrementalUnion]] with its per-(key, bucket) state cap;
  * ELEMENTWISE_* (additive O(dim) partials on the exact integer grid)
  * ride [[IncrementalVector]]. Windows must be whole bucket
  * multiples; `filter` supported (a pre-aggregation row predicate —
  * applied to the DELTA before partials, which is exactly when it is
  * cheap); `groupBy`/`limit` are not incrementally maintainable in
  * ANY of these shapes (a sub-key explodes state by its cardinality, a
  * record limit is not a semilattice) and route to the batch J3/A9
  * planner instead.
  *
  * SUM/AVG are maintained on the exact integer cent grid
  * ([[IncrementalSwa]]'s contract): exact for 2-decimal measures,
  * 0.01-quantized otherwise; MIN/MAX/LATEST are exact raw values.
  * Store directories key on md5(defExpr|filter), so refreshes are
  * stable across runs and feature reorderings.
  */
object IncrementalMaterializer {

  /** Which incremental store a feature's aggregation maintains:
    * the 5-in-1 scalar partials ([[IncrementalSwa]]), the
    * distinct-set semilattice ([[IncrementalUnion]]), or the O(dim)
    * vector partials ([[IncrementalVector]]).
    */
  private sealed trait Kind { def prefix: String }
  private case object Scalar extends Kind { val prefix = "m" }
  private case object SetUnion extends Kind { val prefix = "u" }
  private case object Vector extends Kind { val prefix = "e" }

  private case class Measure(defExpr: String, filter: Option[String],
      kind: Kind) {
    def id: String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"$defExpr|${filter.getOrElse("")}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    }
  }

  private def kindOf(f: AnchorFeature, agg: Aggregation): Kind = agg match {
    case Aggregation.SUM | Aggregation.COUNT | Aggregation.AVG |
         Aggregation.MIN | Aggregation.MAX | Aggregation.LATEST => Scalar
    case Aggregation.UNION => SetUnion
    case Aggregation.ELEMENTWISE_SUM | Aggregation.ELEMENTWISE_AVG |
         Aggregation.ELEMENTWISE_MIN | Aggregation.ELEMENTWISE_MAX => Vector
    case other => throw new IllegalArgumentException(
      s"feature '${f.name}': $other is not incrementally maintainable " +
        "here — use the batch windowed-agg join")
  }

  private def planOf(f: AnchorFeature, bucketUs: Long): (Measure, Int, Aggregation) =
    f.transform match {
      case wa: Transformation.WindowAgg =>
        require(wa.groupBy.isEmpty && wa.limit.isEmpty,
          s"feature '${f.name}': group_by/limit window aggregations are not " +
            "incrementally maintainable (sub-keys explode state, limits are " +
            "not semilattices) — use the batch windowed-agg join")
        val winUs = graft.model.Durations.toMicros(wa.window)
        require(winUs % bucketUs == 0 && winUs > 0,
          s"feature '${f.name}': window ${wa.window} is not a whole multiple " +
            s"of the ${bucketUs}µs maintenance bucket")
        (Measure(wa.defExpr, wa.filter, kindOf(f, wa.aggFunc)),
          (winUs / bucketUs).toInt, wa.aggFunc)
      case other => throw new IllegalArgumentException(
        s"feature '${f.name}': only window aggregations materialize " +
          s"incrementally (got $other)")
    }

  private def storeDir(root: String, m: Measure) =
    s"$root/${m.kind.prefix}=${m.id}"

  /** Assemble per-store served frames into the wide feature row in ONE
    * shuffle: each frame is null-padded to the full feature-column set
    * (typed from its owning frame's schema), unioned, and collapsed
    * with `first(_, ignoreNulls)` per feature — at most one frame
    * carries a non-null value per (spine, feature), so `first` is
    * deterministic. The previous spine + foldLeft of left joins paid
    * one shuffle PER STORE and needed a null-safe join to keep NULL-key
    * rows; groupBy treats a NULL key as a group natively (serve()'s own
    * semantics), and keys absent from a store's window simply keep that
    * store's nulls — the left-join feature-vector contract, at
    * store-count-invariant cost.
    */
  private def assembleWide(served: Seq[DataFrame],
      joinCols: Seq[String]): DataFrame = {
    if (served.sizeIs == 1) return served.head
    val featCols = served.flatMap(df =>
      df.schema.fields.filterNot(f => joinCols.contains(f.name))
        .map(f => (f.name, f.dataType)))
    val padded = served.map { df =>
      val have = df.columns.toSet
      df.select(joinCols.map(col) ++ featCols.map { case (n, t) =>
        if (have(n)) col(n) else lit(null).cast(t).as(n) }: _*)
    }
    val firsts = featCols.map { case (n, _) =>
      first(col(n), ignoreNulls = true).as(n) }
    padded.reduce(_ unionByName _)
      .groupBy(joinCols.map(col): _*)
      .agg(firsts.head, firsts.tail: _*)
  }

  private def cfg(keyCols: Seq[String], tsCol: String, bucketUs: Long) =
    IncrementalSwa.Config(keyCols, tsCol, "__graft_m", bucketUs)

  // ------------------------------------------------------------------
  // Feature-set-level refresh commit marker. A refresh fans ONE delta
  // out to N independent stores (Par.run, each under its own lease) —
  // per-store ingests are version-idempotent, but nothing at the SET
  // level says "all N landed": a crash after store A ingested version
  // V but before store B did leaves mixed-version state that snapshot /
  // snapshotDaily / trainingSet would assemble into one wide row no
  // single-version state ever produced — silently. The reference's
  // materialization is one job per step (feathr-rs/src/materialization.rs:200-231),
  // atomic by construction; the O(delta) refactoring must not be weaker.
  //
  // Protocol: before fan-out the refresh writes `_refresh_pending_<V>`
  // at the set root, its CONTENT the root-relative store dirs the fan
  // covers; after every store lands, markers <= V are removed. Serves
  // intersect the pending dirs with the stores they are about to read
  // and refuse BY NAME any that lag the marker's version — a store at
  // or above V completed its ingest (data lands only after the
  // ingest's own meta/validation), so a crash between the last ingest
  // and the marker sweep self-heals at the next serve rather than
  // refusing forever. Repair is the refresh's own replay (idempotent
  // per store); markers are swept on completion.
  // ------------------------------------------------------------------

  private val PendingPrefix = "_refresh_pending_"

  private def fsOf(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Record intent: refresh `version` is about to fan out to
    * `storeDirs` (root-relative). Overwrites its own marker — a
    * replayed refresh re-declares the same intent.
    */
  private def markPending(spark: SparkSession, root: String, version: Long,
      storeDirs: Seq[String]): Unit = {
    val f = fsOf(spark, root)
    f.mkdirs(new org.apache.hadoop.fs.Path(root))
    val out = f.create(
      new org.apache.hadoop.fs.Path(s"$root/$PendingPrefix$version"), true)
    try out.write(storeDirs.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Store `d` verifiably holds refresh version `v`: the version
    * partition is present, or a compaction fold at or above it folded
    * it in. NOTE a store whose max version merely EXCEEDS `v` does NOT
    * hold it — version holes are legal, so a later refresh landing v+1
    * on a store that missed v is still missing v's delta; treating
    * "max >= v" as healed would silently launder the tear away.
    */
  private def holdsVersion(spark: SparkSession, d: String,
      v: Long): Boolean =
    IncrementalSwa.versions(spark, d).contains(v) ||
      IncrementalSwa.foldedThrough(spark, d) >= v

  /** Sweep pending markers at or below `version` — but ONLY those
    * whose every covered store verifiably holds their version (the
    * refresh that just completed proves its own; an OLDER torn marker
    * must survive the sweep, or a later refresh would silently launder
    * the missing delta away).
    */
  private def clearPending(spark: SparkSession, root: String,
      version: Long): Unit = {
    val f = fsOf(spark, root)
    pending(spark, root).foreach { case (v, rel) =>
      if (v <= version &&
          rel.forall(r => holdsVersion(spark, s"$root/$r", v)))
        f.delete(new org.apache.hadoop.fs.Path(s"$root/$PendingPrefix$v"),
          false)
    }
  }

  /** Pending refreshes at `root`: (version, root-relative store dirs). */
  private def pending(spark: SparkSession,
      root: String): Seq[(Long, Seq[String])] = {
    val f = fsOf(spark, root)
    val p = new org.apache.hadoop.fs.Path(root)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(PendingPrefix))
      .map { s =>
        val in = f.open(s.getPath)
        val dirs = try new String(in.readAllBytes(), "UTF-8")
          .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
        finally in.close()
        (s.getPath.getName.stripPrefix(PendingPrefix).toLong, dirs)
      }
  }

  /** The serve-side tear check: every store this serve reads that an
    * unfinished refresh covers must be AT OR ABOVE the refresh's
    * version, else the wide row would mix versions — refused by name.
    * `servedDirs` are ABSOLUTE store paths under `root`.
    */
  private def requireRefreshComplete(spark: SparkSession, root: String,
      servedDirs: Seq[String]): Unit =
    requireRefreshCompleteUpTo(spark, root, servedDirs, Long.MaxValue)

  /** The tear check bounded by a version boundary: an AS-OF read at
    * version V is untouched by a torn refresh ABOVE V (the mixed
    * versions are all excluded by the truncation), so only markers at
    * or below the boundary can refuse it.
    */
  private def requireRefreshCompleteUpTo(spark: SparkSession, root: String,
      servedDirs: Seq[String], upTo: Long): Unit =
    pending(spark, root).foreach { case (v, rel) =>
      val covered = rel.map(r => s"$root/$r").toSet
      val lagging = if (v > upTo) Nil
        else servedDirs.filter(covered).filterNot(holdsVersion(spark, _, v))
      require(lagging.isEmpty,
        s"refresh version $v of the feature set at $root started but " +
          s"did not complete: store(s) ${lagging.mkString(", ")} have " +
          "not ingested it — serving now would assemble a wide row " +
          "mixing feature versions. Replay the refresh at version " +
          s"$v (per-store ingest is idempotent) or wait for the " +
          "in-flight refresh to finish")
    }

  /** Maintenance guard: folding a store covered by a TORN refresh
    * rebases the very version the repair replay must re-ingest (the
    * fold raises foldedThrough past it, so the replay's ingest is then
    * refused as rebased history) — the tear would become permanent.
    * Refused by name; healed-but-unswept markers don't block.
    */
  private def requireNoTornForMaintenance(spark: SparkSession, root: String,
      dirs: Seq[String]): Unit =
    pending(spark, root).foreach { case (v, rel) =>
      val covered = rel.map(r => s"$root/$r").toSet
      val torn = rel.map(r => s"$root/$r")
        .exists(d => !holdsVersion(spark, d, v))
      val hit = dirs.filter(covered)
      require(!torn || hit.isEmpty,
        s"refresh version $v of the feature set at $root is torn " +
          s"(pending marker present, not every covered store holds it); " +
          s"compacting ${hit.mkString(", ")} would rebase version $v and " +
          "make the replay repair impossible — replay the refresh at " +
          s"version $v first")
    }

  /** Fold one delta into every feature's measure store — one delta
    * shuffle per DISTINCT (defExpr, filter, store kind), not per
    * feature. Same version/replay discipline as
    * [[IncrementalSwa.ingest]]. `unionCap` bounds UNION set state per
    * (key, bucket) ([[IncrementalUnion.Config.maxSetPerBucket]] — an
    * over-cap ingest fails by name, never truncates).
    */
  def refresh(delta: DataFrame, root: String, features: Seq[AnchorFeature],
      keyCols: Seq[String], tsCol: String, bucketUs: Long,
      version: Long, unionCap: Int = 10000): Unit = {
    require(features.nonEmpty, "no features to refresh")
    val measures = features.map(planOf(_, bucketUs)._1).distinct
    // set-level commit intent BEFORE the fan-out (see the marker
    // protocol above): a crash mid-fan leaves the marker, and serves
    // refuse the torn subset by name until the refresh is replayed
    markPending(spark = delta.sparkSession, root = root, version = version,
      storeDirs = measures.map(m => s"${m.kind.prefix}=${m.id}"))
    // plans built sequentially, the independent per-store writes run
    // concurrently (separate dirs, separate leases) — wall ≈ the
    // slowest store instead of the sum (the Par lever, r14 verdict)
    Par.run(measures.map { m => () =>
      val filtered = m.filter.map(delta.where(_)).getOrElse(delta)
      val measured = filtered.withColumn("__graft_m", expr(m.defExpr))
        .select((keyCols :+ tsCol :+ "__graft_m").map(col): _*)
      m.kind match {
        case Scalar => IncrementalSwa.ingest(measured,
          storeDir(root, m), cfg(keyCols, tsCol, bucketUs), version)
        case SetUnion => IncrementalUnion.ingest(measured,
          storeDir(root, m),
          IncrementalUnion.Config(keyCols, tsCol, "__graft_m", bucketUs,
            unionCap), version)
        case Vector => IncrementalVector.ingest(measured,
          storeDir(root, m),
          IncrementalVector.Config(keyCols, tsCol, "__graft_m", bucketUs),
          version)
      }
    }: _*)
    clearPending(delta.sparkSession, root, version)
  }

  /** The wide feature row per key as of bucket boundary `asOfUs`: one
    * serve per distinct (measure, window), feature columns renamed to
    * their DSL names, assembled with bounded key-frame joins. Keys
    * with no qualifying rows in a feature's window carry null there
    * (the left-join feature-vector contract).
    *
    * `derived` features (J5, the reference's derivation DAG —
    * feathr-rs/src/feature.rs:319-328) are evaluated AFTER assembly as
    * `withColumn`s over the wide row in topological order — a derived
    * feature is a pure per-key function of its inputs, so the O(delta)
    * path maintains only anchor partials and pays nothing extra at
    * refresh time. Cross-key derivations (inputs bound under a
    * different key alias than the store's) are refused by name: the
    * incremental snapshot holds ONE key frame, so re-binding a feature
    * under a second key needs the batch join planner's alias joins.
    */
  def snapshot(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, asOfUs: Long,
      derived: Seq[DerivedFeature] = Nil): DataFrame = {
    require(features.nonEmpty, "no features to snapshot")
    val plans = features.map(f => (f, planOf(f, bucketUs)))
    requireRefreshComplete(spark, root,
      plans.map { case (_, (m, _, _)) => storeDir(root, m) }.distinct)
    val served = plans.groupBy { case (_, (m, w, _)) => (m, w) }
      .map { case ((m, w), fs) =>
        val base = m.kind match {
          case Scalar => IncrementalSwa.serve(spark, storeDir(root, m),
            cfg(keyCols, tsCol, bucketUs), asOfUs, w)
          case SetUnion => IncrementalUnion.serve(spark, storeDir(root, m),
            IncrementalUnion.Config(keyCols, tsCol, "__graft_m", bucketUs),
            asOfUs, w)
          case Vector => IncrementalVector.serve(spark, storeDir(root, m),
            IncrementalVector.Config(keyCols, tsCol, "__graft_m", bucketUs),
            asOfUs, w)
        }
        val cols = keyCols.map(col) ++ fs.map { case (f, (_, _, agg)) =>
          col(aggCol(agg)).as(f.name)
        }
        base.select(cols: _*)
      }.toSeq
    applyDerived(assembleWide(served, keyCols), features, derived)
  }

  /** STATE time travel for the whole feature set: the wide feature row
    * exactly as refresh version `asOfVersion` served it at bucket
    * boundary `asOfUs` — every store truncated to partials of versions
    * <= `asOfVersion` ([[IncrementalSwa.serveAsOf]]'s contract per
    * kind, compaction-rebased versions refused by name). The
    * reproducibility surface a backfill audit reaches for: "what did
    * the features say after last Tuesday's refresh", answered from
    * retained state, never recomputed from raw events. Derived
    * features evaluate per row as in [[snapshot]]; the torn-refresh
    * check applies only to markers AT OR BELOW the version boundary
    * (a tear above it is excluded by the truncation itself).
    */
  def snapshotAsOf(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, asOfUs: Long, asOfVersion: Long,
      derived: Seq[DerivedFeature] = Nil): DataFrame = {
    require(features.nonEmpty, "no features to snapshot")
    val plans = features.map(f => (f, planOf(f, bucketUs)))
    requireRefreshCompleteUpTo(spark, root,
      plans.map { case (_, (m, _, _)) => storeDir(root, m) }.distinct,
      asOfVersion)
    val served = plans.groupBy { case (_, (m, w, _)) => (m, w) }
      .map { case ((m, w), fs) =>
        val base = m.kind match {
          case Scalar => IncrementalSwa.serveAsOf(spark, storeDir(root, m),
            cfg(keyCols, tsCol, bucketUs), asOfUs, w, asOfVersion)
          case SetUnion => IncrementalUnion.serveAsOf(spark,
            storeDir(root, m),
            IncrementalUnion.Config(keyCols, tsCol, "__graft_m", bucketUs),
            asOfUs, w, asOfVersion)
          case Vector => IncrementalVector.serveAsOf(spark,
            storeDir(root, m),
            IncrementalVector.Config(keyCols, tsCol, "__graft_m", bucketUs),
            asOfUs, w, asOfVersion)
        }
        base.select(keyCols.map(col) ++ fs.map { case (f, (_, _, agg)) =>
          col(aggCol(agg)).as(f.name)
        }: _*)
      }.toSeq
    applyDerived(assembleWide(served, keyCols), features, derived)
  }

  /** The feature TABLE over time for the whole feature set: one row
    * per key × bucket, every feature's window aggregate as served at
    * that bucket's boundary, derived features evaluated per row — the
    * keys×days table a training pipeline actually consumes, assembled
    * from ONE `serveDaily` state pass per distinct (measure, window)
    * instead of N×features [[snapshot]] calls (axes 25/28: the per-day
    * serve loop is linear in days; the daily passes are flat). Keys
    * with no qualifying rows in a feature's window at a bucket carry
    * null there (the [[snapshot]] left-join contract, now per bucket).
    *
    * Buckets outside a feature's state range simply have no rows from
    * that store — the spine is the UNION of the stores' (key, bucket)
    * domains, so a feature set mixing windows stays assemblable.
    * Retention: each store excludes its horizon-incomplete rows by
    * default ([[IncrementalSwa.serveDaily]]'s erased ≠ empty posture);
    * `includeHorizonPartialRows` opts every store into left-edge
    * semantics at once.
    */
  def snapshotDaily(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, derived: Seq[DerivedFeature] = Nil,
      includeHorizonPartialRows: Boolean = false,
      throughBucket: Option[Long] = None): DataFrame = {
    require(features.nonEmpty, "no features to snapshot")
    val plans = features.map(f => (f, planOf(f, bucketUs)))
    requireRefreshComplete(spark, root,
      plans.map { case (_, (m, _, _)) => storeDir(root, m) }.distinct)
    val joinCols = keyCols :+ "bucket"
    val served = plans.groupBy { case (_, (m, w, _)) => (m, w) }
      .map { case ((m, w), fs) =>
        val base = m.kind match {
          case Scalar => IncrementalSwa.serveDaily(spark, storeDir(root, m),
            cfg(keyCols, tsCol, bucketUs), w, includeHorizonPartialRows,
            throughBucket)
          case SetUnion => IncrementalUnion.serveDaily(spark,
            storeDir(root, m),
            IncrementalUnion.Config(keyCols, tsCol, "__graft_m", bucketUs),
            w, includeHorizonPartialRows, throughBucket)
          case Vector => IncrementalVector.serveDaily(spark,
            storeDir(root, m),
            IncrementalVector.Config(keyCols, tsCol, "__graft_m", bucketUs),
            w, includeHorizonPartialRows, throughBucket)
        }
        base.select(joinCols.map(col) ++ fs.map { case (f, (_, _, agg)) =>
          col(aggCol(agg)).as(f.name)
        }: _*)
      }.toSeq
    applyDerived(assembleWide(served, joinCols), features, derived)
  }

  /** The leak-free training table for the feature set: every
    * observation joined against the feature row of the PRECEDING
    * bucket — an observation at time t in bucket b sees aggregates
    * over events strictly before b's start (≤ t by construction), so
    * no feature ever contains the observation's own bucket. One
    * [[snapshotDaily]] pass serves every observation date; the
    * events/state are never rescanned per observation
    * (the store-level `q_training_set_state` contract, lifted to the
    * whole feature set). Observations whose preceding bucket has no
    * feature row keep nulls (left join — cold-start rows are the
    * trainer's decision, not silently dropped).
    */
  def trainingSet(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, observations: DataFrame, obsTsCol: String,
      derived: Seq[DerivedFeature] = Nil,
      graftFeatures: Seq[GraftFeature] = Nil): DataFrame = {
    require(features.nonEmpty || graftFeatures.nonEmpty,
      "no features to assemble")
    require(features.nonEmpty || derived.isEmpty,
      s"derived feature(s) ${derived.map(_.name)} need anchor features " +
        "to evaluate over — the extension columns are a separate " +
        "namespace; declare at least one anchor feature or drop the " +
        "derivations")
    // the daily tables end at the state's last event bucket by
    // default, but observations may arrive AFTER it (quiet days, late
    // observation feeds) while their windows still reach real state —
    // extend every store's emitted range to the latest observation's
    // preceding bucket so those rows get their genuine aggregates, not
    // silent cold-start nulls (one tiny driver read of the obs frame)
    val obsHi = observations
      .agg(max(IncrementalSwa.bucketOf(col(obsTsCol), bucketUs))).head()
    val through =
      if (obsHi.isNullAt(0)) None else Some(obsHi.getLong(0) - 1L)
    // reference-enum and extension features each assemble their own
    // daily table; the training spine is the union of the two (key,
    // bucket) domains, so an observation keeps its graft columns even
    // at buckets where no anchor feature has rows (and vice versa).
    // Derived features stay anchor-only — the extension columns are a
    // separate namespace by design.
    val parts = Seq(
      if (features.nonEmpty)
        Some(snapshotDaily(spark, root, features, keyCols, tsCol,
          bucketUs, derived, throughBucket = through))
      else None,
      if (graftFeatures.nonEmpty)
        Some(snapshotDailyGraft(spark, root, graftFeatures, keyCols, tsCol,
          bucketUs, throughBucket = through))
      else None).flatten
    val joinCols = keyCols :+ "bucket"
    val daily = assembleWide(parts, joinCols)
      .withColumnRenamed("bucket", "__feature_bucket")
    val obs = observations.withColumn("__feature_bucket",
      IncrementalSwa.bucketOf(col(obsTsCol), bucketUs) - 1L)
    obs.join(daily, keyCols :+ "__feature_bucket", "left_outer")
      .drop("__feature_bucket")
  }

  /** The served column a reference aggregation reads from its store's
    * serve/serveDaily output — shared by [[snapshot]] and
    * [[snapshotDaily]] so the two assemblies cannot drift.
    */
  private def aggCol(agg: Aggregation): String = agg match {
    case Aggregation.SUM => "f_sum"
    case Aggregation.COUNT => "f_cnt"
    case Aggregation.AVG => "f_avg"
    case Aggregation.MIN => "f_min"
    case Aggregation.MAX => "f_max"
    case Aggregation.LATEST => "f_latest"
    case Aggregation.UNION => "f_union"
    case Aggregation.ELEMENTWISE_SUM => "f_esum"
    case Aggregation.ELEMENTWISE_AVG => "f_eavg"
    case Aggregation.ELEMENTWISE_MIN => "f_emin"
    case Aggregation.ELEMENTWISE_MAX => "f_emax"
    case other => throw new IllegalStateException(
      s"unreachable: $other passed kindOf")
  }

  /** One (measure, kind) maintenance dispatch — the shared loop under
    * [[compact]]/[[compactRetaining]]/[[forgetKeys]]: the same
    * measure-dedup as [[refresh]], one store-level call per distinct
    * (defExpr, filter, kind).
    */
  private def eachStore(root: String, features: Seq[AnchorFeature],
      keyCols: Seq[String], tsCol: String, bucketUs: Long, unionCap: Int)(
      onScalar: (String, IncrementalSwa.Config) => Unit,
      onUnion: (String, IncrementalUnion.Config) => Unit,
      onVector: (String, IncrementalVector.Config) => Unit): Unit = {
    require(features.nonEmpty, "no features to maintain")
    // independent stores → concurrent maintenance actions (compact /
    // retain / forget each fold one dir under its own lease)
    Par.run(features.map(planOf(_, bucketUs)._1).distinct.map { m => () =>
      val dir = storeDir(root, m)
      m.kind match {
        case Scalar => onScalar(dir, cfg(keyCols, tsCol, bucketUs))
        case SetUnion => onUnion(dir,
          IncrementalUnion.Config(keyCols, tsCol, "__graft_m", bucketUs,
            unionCap))
        case Vector => onVector(dir,
          IncrementalVector.Config(keyCols, tsCol, "__graft_m", bucketUs))
      }
    }: _*)
  }

  /** Operational snapshot of every measure store in the feature set —
    * [[IncrementalSwa.describe]] per store, keyed by the features that
    * share it (the "is tonight's compaction needed / who holds the
    * lease / how much history is the horizon carrying" dashboard read;
    * all driver-side metadata, no Spark job).
    */
  def describe(spark: SparkSession, root: String,
      features: Seq[AnchorFeature],
      bucketUs: Long): Seq[(Seq[String], IncrementalSwa.StoreInfo)] = {
    require(features.nonEmpty, "no features to describe")
    features.map(f => (f, planOf(f, bucketUs)._1))
      .groupBy(_._2).toSeq
      .map { case (m, fs) =>
        (fs.map(_._1.name), IncrementalSwa.describe(spark, storeDir(root, m)))
      }
  }

  /** Compact every measure store of the feature set — the nightly
    * maintenance action, one atomic generation fold per store. Pass
    * the SAME `unionCap` the set was refreshed with, or the UNION
    * folds are cap-checked against the wrong bound.
    */
  def compact(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, unionCap: Int = 10000): Unit = {
    requireNoTornForMaintenance(spark, root,
      features.map(f => storeDir(root, planOf(f, bucketUs)._1)).distinct)
    eachStore(root, features, keyCols, tsCol, bucketUs, unionCap)(
      IncrementalSwa.compact(spark, _, _),
      IncrementalUnion.compact(spark, _, _),
      IncrementalVector.compact(spark, _, _))
  }

  /** Retention across every measure store: state bounded by the
    * serving horizon for the WHOLE feature set
    * ([[IncrementalSwa.compactRetaining]]'s contract per store —
    * serves below the horizon fail by name). Same `unionCap`
    * discipline as [[compact]].
    */
  def compactRetaining(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, minBucket: Long, unionCap: Int = 10000): Unit = {
    requireNoTornForMaintenance(spark, root,
      features.map(f => storeDir(root, planOf(f, bucketUs)._1)).distinct)
    eachStore(root, features, keyCols, tsCol, bucketUs, unionCap)(
      IncrementalSwa.compactRetaining(spark, _, _, minBucket),
      IncrementalUnion.compactRetaining(spark, _, _, minBucket),
      IncrementalVector.compactRetaining(spark, _, _, minBucket))
  }

  /** GDPR erasure across every measure store: "delete these keys from
    * every feature" in one call — each store folds the keys' whole
    * history away atomically ([[IncrementalSwa.forgetKeys]]; the
    * UNION store skips its cap check here by design, so erasure is
    * never blocked by over-cap state).
    */
  def forgetKeys(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, keys: DataFrame): Unit =
    eachStore(root, features, keyCols, tsCol, bucketUs, unionCap = Int.MaxValue)(
      IncrementalSwa.forgetKeys(spark, _, _, keys),
      IncrementalUnion.forgetKeys(spark, _, _, keys),
      IncrementalVector.forgetKeys(spark, _, _, keys))

  /** The nightly-maintenance decision rules [[maintain]] applies to
    * every store of a feature set — the runbook as one idempotent
    * call instead of N manual compact/gc/retention invocations:
    *
    *   - fold the version tail when the live generation holds MORE
    *     than `compactWhenVersionsExceed` version partitions (read
    *     amplification bound);
    *   - [[Publish.gc]] all but the newest `gcKeepGenerations`
    *     committed generations (the reader-lease window —
    *     Delta/Iceberg's vacuum contract);
    *   - when `retainFromBucket` is set and differs from the store's
    *     recorded horizon, run a retention compaction at it (an
    *     explicit horizon REPLACES the recorded one — the
    *     [[IncrementalSwa.compactRetaining]] contract).
    *
    * Idempotent by construction: a second run under the same policy
    * finds ≤ 1 version partition, the horizon already recorded, and
    * nothing to collect — no new generation is created.
    */
  case class MaintenancePolicy(compactWhenVersionsExceed: Int = 8,
      gcKeepGenerations: Int = 2, retainFromBucket: Option[Long] = None) {
    require(compactWhenVersionsExceed >= 1,
      s"compactWhenVersionsExceed must be >= 1: $compactWhenVersionsExceed")
    require(gcKeepGenerations >= 1,
      s"gcKeepGenerations must keep the live generation: $gcKeepGenerations")
  }

  /** What [[maintain]] did to one store — the runbook's audit line.
    * `blockedByTornRefresh` names the pending refresh version whose
    * tear made folding this store unsafe (folding would rebase the
    * torn version and make the replay repair impossible) — the policy
    * SKIPS the fold there, gc still runs, and the nightly cron keeps
    * going for the rest of the set.
    */
  case class MaintenanceAction(dir: String, features: Seq[String],
      compacted: Boolean, horizonSet: Option[Long],
      generationsCollected: Int,
      blockedByTornRefresh: Option[Long] = None)

  /** Stores covered by a TORN pending refresh → the torn version: the
    * set [[maintainOne]] must not fold ([[requireNoTornForMaintenance]]'s
    * rationale, as a skip-list for the policy runner).
    */
  private def tornCoveredDirs(spark: SparkSession,
      root: String): Map[String, Long] =
    pending(spark, root).flatMap { case (v, rel) =>
      val dirs = rel.map(r => s"$root/$r")
      if (dirs.exists(d => !holdsVersion(spark, d, v))) dirs.map(_ -> v)
      else Nil
    }.toMap

  /** The shared per-store policy step: describe (driver-side), decide,
    * act under the store's own lease, gc. A retention need subsumes the
    * version-count fold (compactRetaining IS a compaction).
    */
  private def maintainOne(spark: SparkSession, dir: String,
      featNames: Seq[String], policy: MaintenancePolicy,
      torn: Option[Long],
      compactStore: () => Unit, retainStore: Long => Unit): MaintenanceAction = {
    val info = IncrementalSwa.describe(spark, dir)
    val hasState = info.versions.nonEmpty
    val needRetain = policy.retainFromBucket
      .filter(mb => hasState && !info.retainedFrom.contains(mb))
      .filter(_ => torn.isEmpty)
    val needCompact = torn.isEmpty &&
      info.versions.size > policy.compactWhenVersionsExceed
    needRetain match {
      case Some(mb) => retainStore(mb)
      case None => if (needCompact) compactStore()
    }
    // gc is fold-free (it drops SUPERSEDED generations; the live one —
    // where any torn version lives — is never collected), so it runs
    // even for skipped stores
    val before = Publish.committed(spark, dir).size
    Publish.gc(spark, dir, policy.gcKeepGenerations)
    MaintenanceAction(dir, featNames,
      compacted = needRetain.isDefined || needCompact,
      horizonSet = needRetain,
      generationsCollected = before - Publish.committed(spark, dir).size,
      blockedByTornRefresh = torn)
  }

  private def runCollect(
      steps: Seq[() => MaintenanceAction]): Seq[MaintenanceAction] = {
    val out = new Array[MaintenanceAction](steps.size)
    Par.run(steps.zipWithIndex.map { case (f, i) =>
      () => { out(i) = f() }: Unit }: _*)
    out.toSeq
  }

  /** Apply `policy` to every measure store of the feature set — ONE
    * idempotent call per set per night ([[MaintenancePolicy]]),
    * stores maintained concurrently under their own leases. Returns
    * the per-store audit.
    */
  def maintain(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, policy: MaintenancePolicy,
      unionCap: Int = 10000): Seq[MaintenanceAction] = {
    require(features.nonEmpty, "no features to maintain")
    val uCfg = IncrementalUnion.Config(keyCols, tsCol, "__graft_m",
      bucketUs, unionCap)
    val vCfg = IncrementalVector.Config(keyCols, tsCol, "__graft_m", bucketUs)
    val torn = tornCoveredDirs(spark, root)
    runCollect(features.map(f => (planOf(f, bucketUs)._1, f.name))
      .groupBy(_._1).toSeq.map { case (m, fs) => () =>
        val dir = storeDir(root, m)
        maintainOne(spark, dir, fs.map(_._2), policy, torn.get(dir),
          compactStore = () => m.kind match {
            case Scalar =>
              IncrementalSwa.compact(spark, dir, cfg(keyCols, tsCol, bucketUs))
            case SetUnion => IncrementalUnion.compact(spark, dir, uCfg)
            case Vector => IncrementalVector.compact(spark, dir, vCfg)
          },
          retainStore = mb => m.kind match {
            case Scalar => IncrementalSwa.compactRetaining(spark, dir,
              cfg(keyCols, tsCol, bucketUs), mb)
            case SetUnion =>
              IncrementalUnion.compactRetaining(spark, dir, uCfg, mb)
            case Vector =>
              IncrementalVector.compactRetaining(spark, dir, vCfg, mb)
          })
      })
  }

  /** [[maintain]] across every extension-feature store. */
  def maintainGraft(spark: SparkSession, root: String,
      features: Seq[GraftFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, policy: MaintenancePolicy): Seq[MaintenanceAction] = {
    require(features.nonEmpty, "no features to maintain")
    val torn = tornCoveredDirs(spark, root)
    runCollect(features.groupBy(graftDir(root, _)).toSeq.map {
      case (dir, fs) => () =>
        def cfgD(p: Int) = IncrementalDistinct.Config(keyCols, tsCol,
          "__graft_m", bucketUs, p)
        def cfgQ(lo: Double, hi: Double, bins: Int) =
          IncrementalQuantile.Config(keyCols, tsCol, "__graft_m",
            bucketUs, lo, hi, bins)
        def cfgT(cand: Int) = IncrementalTopK.Config(keyCols, tsCol,
          "__graft_m", bucketUs, cand)
        maintainOne(spark, dir, fs.map(_.name), policy, torn.get(dir),
          compactStore = () => fs.head.agg match {
            case GraftAggregation.DistinctCount(p) =>
              IncrementalDistinct.compact(spark, dir, cfgD(p))
            case GraftAggregation.Quantile(_, lo, hi, bins) =>
              IncrementalQuantile.compact(spark, dir, cfgQ(lo, hi, bins))
            case GraftAggregation.TopK(_, cand) =>
              IncrementalTopK.compact(spark, dir, cfgT(cand))
          },
          retainStore = mb => fs.head.agg match {
            case GraftAggregation.DistinctCount(p) =>
              IncrementalDistinct.compactRetaining(spark, dir, cfgD(p), mb)
            case GraftAggregation.Quantile(_, lo, hi, bins) =>
              IncrementalQuantile.compactRetaining(spark, dir,
                cfgQ(lo, hi, bins), mb)
            case GraftAggregation.TopK(_, cand) =>
              IncrementalTopK.compactRetaining(spark, dir, cfgT(cand), mb)
          })
      })
  }

  /** [[maintain]] across every binding of a multi-key feature set. */
  def maintainMulti(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], tsCol: String, bucketUs: Long,
      policy: MaintenancePolicy,
      unionCap: Int = 10000): Seq[MaintenanceAction] = {
    require(features.nonEmpty, "no features to maintain")
    requireDistinctAliases(features)
    features.groupBy(bindingOf).toSeq.flatMap { case (b, fs) =>
      maintain(spark, bindingRoot(root, b), fs, b.map(_._2), tsCol,
        bucketUs, policy, unionCap)
    }
  }

  // ------------------------------------------------------------------
  // GraftAggregation extension features (beyond the reference enum):
  // distinct-count / quantile / top-k features declared against the
  // same (defExpr, filter, window) surface, maintained by the
  // sketch/histogram/candidate stores through the same lifecycle.
  // ------------------------------------------------------------------

  /** A declared extension feature ([[graft.model.GraftAggregation]]):
    * the engine's own windowed-aggregation kinds, riding the same
    * measure surface (`defExpr` + optional pre-agg `filter`) and
    * whole-bucket window rule as the reference aggregations. `keys`
    * (the reference's `TypedKey` bindings) are consulted only by the
    * Multi surface — the single-binding calls take explicit `keyCols`
    * and a Multi call refuses a feature that declares no binding.
    */
  case class GraftFeature(name: String, defExpr: String,
      agg: GraftAggregation, window: java.time.Duration,
      filter: Option[String] = None,
      keys: Seq[graft.model.TypedKey] = Nil)

  /** Store identity for an extension feature: (defExpr, filter, STATE
    * config). Serve-time parameters are excluded — quantile features
    * differing only in `q` and top-k features differing only in `k`
    * share one store.
    */
  private def graftStoreKey(f: GraftFeature): String = f.agg match {
    case GraftAggregation.DistinctCount(p) => s"dc|$p"
    case GraftAggregation.Quantile(_, lo, hi, bins) => s"qt|$lo|$hi|$bins"
    case GraftAggregation.TopK(_, cand) => s"tk|$cand"
  }

  private def graftDir(root: String, f: GraftFeature): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val id = md.digest(
      s"${f.defExpr}|${f.filter.getOrElse("")}|${graftStoreKey(f)}"
        .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    s"$root/g=$id"
  }

  private def graftWindow(f: GraftFeature, bucketUs: Long): Int = {
    val winUs = Durations.toMicros(f.window)
    require(winUs % bucketUs == 0 && winUs > 0,
      s"feature '${f.name}': window ${f.window} is not a whole multiple " +
        s"of the ${bucketUs}µs maintenance bucket")
    (winUs / bucketUs).toInt
  }

  /** [[refresh]] for extension features: one delta fold per distinct
    * (defExpr, filter, state-config) store, routed by aggregation kind.
    */
  def refreshGraft(delta: DataFrame, root: String,
      features: Seq[GraftFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, version: Long): Unit = {
    require(features.nonEmpty, "no features to refresh")
    features.foreach(graftWindow(_, bucketUs)) // validate up front
    // the same set-level commit marker as [[refresh]] — one fan-out,
    // one torn-refresh refusal surface
    markPending(delta.sparkSession, root, version,
      features.map(graftDir(root, _)).distinct
        .map(_.stripPrefix(s"$root/")))
    Par.run(features.groupBy(graftDir(root, _)).toSeq.map { case (dir, fs) => () =>
      val f = fs.head
      val filtered = f.filter.map(delta.where(_)).getOrElse(delta)
      val measured = filtered.withColumn("__graft_m", expr(f.defExpr))
        .select((keyCols :+ tsCol :+ "__graft_m").map(col): _*)
      f.agg match {
        case GraftAggregation.DistinctCount(p) =>
          IncrementalDistinct.ingest(measured, dir,
            IncrementalDistinct.Config(keyCols, tsCol, "__graft_m",
              bucketUs, p), version)
        case GraftAggregation.Quantile(_, lo, hi, bins) =>
          IncrementalQuantile.ingest(measured, dir,
            IncrementalQuantile.Config(keyCols, tsCol, "__graft_m",
              bucketUs, lo, hi, bins), version)
        case GraftAggregation.TopK(_, cand) =>
          IncrementalTopK.ingest(measured, dir,
            IncrementalTopK.Config(keyCols, tsCol, "__graft_m",
              bucketUs, cand), version)
      }
    }: _*)
    clearPending(delta.sparkSession, root, version)
  }

  /** The wide extension-feature row per key as of `asOfUs` — one serve
    * per (store, window) group (quantile features sharing a store and
    * window ride ONE `serveQuantiles` call with all their `q`s; top-k
    * features one `serveTopK` at the largest `k`), assembled with the
    * same spine/left-join contract as [[snapshot]]. Feature columns:
    * DistinctCount → the raw HLL estimate (`est_raw`); Quantile → the
    * bin left edge in value space; TopK → the rank-ordered item array.
    */
  def snapshotGraft(spark: SparkSession, root: String,
      features: Seq[GraftFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, asOfUs: Long): DataFrame = {
    require(features.nonEmpty, "no features to snapshot")
    requireRefreshComplete(spark, root,
      features.map(graftDir(root, _)).distinct)
    val served = features
      .groupBy(f => (graftDir(root, f), graftWindow(f, bucketUs)))
      .flatMap { case ((dir, w), fs) =>
        fs.head.agg match {
          case GraftAggregation.DistinctCount(p) =>
            val base = IncrementalDistinct.serveDistinct(spark, dir,
              IncrementalDistinct.Config(keyCols, tsCol, "__graft_m",
                bucketUs, p), asOfUs, w)
            Seq(base.select(keyCols.map(col) ++
              fs.map(f => col("est_raw").as(f.name)): _*))
          case GraftAggregation.Quantile(_, lo, hi, bins) =>
            val qs = fs.map(_.agg.asInstanceOf[GraftAggregation.Quantile].q)
              .distinct
            val base = IncrementalQuantile.serveQuantiles(spark, dir,
              IncrementalQuantile.Config(keyCols, tsCol, "__graft_m",
                bucketUs, lo, hi, bins), asOfUs, w, qs)
            fs.map { f =>
              val q = f.agg.asInstanceOf[GraftAggregation.Quantile].q
              val q10k = math.rint(q * 10000).toLong / 10000.0
              base.where(col("q") === q10k)
                .select(keyCols.map(col) :+ col("cutoff").as(f.name): _*)
            }
          case GraftAggregation.TopK(_, cand) =>
            val kMax = fs.map(_.agg.asInstanceOf[GraftAggregation.TopK].k).max
            val base = IncrementalTopK.serveTopK(spark, dir,
              IncrementalTopK.Config(keyCols, tsCol, "__graft_m",
                bucketUs, cand), asOfUs, w, kMax)
            fs.map { f =>
              val k = f.agg.asInstanceOf[GraftAggregation.TopK].k
              base.where(col("rank") <= k)
                .groupBy(keyCols.map(col): _*)
                .agg(transform(
                  array_sort(collect_list(struct(col("rank"), col("item")))),
                  _.getField("item")).as(f.name))
            }
        }
      }.toSeq
    assembleWide(served, keyCols)
  }

  /** [[snapshotAsOf]] for extension features: the wide
    * distinct/quantile/top-k row exactly as refresh version
    * `asOfVersion` served it — the same store/window grouping and
    * serve-parameter sharing as [[snapshotGraft]], truncated by each
    * sketch store's own serveAsOf.
    */
  def snapshotGraftAsOf(spark: SparkSession, root: String,
      features: Seq[GraftFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, asOfUs: Long, asOfVersion: Long): DataFrame = {
    require(features.nonEmpty, "no features to snapshot")
    requireRefreshCompleteUpTo(spark, root,
      features.map(graftDir(root, _)).distinct, asOfVersion)
    val served = features
      .groupBy(f => (graftDir(root, f), graftWindow(f, bucketUs)))
      .flatMap { case ((dir, w), fs) =>
        fs.head.agg match {
          case GraftAggregation.DistinctCount(p) =>
            val base = IncrementalDistinct.serveAsOf(spark, dir,
              IncrementalDistinct.Config(keyCols, tsCol, "__graft_m",
                bucketUs, p), asOfUs, w, asOfVersion)
            Seq(base.select(keyCols.map(col) ++
              fs.map(f => col("est_raw").as(f.name)): _*))
          case GraftAggregation.Quantile(_, lo, hi, bins) =>
            val qs = fs.map(_.agg.asInstanceOf[GraftAggregation.Quantile].q)
              .distinct
            val base = IncrementalQuantile.serveAsOf(spark, dir,
              IncrementalQuantile.Config(keyCols, tsCol, "__graft_m",
                bucketUs, lo, hi, bins), asOfUs, w, qs, asOfVersion)
            fs.map { f =>
              val q = f.agg.asInstanceOf[GraftAggregation.Quantile].q
              val q10k = math.rint(q * 10000).toLong / 10000.0
              base.where(col("q") === q10k)
                .select(keyCols.map(col) :+ col("cutoff").as(f.name): _*)
            }
          case GraftAggregation.TopK(_, cand) =>
            val kMax = fs.map(_.agg.asInstanceOf[GraftAggregation.TopK].k).max
            val base = IncrementalTopK.serveAsOf(spark, dir,
              IncrementalTopK.Config(keyCols, tsCol, "__graft_m",
                bucketUs, cand), asOfUs, w, kMax, asOfVersion)
            fs.map { f =>
              val k = f.agg.asInstanceOf[GraftAggregation.TopK].k
              base.where(col("rank") <= k)
                .groupBy(keyCols.map(col): _*)
                .agg(transform(
                  array_sort(collect_list(struct(col("rank"), col("item")))),
                  _.getField("item")).as(f.name))
            }
        }
      }.toSeq
    assembleWide(served, keyCols)
  }

  /** [[snapshotDaily]] for extension features: the keys×days table of
    * every distinct-count / quantile / top-k feature, one store-level
    * `serveDaily` pass per (store, window) group (the stores' honest
    * explode-expansion — axis 28), assembled on (key, bucket) with the
    * same spine/left-join contract as [[snapshotGraft]].
    */
  def snapshotDailyGraft(spark: SparkSession, root: String,
      features: Seq[GraftFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, includeHorizonPartialRows: Boolean = false,
      throughBucket: Option[Long] = None): DataFrame = {
    require(features.nonEmpty, "no features to snapshot")
    requireRefreshComplete(spark, root,
      features.map(graftDir(root, _)).distinct)
    val joinCols = keyCols :+ "bucket"
    val served = features
      .groupBy(f => (graftDir(root, f), graftWindow(f, bucketUs)))
      .flatMap { case ((dir, w), fs) =>
        fs.head.agg match {
          case GraftAggregation.DistinctCount(p) =>
            val base = IncrementalDistinct.serveDaily(spark, dir,
              IncrementalDistinct.Config(keyCols, tsCol, "__graft_m",
                bucketUs, p), w, includeHorizonPartialRows, throughBucket)
            Seq(base.select(joinCols.map(col) ++
              fs.map(f => col("est_raw").as(f.name)): _*))
          case GraftAggregation.Quantile(_, lo, hi, bins) =>
            val qs = fs.map(_.agg.asInstanceOf[GraftAggregation.Quantile].q)
              .distinct
            val base = IncrementalQuantile.serveDaily(spark, dir,
              IncrementalQuantile.Config(keyCols, tsCol, "__graft_m",
                bucketUs, lo, hi, bins), w, qs, includeHorizonPartialRows,
              throughBucket)
            fs.map { f =>
              val q = f.agg.asInstanceOf[GraftAggregation.Quantile].q
              val q10k = math.rint(q * 10000).toLong / 10000.0
              base.where(col("q") === q10k)
                .select(joinCols.map(col) :+ col("cutoff").as(f.name): _*)
            }
          case GraftAggregation.TopK(_, cand) =>
            val kMax = fs.map(_.agg.asInstanceOf[GraftAggregation.TopK].k).max
            val base = IncrementalTopK.serveDaily(spark, dir,
              IncrementalTopK.Config(keyCols, tsCol, "__graft_m",
                bucketUs, cand), w, kMax, includeHorizonPartialRows,
              throughBucket)
            fs.map { f =>
              val k = f.agg.asInstanceOf[GraftAggregation.TopK].k
              base.where(col("rank") <= k)
                .groupBy(joinCols.map(col): _*)
                .agg(transform(
                  array_sort(collect_list(struct(col("rank"), col("item")))),
                  _.getField("item")).as(f.name))
            }
        }
      }.toSeq
    assembleWide(served, joinCols)
  }

  /** The shared maintenance dispatch over every extension store. */
  private def eachGraftStore(root: String, features: Seq[GraftFeature],
      keyCols: Seq[String], tsCol: String, bucketUs: Long)(
      onDistinct: (String, IncrementalDistinct.Config) => Unit,
      onQuantile: (String, IncrementalQuantile.Config) => Unit,
      onTopK: (String, IncrementalTopK.Config) => Unit): Unit = {
    require(features.nonEmpty, "no features to maintain")
    Par.run(features.groupBy(graftDir(root, _)).toSeq.map { case (dir, fs) => () =>
      fs.head.agg match {
        case GraftAggregation.DistinctCount(p) =>
          onDistinct(dir, IncrementalDistinct.Config(keyCols, tsCol,
            "__graft_m", bucketUs, p))
        case GraftAggregation.Quantile(_, lo, hi, bins) =>
          onQuantile(dir, IncrementalQuantile.Config(keyCols, tsCol,
            "__graft_m", bucketUs, lo, hi, bins))
        case GraftAggregation.TopK(_, cand) =>
          onTopK(dir, IncrementalTopK.Config(keyCols, tsCol,
            "__graft_m", bucketUs, cand))
      }
    }: _*)
  }

  /** [[describe]] across every extension store — the same dashboard
    * read keyed by the features sharing each store.
    */
  def describeGraft(spark: SparkSession, root: String,
      features: Seq[GraftFeature]): Seq[(Seq[String], IncrementalSwa.StoreInfo)] = {
    require(features.nonEmpty, "no features to describe")
    features.groupBy(graftDir(root, _)).toSeq.map { case (dir, fs) =>
      (fs.map(_.name), IncrementalSwa.describe(spark, dir))
    }
  }

  /** [[compact]] across every extension store. */
  def compactGraft(spark: SparkSession, root: String,
      features: Seq[GraftFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long): Unit = {
    requireNoTornForMaintenance(spark, root,
      features.map(graftDir(root, _)).distinct)
    eachGraftStore(root, features, keyCols, tsCol, bucketUs)(
      IncrementalDistinct.compact(spark, _, _),
      IncrementalQuantile.compact(spark, _, _),
      IncrementalTopK.compact(spark, _, _))
  }

  /** [[compactRetaining]] across every extension store. */
  def compactRetainingGraft(spark: SparkSession, root: String,
      features: Seq[GraftFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, minBucket: Long): Unit = {
    requireNoTornForMaintenance(spark, root,
      features.map(graftDir(root, _)).distinct)
    eachGraftStore(root, features, keyCols, tsCol, bucketUs)(
      IncrementalDistinct.compactRetaining(spark, _, _, minBucket),
      IncrementalQuantile.compactRetaining(spark, _, _, minBucket),
      IncrementalTopK.compactRetaining(spark, _, _, minBucket))
  }

  /** [[forgetKeys]] across every extension store. Erasure is NOT
    * blocked by a torn refresh — GDPR wins. Consequence, accepted and
    * explicit: the erasure fold raises foldedThrough past the torn
    * version, so the stores then COUNT as holding it (the tear is
    * absorbed into the fold and the replay repair is no longer
    * possible) — an operator-initiated destructive action, not a
    * silent landing; re-ingest the missing delta under a fresh
    * version if it still matters.
    */
  def forgetKeysGraft(spark: SparkSession, root: String,
      features: Seq[GraftFeature], keyCols: Seq[String], tsCol: String,
      bucketUs: Long, keys: DataFrame): Unit =
    eachGraftStore(root, features, keyCols, tsCol, bucketUs)(
      IncrementalDistinct.forgetKeys(spark, _, _, keys),
      IncrementalQuantile.forgetKeys(spark, _, _, keys),
      IncrementalTopK.forgetKeys(spark, _, _, keys))

  // ------------------------------------------------------------------
  // Multi-binding feature sets (J4 on the O(delta) path): a project
  // mixing user-keyed and item-keyed WindowAgg features routes each
  // key binding to its own store root under `$root/k=<binding-id>` —
  // one incremental store still holds one key frame, the ROUTER holds
  // many. The reference's join contract is explicitly multi-query over
  // different keys (feathr-rs/src/project.rs:259-263,
  // feature_query.rs:5-10); the snapshot side assembles one wide frame
  // per binding, key columns exposed under their DSL aliases so a
  // FeatureQuery's key frame joins by name.
  // ------------------------------------------------------------------

  /** Binding identity: (alias, physical key column) pairs — two
    * features share a store root only when they agree on BOTH (same
    * alias over a different source column is a different frame).
    */
  private def bindingOf(f: AnchorFeature): Seq[(String, String)] =
    f.keys.map(k => (k.alias, k.keyColumn))

  /** Alias schemas must be UNIQUE across a set's bindings: the
    * snapshot map and [[forgetKeysMulti]] address key frames BY alias
    * (the FeatureQuery contract), so two bindings sharing an alias
    * schema over different physical columns would silently collapse to
    * one frame — refused by name instead.
    */
  private def requireDistinctAliases(features: Seq[AnchorFeature]): Unit =
    requireDistinctBindings(features.map(bindingOf))

  /** Alias schemas must resolve to ONE physical binding each — frames
    * (and the training join's observation columns) are addressed by
    * alias, so one alias over two physical columns would silently
    * join the wrong key space. Shared by both feature surfaces and by
    * their COMBINATION ([[trainingSetMulti]] — the one place
    * reference-enum and extension bindings meet).
    */
  private def requireDistinctBindings(
      bindings: Seq[Seq[(String, String)]]): Unit = {
    val collisions = bindings.distinct
      .groupBy(_.map(_._1)).filter(_._2.size > 1)
    require(collisions.isEmpty,
      collisions.map { case (alias, bs) =>
        s"key-alias schema $alias is bound to different physical " +
          s"columns ${bs.map(_.map(_._2))}"
      }.mkString("; ") +
        " — a feature set's alias schemas must be unambiguous (frames " +
        "are addressed by alias); re-alias one binding")
  }

  private def bindingRoot(root: String, b: Seq[(String, String)]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val id = md.digest(b.map { case (a, c) => s"$a=$c" }.mkString("|")
      .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"$root/k=$id"
  }

  /** [[refresh]] for a feature set spanning MULTIPLE key bindings: the
    * delta is folded once per binding group (each group pays its own
    * key shuffle — unavoidable, the groups aggregate over different
    * keys), with each feature's physical key columns taken from its
    * declared `TypedKey`s.
    */
  def refreshMulti(delta: DataFrame, root: String,
      features: Seq[AnchorFeature], tsCol: String, bucketUs: Long,
      version: Long, unionCap: Int = 10000): Unit = {
    require(features.nonEmpty, "no features to refresh")
    requireDistinctAliases(features)
    val groups = features.groupBy(bindingOf)
    // a TOP-level marker covers tears ACROSS bindings (binding A's
    // nested refresh completed and cleared ITS marker, binding B's
    // never started) — the nested per-binding markers cover tears
    // within one binding's fan-out
    markPending(delta.sparkSession, root, version,
      groups.toSeq.flatMap { case (b, fs) =>
        val bRel = bindingRoot(root, b).stripPrefix(s"$root/")
        fs.map(planOf(_, bucketUs)._1).distinct
          .map(m => s"$bRel/${m.kind.prefix}=${m.id}")
      })
    Par.run(groups.toSeq.map { case (b, fs) => () =>
      refresh(delta, bindingRoot(root, b), fs, b.map(_._2), tsCol,
        bucketUs, version, unionCap)
    }: _*)
    clearPending(delta.sparkSession, root, version)
  }

  /** One wide feature frame PER binding, key columns renamed to their
    * DSL aliases (the FeatureQuery key-frame contract), derived
    * features routed to the binding whose anchors (transitively) feed
    * them. A derived whose inputs span bindings is refused by name —
    * combining frames of different key spaces is the batch join
    * planner's job. Returns alias-schema → frame.
    */
  def snapshotMulti(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], tsCol: String, bucketUs: Long,
      asOfUs: Long,
      derived: Seq[DerivedFeature] = Nil): Map[Seq[String], DataFrame] = {
    require(features.nonEmpty, "no features to snapshot")
    requireDistinctAliases(features)
    val groups = features.groupBy(bindingOf)
    requireRefreshComplete(spark, root, multiAnchorDirs(root, groups, bucketUs))
    val claims = claimDerived(groups, derived)
    groups.map { case (b, fs) =>
      val frame = snapshot(spark, bindingRoot(root, b), fs, b.map(_._2),
        tsCol, bucketUs, asOfUs, claims(b))
      b.map(_._1) -> aliasKeys(frame, b)
    }
  }

  /** Claim derived features per binding by transitive closure over
    * (group anchors ∪ already-claimed derived); a derived whose inputs
    * span bindings (or reference features outside the set) is refused
    * by name.
    */
  private def claimDerived(
      groups: Map[Seq[(String, String)], Seq[AnchorFeature]],
      derived: Seq[DerivedFeature])
      : Map[Seq[(String, String)], Seq[DerivedFeature]] = {
    val claims = groups.map { case (b, fs) =>
      val names = scala.collection.mutable.Set(fs.map(_.name): _*)
      val claimed = scala.collection.mutable.ListBuffer.empty[DerivedFeature]
      var grew = true
      while (grew) {
        grew = false
        derived.filterNot(d => names.contains(d.name)).foreach { d =>
          if (d.inputs.forall(i => names.contains(i.featureName))) {
            names += d.name; claimed += d; grew = true
          }
        }
      }
      b -> claimed.toSeq
    }
    val unclaimed = derived.map(_.name)
      .diff(claims.values.flatten.map(_.name).toSeq)
    require(unclaimed.isEmpty,
      s"derived feature(s) $unclaimed draw inputs from more than one key " +
        "binding (or from features outside this set) — cross-binding " +
        "derivations combine different key spaces and need the batch " +
        "join planner (PointInTimeJoin with registerAlias)")
    claims
  }

  /** Absolute store dirs a Multi serve reads — the top-root tear
    * check's coverage ([[requireRefreshComplete]] against the marker
    * [[refreshMulti]] wrote across bindings).
    */
  private def multiAnchorDirs(root: String,
      groups: Map[Seq[(String, String)], Seq[AnchorFeature]],
      bucketUs: Long): Seq[String] =
    groups.toSeq.flatMap { case (b, fs) =>
      fs.map(f => storeDir(bindingRoot(root, b), planOf(f, bucketUs)._1))
    }.distinct

  private def multiGraftDirs(root: String,
      groups: Map[Seq[(String, String)], Seq[GraftFeature]]): Seq[String] =
    groups.toSeq.flatMap { case (b, fs) =>
      fs.map(graftDir(bindingRoot(root, b), _))
    }.distinct

  private def aliasKeys(frame: DataFrame,
      b: Seq[(String, String)]): DataFrame =
    b.foldLeft(frame) { case (acc, (alias, phys)) =>
      if (alias != phys) acc.withColumnRenamed(phys, alias) else acc
    }

  /** [[snapshotDaily]] per binding: alias-schema → keys×days frame,
    * derived features claimed exactly as [[snapshotMulti]].
    */
  def snapshotDailyMulti(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], tsCol: String, bucketUs: Long,
      derived: Seq[DerivedFeature] = Nil,
      includeHorizonPartialRows: Boolean = false,
      throughBucket: Option[Long] = None): Map[Seq[String], DataFrame] = {
    require(features.nonEmpty, "no features to snapshot")
    requireDistinctAliases(features)
    val groups = features.groupBy(bindingOf)
    requireRefreshComplete(spark, root, multiAnchorDirs(root, groups, bucketUs))
    val claims = claimDerived(groups, derived)
    groups.map { case (b, fs) =>
      val frame = snapshotDaily(spark, bindingRoot(root, b), fs, b.map(_._2),
        tsCol, bucketUs, claims(b), includeHorizonPartialRows, throughBucket)
      b.map(_._1) -> aliasKeys(frame, b)
    }
  }

  /** The multi-key training table: every observation joined against
    * the PRECEDING bucket's feature row of EVERY binding — one row per
    * observation carrying user-keyed AND item-keyed features at once,
    * each binding's daily table joined by its alias columns (which the
    * observation frame must carry — the FeatureQuery key contract).
    * The leak-free guarantee is per binding: every feature aggregates
    * events strictly before the observation's day.
    */
  def trainingSetMulti(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], tsCol: String, bucketUs: Long,
      observations: DataFrame, obsTsCol: String,
      derived: Seq[DerivedFeature] = Nil,
      graftFeatures: Seq[GraftFeature] = Nil): DataFrame = {
    require(features.nonEmpty || graftFeatures.nonEmpty,
      "no features to assemble")
    // alias schemas must be unambiguous ACROSS the two surfaces too —
    // this is the one assembly where they meet on one observation frame
    requireDistinctBindings(
      features.map(bindingOf) ++ graftFeatures.map(graftBindingOf))
    // and so must feature names: a using-columns join dedups only
    // keys, so a name shared across surfaces would emit two columns
    // and fail far downstream (AMBIGUOUS_REFERENCE / parquet write)
    val names = features.map(_.name) ++ derived.map(_.name) ++
      graftFeatures.map(_.name)
    val dupNames = names.groupBy(identity).filter(_._2.size > 1).keys
    require(dupNames.isEmpty,
      s"feature names ${dupNames.mkString(", ")} are declared on both " +
        "the reference-enum and extension surfaces — the training frame " +
        "would carry duplicate columns; rename one side")
    val groups = features.groupBy(bindingOf)
    val claims = claimDerived(groups, derived)
    val graftGroups = graftFeatures.groupBy(graftBindingOf)
    requireRefreshComplete(spark, root,
      multiAnchorDirs(root, groups, bucketUs) ++
        multiGraftDirs(root, graftGroups))
    (groups.keys ++ graftGroups.keys).flatMap(_.map(_._1)).foreach { alias =>
      require(observations.columns.contains(alias),
        s"observations are missing key-alias column '$alias' — the " +
          "multi-key training join addresses each binding by its alias")
    }
    // extend every binding's daily range to the latest observation's
    // preceding bucket ([[trainingSet]]'s rationale)
    val obsHi = observations
      .agg(max(IncrementalSwa.bucketOf(col(obsTsCol), bucketUs))).head()
    val through =
      if (obsHi.isNullAt(0)) None else Some(obsHi.getLong(0) - 1L)
    val obs = observations.withColumn("__feature_bucket",
      IncrementalSwa.bucketOf(col(obsTsCol), bucketUs) - 1L)
    // one daily frame per (binding, surface): reference-enum bindings
    // first, extension bindings after — the same alias-addressed
    // preceding-bucket join either way (a binding appearing on BOTH
    // surfaces joins twice, on disjoint feature columns)
    val dailies =
      groups.toSeq.map { case (b, fs) =>
        b -> aliasKeys(snapshotDaily(spark, bindingRoot(root, b), fs,
          b.map(_._2), tsCol, bucketUs, claims(b), throughBucket = through), b)
      } ++ graftGroups.toSeq.map { case (b, fs) =>
        b -> aliasKeys(snapshotDailyGraft(spark, bindingRoot(root, b), fs,
          b.map(_._2), tsCol, bucketUs, throughBucket = through), b)
      }
    dailies.foldLeft(obs) { case (acc, (b, daily)) =>
      acc.join(daily.withColumnRenamed("bucket", "__feature_bucket"),
        b.map(_._1) :+ "__feature_bucket", "left_outer")
    }.drop("__feature_bucket")
  }

  /** [[snapshotDailyGraft]] per binding: alias-schema → keys×days
    * frame (the [[snapshotDailyMulti]] shape for extension features).
    */
  def snapshotDailyGraftMulti(spark: SparkSession, root: String,
      features: Seq[GraftFeature], tsCol: String, bucketUs: Long,
      includeHorizonPartialRows: Boolean = false,
      throughBucket: Option[Long] = None): Map[Seq[String], DataFrame] = {
    require(features.nonEmpty, "no features to snapshot")
    requireDistinctGraftAliases(features)
    val groups = features.groupBy(graftBindingOf)
    requireRefreshComplete(spark, root, multiGraftDirs(root, groups))
    groups.map { case (b, fs) =>
      val frame = snapshotDailyGraft(spark, bindingRoot(root, b), fs,
        b.map(_._2), tsCol, bucketUs, includeHorizonPartialRows,
        throughBucket)
      b.map(_._1) -> aliasKeys(frame, b)
    }
  }

  /** [[compact]] across every binding's stores. */
  def compactMulti(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], tsCol: String, bucketUs: Long,
      unionCap: Int = 10000): Unit = {
    val groups = features.groupBy(bindingOf)
    requireNoTornForMaintenance(spark, root,
      multiAnchorDirs(root, groups, bucketUs))
    Par.run(groups.toSeq.map { case (b, fs) => () =>
      compact(spark, bindingRoot(root, b), fs, b.map(_._2), tsCol,
        bucketUs, unionCap)
    }: _*)
  }

  /** [[compactRetaining]] across every binding's stores. */
  def compactRetainingMulti(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], tsCol: String, bucketUs: Long,
      minBucket: Long, unionCap: Int = 10000): Unit = {
    val groups = features.groupBy(bindingOf)
    requireNoTornForMaintenance(spark, root,
      multiAnchorDirs(root, groups, bucketUs))
    Par.run(groups.toSeq.map { case (b, fs) => () =>
      compactRetaining(spark, bindingRoot(root, b), fs, b.map(_._2), tsCol,
        bucketUs, minBucket, unionCap)
    }: _*)
  }

  /** [[forgetKeys]] scoped to ONE binding (erasing a user means the
    * user-keyed stores; an item-keyed store has no row for that user).
    * `binding` is the alias schema; the keys frame's columns must be
    * the binding's physical key columns.
    */
  def forgetKeysMulti(spark: SparkSession, root: String,
      features: Seq[AnchorFeature], tsCol: String, bucketUs: Long,
      binding: Seq[String], keys: DataFrame): Unit = {
    requireDistinctAliases(features)
    val groups = features.groupBy(bindingOf)
    val matching = groups.filter { case (b, _) => b.map(_._1) == binding }
    require(matching.nonEmpty,
      s"no binding $binding among ${groups.keys.map(_.map(_._1)).toSeq}")
    matching.foreach { case (b, fs) =>
      forgetKeys(spark, bindingRoot(root, b), fs, b.map(_._2), tsCol,
        bucketUs, keys)
    }
  }

  // ------------------------------------------------------------------
  // Extension features across MULTIPLE key bindings: the same k=<id>
  // binding-root routing as the reference-enum Multi surface, so a
  // project mixing user-keyed and item-keyed quantile/distinct/top-k
  // features rides the O(delta) refresh too.
  // ------------------------------------------------------------------

  private def graftBindingOf(f: GraftFeature): Seq[(String, String)] = {
    require(f.keys.nonEmpty,
      s"extension feature '${f.name}' declares no key binding — the " +
        "Multi surface routes stores by TypedKey binding; either set " +
        "GraftFeature.keys or use the single-binding calls with " +
        "explicit keyCols")
    f.keys.map(k => (k.alias, k.keyColumn))
  }

  private def requireDistinctGraftAliases(features: Seq[GraftFeature]): Unit =
    requireDistinctBindings(features.map(graftBindingOf))

  /** [[refreshGraft]] per key binding — one delta fold per binding's
    * store group, bindings maintained concurrently.
    */
  def refreshGraftMulti(delta: DataFrame, root: String,
      features: Seq[GraftFeature], tsCol: String, bucketUs: Long,
      version: Long): Unit = {
    require(features.nonEmpty, "no features to refresh")
    requireDistinctGraftAliases(features)
    val groups = features.groupBy(graftBindingOf)
    // top-level marker across bindings — the [[refreshMulti]] rationale
    markPending(delta.sparkSession, root, version,
      groups.toSeq.flatMap { case (b, fs) =>
        val bRoot = bindingRoot(root, b)
        fs.map(graftDir(bRoot, _)).distinct
          .map(_.stripPrefix(s"$root/"))
      })
    Par.run(groups.toSeq.map { case (b, fs) => () =>
      refreshGraft(delta, bindingRoot(root, b), fs, b.map(_._2), tsCol,
        bucketUs, version)
    }: _*)
    clearPending(delta.sparkSession, root, version)
  }

  /** [[snapshotGraft]] per binding: alias-schema → wide frame, key
    * columns renamed to their DSL aliases (the FeatureQuery key-frame
    * contract, exactly [[snapshotMulti]]).
    */
  def snapshotGraftMulti(spark: SparkSession, root: String,
      features: Seq[GraftFeature], tsCol: String, bucketUs: Long,
      asOfUs: Long): Map[Seq[String], DataFrame] = {
    require(features.nonEmpty, "no features to snapshot")
    requireDistinctGraftAliases(features)
    val groups = features.groupBy(graftBindingOf)
    requireRefreshComplete(spark, root, multiGraftDirs(root, groups))
    groups.map { case (b, fs) =>
      val frame = snapshotGraft(spark, bindingRoot(root, b), fs,
        b.map(_._2), tsCol, bucketUs, asOfUs)
      b.map(_._1) -> aliasKeys(frame, b)
    }
  }

  /** [[compactGraft]] across every binding's stores. */
  def compactGraftMulti(spark: SparkSession, root: String,
      features: Seq[GraftFeature], tsCol: String,
      bucketUs: Long): Unit = {
    val groups = features.groupBy(graftBindingOf)
    requireNoTornForMaintenance(spark, root, multiGraftDirs(root, groups))
    Par.run(groups.toSeq.map { case (b, fs) => () =>
      compactGraft(spark, bindingRoot(root, b), fs, b.map(_._2), tsCol,
        bucketUs)
    }: _*)
  }

  /** [[forgetKeysGraft]] scoped to ONE binding (the
    * [[forgetKeysMulti]] contract: erasing a user touches the
    * user-keyed stores; an item-keyed store has no row for that user).
    */
  def forgetKeysGraftMulti(spark: SparkSession, root: String,
      features: Seq[GraftFeature], tsCol: String, bucketUs: Long,
      binding: Seq[String], keys: DataFrame): Unit = {
    requireDistinctGraftAliases(features)
    val groups = features.groupBy(graftBindingOf)
    val matching = groups.filter { case (b, _) => b.map(_._1) == binding }
    require(matching.nonEmpty,
      s"no binding $binding among ${groups.keys.map(_.map(_._1)).toSeq}")
    matching.foreach { case (b, fs) =>
      forgetKeysGraft(spark, bindingRoot(root, b), fs, b.map(_._2), tsCol,
        bucketUs, keys)
    }
  }

  /** Validate and evaluate the derived DAG over the assembled wide
    * row: every input must resolve to a materialized anchor feature or
    * another derived feature, under the SAME key binding; evaluation
    * order is topological with the same cycle refusal as
    * [[graft.project.FeatureProject.topoSortDerived]].
    */
  private def applyDerived(wide: DataFrame, features: Seq[AnchorFeature],
      derived: Seq[DerivedFeature]): DataFrame = {
    if (derived.isEmpty) return wide
    val storeBinding = features.map(_.keyAliases).distinct match {
      case Seq(one) => one
      case many => throw new IllegalArgumentException(
        s"anchor features span multiple key bindings $many — one " +
          "incremental store holds one key frame")
    }
    val anchorNames = features.map(_.name).toSet
    val byName = derived.map(d => d.name -> d).toMap
    require(byName.size == derived.size,
      s"duplicate derived feature names: ${derived.map(_.name).diff(byName.keys.toSeq)}")
    val shadowing = derived.map(_.name).filter(anchorNames.contains)
    require(shadowing.isEmpty,
      s"derived feature(s) $shadowing share a name with a materialized " +
        "anchor feature — the withColumn evaluation would silently " +
        "overwrite the served anchor column; rename the derivation")
    derived.foreach { d =>
      d.inputs.foreach { in =>
        require(anchorNames.contains(in.featureName) ||
            byName.contains(in.featureName),
          s"derived '${d.name}': input '${in.featureName}' is not among " +
            "the materialized anchor features or other derived features " +
            "of this store")
        val bound = in.keys.map(_.alias)
        require(bound.isEmpty || bound == storeBinding,
          s"derived '${d.name}': input '${in.featureName}' is bound " +
            s"under key aliases $bound but this store's key frame is " +
            s"$storeBinding — cross-key derivations re-join a feature " +
            "under a second key and need the batch join planner " +
            "(PointInTimeJoin with registerAlias), not the incremental " +
            "snapshot")
      }
    }
    // topo order, cycle-refused — the FeatureProject.topoSortDerived
    // contract over this store's local DAG
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    val visiting = scala.collection.mutable.Set.empty[String]
    def visit(n: String): Unit = byName.get(n).foreach { d =>
      if (!out.contains(n)) {
        require(!visiting.contains(n), s"cycle in derived-feature DAG at $n")
        visiting += n
        d.inputs.foreach(i => visit(i.featureName))
        visiting -= n
        out += n
      }
    }
    derived.foreach(d => visit(d.name))
    out.toSeq.map(byName).foldLeft(wide) { (df, d) =>
      val c = graft.functions.FeathrExpr.column(d.transformExpr)
      df.withColumn(d.name,
        if (d.featureType.valType == ValueType.UNSPECIFIED) c
        else c.cast(d.featureType.sparkType))
    }
  }
}
