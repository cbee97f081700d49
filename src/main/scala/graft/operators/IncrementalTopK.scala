package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed per-key HEAVY HITTERS ("top devices/domains/terms per key
  * over the last W days") from incrementally-maintained state — the
  * last member of the aggregate menu exact top-k cannot join
  * incrementally (an item's full count needs every bucket's full
  * count, which is the corpus). The mergeable shape is candidate
  * truncation (the SpaceSaving trade): per (key, bucket) the state
  * keeps only the `candidatesPerBucket` most frequent items (count
  * desc, item asc — deterministic), with EXACT within-bucket counts;
  * serve sums candidate counts over the window and ranks. Served
  * counts are LOWER BOUNDS (an item's occurrences in buckets where it
  * ranked below the cut are lost), and an item is guaranteed into the
  * true top-k whenever its bound exceeds every rival's bound plus the
  * rivals' maximum possible loss — the standard candidate-union
  * guarantee, sharpened by raising `candidatesPerBucket`.
  *
  * Everything is deterministic given the rule, so the DuckDB oracle
  * restates it exactly (per-bucket rank cut → candidate sum → final
  * rank). Candidate truncation is per (version, bucket): late data
  * into an existing bucket contributes its own candidate set (a valid
  * union merge, still lower bounds); the gate feeds bucket-aligned
  * deltas where per-bucket counts are complete.
  *
  * Same generation/version layout, O(delta) ingest, and atomic fold
  * as every other incremental store. State rows: keys × live buckets
  * × candidatesPerBucket.
  */
object IncrementalTopK {
  import IncrementalSwa.{BCol, VCol}

  case class Config(keyCols: Seq[String], tsCol: String, itemCol: String,
      bucketUs: Long, candidatesPerBucket: Int) {
    require(keyCols.nonEmpty, "at least one key column")
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    require(candidatesPerBucket > 0,
      s"candidatesPerBucket must be positive: $candidatesPerBucket")
  }

  /** Fold `delta` to per-(key, bucket) candidate counts and append as
    * `version`; same replay/fold discipline as
    * [[IncrementalSwa.ingest]].
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
      val counts = delta.where(col(cfg.itemCol).isNotNull)
        .groupBy((cfg.keyCols.map(col) :+ b.as(BCol) :+
          col(cfg.itemCol).as("item")): _*)
        .agg(count(lit(1)).as("n"))
      val cut = Window
        .partitionBy((cfg.keyCols :+ BCol).map(col): _*)
        .orderBy(col("n").desc, col("item").asc)
      counts.withColumn("__r", row_number().over(cut))
        .where(col("__r") <= cfg.candidatesPerBucket).drop("__r")
        .sortWithinPartitions(BCol)
        .write.mode("overwrite")
        .parquet(s"${IncrementalSwa.liveGen(spark, dir)}/$VCol=$version")
    }
  }

  /** Top `k` items per key over [asOf − W, asOf): candidate counts
    * sum per (key, item), then rank (count desc, item asc). Output:
    * key cols, item, cnt (the lower-bound count), rank.
    */
  def serveTopK(spark: SparkSession, dir: String, cfg: Config,
      asOfUs: Long, windowBuckets: Int, k: Int): DataFrame = {
    require(asOfUs % cfg.bucketUs == 0,
      s"asOf $asOfUs is not aligned to the ${cfg.bucketUs}µs bucket grid")
    require(windowBuckets > 0, s"windowBuckets must be positive: $windowBuckets")
    require(k > 0, s"k must be positive: $k")
    val hiB = asOfUs / cfg.bucketUs
    IncrementalSwa.requireWithinRetention(spark, dir, hiB - windowBuckets)
    val merged = spark.read.parquet(IncrementalSwa.requireLiveGen(spark, dir))
      .where(col(BCol) >= hiB - windowBuckets && col(BCol) < hiB)
      .groupBy((cfg.keyCols :+ "item").map(col): _*)
      .agg(sum(col("n")).as("cnt"))
    val rk = Window.partitionBy(cfg.keyCols.map(col): _*)
      .orderBy(col("cnt").desc, col("item").asc)
    merged.withColumn("rank", row_number().over(rk))
      .where(col("rank") <= k)
  }

  /** The daily top-k table in ONE state pass: per (key, bucket b),
    * [[serveTopK]]'s ranking over the `windowBuckets` buckets ending
    * AT b. Candidate counts are additive but sparse per (key, day,
    * item) — like the quantile histograms, a rolling frame would need
    * a dense keys × items × days spine, so each candidate row feeds
    * its window's output buckets by explode + sequence
    * (O(state rows × W), one state read — axis 28) and one groupBy
    * re-sums. Same deterministic rank rule (count desc, item asc) and
    * the same lower-bound caveat as the boundary serve;
    * horizon-incomplete rows excluded by default.
    */
  def serveDaily(spark: SparkSession, dir: String, cfg: Config,
      windowBuckets: Int, k: Int,
      includeHorizonPartialRows: Boolean = false,
      throughBucket: Option[Long] = None): DataFrame = {
    require(windowBuckets > 0, s"windowBuckets must be positive: $windowBuckets")
    require(k > 0, s"k must be positive: $k")
    val st = spark.read.parquet(IncrementalSwa.requireLiveGen(spark, dir))
    val hiB = {
      val r = st.agg(max(col(BCol))).head()
      require(!r.isNullAt(0), s"state at $dir holds no candidates")
      r.getLong(0)
    }
    val capB = IncrementalSwa.dailyCap(hiB, windowBuckets, throughBucket)
    val completeFrom = IncrementalSwa.dailyCompleteFrom(spark, dir,
      windowBuckets, includeHorizonPartialRows)
    val dayKeys = cfg.keyCols :+ "__day"
    val merged = IncrementalSwa.expandToWindows(st, windowBuckets, capB)
      .where(col("__day") >= completeFrom)
      .groupBy((dayKeys :+ "item").map(col): _*)
      .agg(sum(col("n")).as("cnt"))
    val rk = Window.partitionBy(dayKeys.map(col): _*)
      .orderBy(col("cnt").desc, col("item").asc)
    merged.withColumn("rank", row_number().over(rk))
      .where(col("rank") <= k)
      .withColumnRenamed("__day", "bucket")
  }

  /** [[serveTopK]] as the state stood at `asOfVersion` — time travel
    * with [[IncrementalSwa.serveAsOf]]'s rebased-history refusal.
    */
  def serveAsOf(spark: SparkSession, dir: String, cfg: Config,
      asOfUs: Long, windowBuckets: Int, k: Int,
      asOfVersion: Long): DataFrame = {
    val folded = IncrementalSwa.foldedThrough(spark, dir)
    require(folded < 0 || asOfVersion >= folded,
      s"version $asOfVersion predates the compaction fold ($folded) at " +
        s"$dir — that history was rebased; serving the fold instead would " +
        "be a reproducibility lie")
    require(asOfUs % cfg.bucketUs == 0,
      s"asOf $asOfUs is not aligned to the ${cfg.bucketUs}µs bucket grid")
    require(windowBuckets > 0, s"windowBuckets must be positive: $windowBuckets")
    require(k > 0, s"k must be positive: $k")
    val hiB = asOfUs / cfg.bucketUs
    IncrementalSwa.requireWithinRetention(spark, dir, hiB - windowBuckets)
    val merged = spark.read.parquet(IncrementalSwa.requireLiveGen(spark, dir))
      .where(col(VCol) <= asOfVersion)
      .where(col(BCol) >= hiB - windowBuckets && col(BCol) < hiB)
      .groupBy((cfg.keyCols :+ "item").map(col): _*)
      .agg(sum(col("n")).as("cnt"))
    val rk = Window.partitionBy(cfg.keyCols.map(col): _*)
      .orderBy(col("cnt").desc, col("item").asc)
    merged.withColumn("rank", row_number().over(rk))
      .where(col("rank") <= k)
  }

  /** Fold the version tail: candidate counts merge additively per
    * (key, bucket, item), no re-truncation (information is never
    * discarded by a fold) — [[IncrementalSwa.compact]]'s crash
    * posture.
    */
  def compact(spark: SparkSession, dir: String, cfg: Config): Long =
    IncrementalSwa.compactFold(spark, dir, () => foldState(spark, dir, cfg))

  private def foldState(spark: SparkSession, dir: String,
      cfg: Config): DataFrame =
    spark.read.parquet(IncrementalSwa.requireLiveGen(spark, dir))
      .groupBy((cfg.keyCols.map(col) :+ col(BCol) :+ col("item")): _*)
      .agg(sum(col("n")).as("n"))

  /** Retention compaction — [[IncrementalSwa.compactRetaining]]'s
    * contract for candidate state.
    */
  def compactRetaining(spark: SparkSession, dir: String, cfg: Config,
      minBucket: Long): Long =
    IncrementalSwa.compactFold(spark, dir,
      () => foldState(spark, dir, cfg).where(col(BCol) >= minBucket),
      newRetainedFrom = Some(minBucket))

  /** GDPR erasure — [[IncrementalSwa.forgetKeys]]'s contract. */
  def forgetKeys(spark: SparkSession, dir: String, cfg: Config,
      keys: DataFrame): Long =
    IncrementalSwa.compactFold(spark, dir,
      () => foldState(spark, dir, cfg).join(keys, cfg.keyCols, "left_anti"))
}
