package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.hadoop.fs.Path

/** Table-maintenance rewrites for file layout — the two jobs every
  * long-lived 100 TB dataset needs on a schedule:
  *
  *   - [[compact]]: streaming sinks and incremental backfills leave
  *     thousands of tiny part files; each costs a task + an open + a
  *     footer parse on every downstream scan. Compaction rewrites a
  *     directory to ~`targetBytes` files with `coalesce` — shuffle-free
  *     (it only merges read splits), so the rewrite moves each byte
  *     once.
  *   - [[rangeLayout]]: rewrites clustered by a key with
  *     `repartitionByRange + sortWithinPartitions`, which turns the
  *     parquet min/max footers into a coarse primary index: a
  *     key-range scan then reads only the files whose range overlaps
  *     the predicate (file/row-group skipping), instead of every row
  *     of every file. One shuffle at write time buys every later scan
  *     its pruning — the same trade [[BucketedLayout]] makes for joins,
  *     here for range predicates.
  *
  * Both return before/after [[Compaction.Stats]] measured from the
  * filesystem, not estimates.
  */
object Compaction {

  case class Stats(filesBefore: Int, bytesBefore: Long,
      filesAfter: Int, bytesAfter: Long, parts: Int)

  /** (data-file count, total bytes) under `dir` — hidden/_SUCCESS
    * files excluded.
    */
  def fileStats(spark: SparkSession, dir: String): (Int, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        n += 1; bytes += f.getLen
      }
    }
    (n, bytes)
  }

  private def partsFor(bytes: Long, targetBytes: Long): Int =
    math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

  /** Shuffle-free small-file compaction of a parquet directory. */
  def compact(spark: SparkSession, inputDir: String, outputDir: String,
      targetBytes: Long): Stats = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val (fb, bb) = fileStats(spark, inputDir)
    val parts = partsFor(bb, targetBytes)
    spark.read.parquet(inputDir).coalesce(parts)
      .write.mode("overwrite").parquet(outputDir)
    val (fa, ba) = fileStats(spark, outputDir)
    Stats(fb, bb, fa, ba, parts)
  }

  /** Range-clustered rewrite by `sortCols`: globally range-partitioned
    * files, rows sorted within each, so every file's footer min/max on
    * the sort key is a disjoint interval — the coarse index scans
    * prune against.
    */
  def rangeLayout(spark: SparkSession, inputDir: String, outputDir: String,
      sortCols: Seq[String], targetBytes: Long): Stats = {
    require(sortCols.nonEmpty, "rangeLayout needs at least one sort column")
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val (fb, bb) = fileStats(spark, inputDir)
    val parts = partsFor(bb, targetBytes)
    val cols = sortCols.map(col)
    spark.read.parquet(inputDir)
      .repartitionByRange(parts, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(outputDir)
    val (fa, ba) = fileStats(spark, outputDir)
    Stats(fb, bb, fa, ba, parts)
  }

  /** Z-order (Morton-curve) rewrite for MULTI-predicate pruning:
    * [[rangeLayout]] clusters one key — a predicate on any OTHER key
    * then overlaps every file. Here each key is first reduced to a
    * `bits`-bit equi-depth rank (boundaries from `approxQuantile` —
    * the layout is physical, so approximation costs balance, never
    * correctness), the ranks' bits are interleaved into one Morton
    * value, and files are range-partitioned and sorted along that
    * space-filling curve. Every file then spans a NARROW min/max
    * interval in every keyed dimension at once, so a predicate on any
    * subset of the keys skips most files — the Delta/Iceberg
    * OPTIMIZE ZORDER trade, paid once at write time.
    *
    * The rank and interleave are pure codegen'd expressions (a
    * when-chain over the boundary literals and a shiftleft/bitwise-or
    * fold) — no UDF in the rewrite path.
    */
  def zorderLayout(spark: SparkSession, inputDir: String, outputDir: String,
      keys: Seq[String], targetBytes: Long, bits: Int = 6): Stats = {
    require(keys.size >= 2,
      "zorderLayout needs >= 2 keys (one key is rangeLayout)")
    require(bits >= 1 && bits * keys.size <= 62,
      s"bits=$bits x ${keys.size} keys must fit a long")
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val (fb, bb) = fileStats(spark, inputDir)
    val parts = partsFor(bb, targetBytes)
    val df = spark.read.parquet(inputDir)

    val nBuckets = 1 << bits
    // per-key equi-depth boundaries; rank = #(boundaries < value),
    // a codegen'd when-chain (write-time only, one pass)
    val ranks = keys.map { k =>
      val bounds = df.stat.approxQuantile(k,
        (1 until nBuckets).map(_.toDouble / nBuckets).toArray, 0.001)
      bounds.distinct.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(k).cast("double") > b, 1).otherwise(0)
      }
    }
    // Morton interleave: key j contributes its rank's bit i at output
    // position i * nKeys + j — adjacent curve positions differ little
    // in EVERY key
    val z = (0 until bits).flatMap { i =>
      ranks.zipWithIndex.map { case (r, j) =>
        shiftleft(shiftright(r.cast("long"), i).bitwiseAND(lit(1L)),
          i * keys.size + j)
      }
    }.reduce(_ bitwiseOR _)

    df.withColumn("__graft_z", z)
      .repartitionByRange(parts, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").parquet(outputDir)
    val (fa, ba) = fileStats(spark, outputDir)
    Stats(fb, bb, fa, ba, parts)
  }

  /** Rows the file scans actually produced for `df` — file/row-group
    * skipping shows up here (skipped groups contribute nothing). Runs
    * the query. Descends AQE's adaptive and query-stage wrappers,
    * which `collectLeaves` treats as leaves.
    */
  def scannedRows(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
  }
}
