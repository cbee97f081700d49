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
