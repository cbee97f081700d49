package graft

import graft.operators.{Compaction, Spill}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkTestBase {

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  test("compact: many small files -> few target-size files, same rows, no shuffle") {
    val src = Spill.newPath(spark)
    spark.read.parquet(s"$sf/documents.parquet")
      .repartition(64).write.parquet(src)
    val (fb, bytes) = Compaction.fileStats(spark, src)
    assert(fb == 64)

    val out = Spill.newPath(spark)
    val stats = Compaction.compact(spark, src, out, targetBytes = bytes / 4)
    assert(stats.filesBefore == 64)
    assert(stats.filesAfter == stats.parts && stats.filesAfter <= 6,
      s"expected <=6 compacted files, got $stats")
    assert(multiset(spark.read.parquet(out)) ==
      multiset(spark.read.parquet(s"$sf/documents.parquet")))

    // coalesce path: plan must not contain an Exchange
    val plan = spark.read.parquet(src).coalesce(stats.parts)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("rangeLayout: key-range scans prune files the scattered layout reads") {
    val scattered = Spill.newPath(spark)
    // scatter by hash so every file spans the whole doc_id range
    spark.read.parquet(s"$sf/documents.parquet")
      .repartition(8, md5(col("doc_id").cast("string")))
      .write.parquet(scattered)
    val (_, bytes) = Compaction.fileStats(spark, scattered)

    val ranged = Spill.newPath(spark)
    val stats = Compaction.rangeLayout(spark, scattered, ranged,
      Seq("doc_id"), targetBytes = bytes / 8)
    assert(stats.filesAfter >= 6, s"want ~8 range files, got $stats")

    def q(dir: String) = spark.read.parquet(dir)
      .where(col("doc_id").between(100, 161)).select("doc_id", "n_chars")

    assert(multiset(q(ranged)) == multiset(q(scattered)))

    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    val rowsScattered = Compaction.scannedRows(q(scattered))
    val rowsRanged = Compaction.scannedRows(q(ranged))
    // scattered: min/max of every file spans the predicate -> no skip
    assert(rowsScattered == total, s"scattered scanned $rowsScattered of $total")
    // ranged: only the overlapping file(s) are read
    assert(rowsRanged <= total / 4,
      s"ranged layout scanned $rowsRanged rows, expected <= ${total / 4}")
  }

  test("zorderLayout: predicates on EITHER key prune; single-key range layout cannot") {
    import spark.implicits._
    // two independent uniform keys — the multi-predicate regime where
    // one-key clustering leaves the other dimension unsorted
    val n = 200000L
    val grid = spark.range(n).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(1000)).as("x"),
      pmod(xxhash64(col("id") + 7), lit(1000)).as("y"))
    val scattered = Spill.newPath(spark)
    grid.repartition(16, md5(col("id").cast("string"))).write.parquet(scattered)
    val (_, bytes) = Compaction.fileStats(spark, scattered)

    val byX = Spill.newPath(spark)
    Compaction.rangeLayout(spark, scattered, byX, Seq("x"), bytes / 64)
    val byZ = Spill.newPath(spark)
    val stats = Compaction.zorderLayout(spark, scattered, byZ,
      Seq("x", "y"), bytes / 64)
    assert(stats.filesAfter >= 32, s"want ~64 z-files, got $stats")

    def q(dir: String, pred: org.apache.spark.sql.Column) =
      spark.read.parquet(dir).where(pred).select("id", "x", "y")
    val predX = col("x") < 50
    val predY = col("y") < 50
    // values are layout-invariant
    assert(multiset(q(byZ, predX && predY)) == multiset(q(scattered, predX && predY)))

    val xOnRange = Compaction.scannedRows(q(byX, predX))
    val yOnRange = Compaction.scannedRows(q(byX, predY))
    val xOnZ = Compaction.scannedRows(q(byZ, predX))
    val yOnZ = Compaction.scannedRows(q(byZ, predY))
    // the single-key layout prunes its own key and nothing else
    assert(xOnRange <= n / 8, s"x-range layout scanned $xOnRange on x-pred")
    assert(yOnRange >= n / 2, s"x-range layout should NOT prune y: $yOnRange")
    // the z-layout prunes BOTH dimensions (coarser than the dedicated
    // single-key sort on x, far better than nothing on y)
    assert(xOnZ <= n / 2, s"zorder scanned $xOnZ on x-pred")
    assert(yOnZ <= n / 2, s"zorder scanned $yOnZ on y-pred")
    assert(yOnZ * 2 <= yOnRange,
      s"zorder y-pred scan ($yOnZ) should beat range layout ($yOnRange)")
  }
}
