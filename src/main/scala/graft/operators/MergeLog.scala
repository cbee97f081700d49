package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.hadoop.fs.Path

/** Version-partitioned upsert LOG — the LSM shape of [[Upsert]]:
  * [[Upsert.merge]] rewrites the whole base per delta (right for a
  * nightly rebase), while a high-frequency writer — a streaming
  * foreachBatch above all — must pay only O(delta) per append. Here
  * every delta lands as its own `__v=<version>/` parquet partition;
  * [[snapshot]] resolves latest-wins by key at READ time with one
  * window over (key, version desc); [[compact]] folds the log back
  * into a single base version when read amplification grows.
  *
  * Idempotence falls out of the layout: a replayed append OVERWRITES
  * its own version partition (exactly the `__graft_batch_id` sink
  * discipline, Materializer.writeBatch), so at-least-once delivery
  * cannot double-apply a delta.
  */
object MergeLog {

  private val VCol = "__v"
  private val DeadCol = "__dead"

  /** Append one delta as `version`. Keys must be unique WITHIN the
    * delta (checked, delta-sized) — cross-version conflicts are what
    * the log resolves; intra-version conflicts would make the winner
    * partition-order nondeterminism. `tombstoneCol` rows mark deletes.
    */
  def append(delta: DataFrame, dir: String, version: Long,
      keyCols: Seq[String], tombstoneCol: Option[String] = None): Unit = {
    require(keyCols.nonEmpty, "append needs key columns")
    val dups = delta.groupBy(keyCols.map(col): _*)
      .count().where(col("count") > 1).limit(1).collect()
    require(dups.isEmpty,
      s"delta for version $version has duplicate keys (e.g. ${dups.headOption})")
    val dead = tombstoneCol.map(c => coalesce(col(c), lit(false)))
      .getOrElse(lit(false))
    // the path carries the version (partition discovery reads it back
    // as the `__v` column) — the files must NOT also contain it
    delta.withColumn(DeadCol, dead)
      .drop(tombstoneCol.toSeq: _*)
      .write.mode("overwrite")
      .parquet(s"$dir/$VCol=$version")
  }

  /** Latest-wins view of the log: for each key, the row of the highest
    * version, minus tombstoned keys. One key-hash shuffle over the
    * LIVE log (base + deltas); `spark.read` prunes nothing here —
    * compact when the delta tail outgrows its usefulness.
    */
  def snapshot(spark: SparkSession, dir: String,
      keyCols: Seq[String]): DataFrame = {
    val all = readLog(spark, dir)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(VCol).desc)
    all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && !col(DeadCol))
      .drop("__rn", VCol, DeadCol)
  }

  /** Fold the log into one base partition at `max(version)`: snapshot
    * rewritten once, older partitions removed — read amplification
    * back to 1. Tombstones are physically dropped (their work is done).
    */
  def compact(spark: SparkSession, dir: String, keyCols: Seq[String]): Unit = {
    val vmax = versions(spark, dir).max
    val snap = Spill.roundTrip(snapshot(spark, dir, keyCols))
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    append(snap, dir, vmax, keyCols)
    versions(spark, dir).filter(_ != vmax).foreach(v =>
      fs.delete(new Path(s"$dir/$VCol=$v"), true))
  }

  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$VCol="))
      .map(_.getPath.getName.stripPrefix(s"$VCol=").toLong)
  }

  private def readLog(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("basePath", dir).parquet(
      versions(spark, dir).map(v => s"$dir/$VCol=$v"): _*)
}
