package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed MERGE (upsert + delete) — the incremental-materialization
  * primitive (SURVEY §2.8): a nightly feature snapshot is not
  * recomputed from scratch; yesterday's table merges with today's
  * delta, where a delta row REPLACES the base row with its key, a
  * tombstoned delta row DELETES it, and unseen keys INSERT.
  *
  * Shape at scale: the only corpus-sized operation is one left-anti
  * join of base against the delta's (small) key set — delta-sized
  * state, never a full rewrite of values that did not change. Keep the
  * base in [[BucketedLayout]] bucketed by the merge key and the
  * anti-join plans with no Exchange on the base side, making the
  * nightly merge's shuffle O(delta), not O(table).
  *
  * Concurrency: [[merge]] is a PURE frame transformation — it mutates
  * no directory, so there is nothing here to lease. The single-writer
  * obligation attaches to whoever WRITES the merged result; a caller
  * that persists merges to a shared path should take a
  * [[WriterLease]] on that path around the write (the [[MergeLog]]
  * shape does exactly this and is the right tool when merges are
  * frequent enough to contend).
  */
object Upsert {

  /** Merge `delta` into `base` by `keyCols`.
    *
    * @param tombstoneCol boolean column on `delta`: true rows delete
    *        their key from the result (and are not emitted). Dropped
    *        from the output. Null tombstone = false (upsert).
    * @param versionCol when several delta rows share a key, the row
    *        with the highest version wins (ties broken by all
    *        remaining columns descending, so the winner is
    *        deterministic on any engine). Without it, duplicate delta
    *        keys are rejected — silent nondeterminism is the one thing
    *        a merge must never have.
    */
  def merge(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
      tombstoneCol: Option[String] = None,
      versionCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val outCols = base.columns.toSeq
    val deltaCols = delta.columns.toSeq.filterNot(tombstoneCol.contains)
    require(deltaCols.sorted == (outCols ++ versionCol).distinct.sorted,
      s"delta schema ${deltaCols.sorted} must be base ${outCols.sorted}" +
        s" plus version/tombstone columns")

    val latest = versionCol match {
      case Some(v) =>
        val tieBreak = deltaCols.filterNot(keyCols.contains)
          .filterNot(_ == v).map(c => col(c).desc)
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(v).desc +: tieBreak: _*)
        delta.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn", v)
      case None =>
        val dups = delta.groupBy(keyCols.map(col): _*)
          .count().where(col("count") > 1).limit(1).collect()
        require(dups.isEmpty,
          s"delta has duplicate keys (e.g. ${dups.headOption}) and no " +
            "versionCol to arbitrate; pass versionCol for latest-wins")
        delta
    }

    val survivors = tombstoneCol match {
      case Some(t) => latest.where(!coalesce(col(t), lit(false))).drop(t)
      case None => latest
    }

    // anti-join against ALL delta keys (tombstones included: a delete
    // must remove its base row even though it emits nothing)
    val deltaKeys = (tombstoneCol match {
      case Some(t) => latest.drop(t)
      case None => latest
    }).select(keyCols.map(col): _*).distinct()

    base.join(deltaKeys, keyCols, "left_anti")
      .unionByName(survivors.select(outCols.map(col): _*))
  }
}
