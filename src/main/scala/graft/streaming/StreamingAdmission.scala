package graft.streaming

import graft.operators.{Materializer, NearDupIndex, OutputSink}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous-ingestion near-dup admission (T1 × the persisted
  * near-dup index): each micro-batch of candidate documents is
  * LSH-queried against the reference index at `indexPath`
  * ([[NearDupIndex.query]] — per-batch cost is the DELTA side only,
  * the reference streams from the store); documents with a match at
  * `threshold` or above are dropped, survivors land in `outPath` via
  * [[Materializer.writeBatch]]'s batchId-keyed IDEMPOTENT write (a
  * replayed batch overwrites its own partition, never double-admits).
  *
  * With `appendAdmitted = true` each batch's survivors are indexed
  * before the next batch, so later deltas also dedup against
  * earlier admissions — the admission loop of a training corpus that
  * grows by deltas. This mode IS the ordered admission
  * ([[NearDupIndex.admit]], the [[graft.operators.IncrementalCuration]]
  * contract): document ids must be monotone across batches, a doc is
  * dropped for a smaller-id match whether stored OR within its own
  * batch, and every stage entrant is indexed. Ordering is what makes
  * at-least-once replay idempotent: a replayed doc meets only its own
  * id (excluded) or larger ids (not drop-eligible), so the batch's
  * idempotent output rewrite reproduces the same survivors. The
  * pre-r11 composition (query + append-admitted-only) admitted
  * batch-internal near-dup pairs whole and then dropped BOTH sides on
  * a replay — silent loss found by review and pinned by spec. Default
  * off (static reference index; symmetric query, no ordering
  * requirement).
  */
object StreamingAdmission {

  def run(delta: DataFrame, textCol: String, idCol: String,
      indexPath: String, outPath: String, threshold: Double,
      timeoutMs: Long = 300000,
      appendAdmitted: Boolean = false): StreamingQuery = {
    val q = delta.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val admitted = if (appendAdmitted) {
          // growing index => the ordered admission step (decides, then
          // appends the batch's entrants — see the class doc)
          val losers = NearDupIndex.admit(batch.sparkSession, indexPath,
              batch, textCol, idCol, threshold)
            .select(col("id").as(idCol))
          batch.join(losers, Seq(idCol), "left_anti")
        } else {
          val matched = NearDupIndex.query(batch.sparkSession, indexPath,
              batch, textCol, idCol, threshold)
            .select(col("id_delta").as(idCol)).distinct()
          batch.join(matched, Seq(idCol), "left_anti")
        }
        Materializer.writeBatch(admitted, batchId, Seq(idCol),
          Seq(OutputSink.Generic("parquet", outPath)))
      }
      .start()
    q.awaitTermination(timeoutMs)
    if (q.isActive) {
      q.stop()
      // a timed-out admission has UNPROCESSED batches: surfacing a
      // partial survivor set as complete would silently lose documents
      // (and leave a half-grown index under appendAdmitted)
      throw new IllegalStateException(
        s"streaming admission timed out after ${timeoutMs}ms with batches " +
          s"unprocessed — output at $outPath is PARTIAL; raise timeoutMs " +
          "or shrink the delta")
    }
    q
  }
}
