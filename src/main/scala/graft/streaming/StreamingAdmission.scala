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
  * grows by deltas. Caveat: the index append itself is NOT
  * batchId-idempotent (band/shingle rows are blind appends), so a
  * replayed batch re-appends its rows; duplicate index rows cost
  * extra candidate checks but cannot change verdicts — id-EQUAL
  * collisions (a replayed doc meeting its own earlier append) are
  * excluded inside [[NearDupIndex.query]], so the replay's idempotent
  * rewrite reproduces the same survivors instead of dropping
  * everything as self-duplicates. Default off.
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
        val matched = NearDupIndex.query(batch.sparkSession, indexPath,
            batch, textCol, idCol, threshold)
          .select(col("id_delta").as(idCol)).distinct()
        val admitted = batch.join(matched, Seq(idCol), "left_anti")
        Materializer.writeBatch(admitted, batchId, Seq(idCol),
          Seq(OutputSink.Generic("parquet", outPath)))
        if (appendAdmitted)
          NearDupIndex.append(admitted, indexPath, textCol, idCol)
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
