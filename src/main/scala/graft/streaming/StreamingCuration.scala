package graft.streaming

import graft.operators.IncrementalCuration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous corpus curation (T1 × [[IncrementalCuration]]): each
  * micro-batch of candidate documents runs the state dir's PERSISTED
  * pipeline — per-document stages, near-dup admission against (and
  * into) the index, merge-log append — as one
  * [[IncrementalCuration.refresh]] at version `batchId + 1` (version 0
  * is the batch bootstrap).
  *
  * Exactly-once effect under at-least-once foreachBatch: refresh is
  * replay-idempotent BY CONSTRUCTION — the merge-log and high-water
  * meta writes overwrite their own version partition, the admission
  * decision validates against versions strictly before its own, and a
  * replayed document meeting its own earlier index append is excluded
  * as an id-equal collision (the IncrementalCurationSpec crash-replay
  * contract). Batches must arrive in id-monotone order (the admission
  * semantics are id-ordered); an out-of-order batch FAILS the
  * high-water check loudly rather than silently reordering history.
  *
  * ONE streaming checkpoint per state dir lineage: pass
  * `checkpointLocation` (e.g. `s"$root/checkpoint"`) so a restarted
  * stream RESUMES its batchId sequence instead of restarting at 0 —
  * a fresh checkpoint against a used state dir would re-issue version
  * 1, and while refresh's high-water tripwire refuses a version
  * rewrite whose data differs from the recorded one, resumability is
  * the correct posture, not just the guarded one.
  */
object StreamingCuration {

  def run(delta: DataFrame, root: String, timeoutMs: Long = 300000,
      reference: Option[(DataFrame, String, String)] = None,
      checkpointLocation: Option[String] = None): StreamingQuery = {
    val writer = delta.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
    val q = checkpointLocation
      .fold(writer)(writer.option("checkpointLocation", _))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // a replayed empty batch has nothing to version
        if (!batch.isEmpty)
          IncrementalCuration.refresh(batch, root, 1L + batchId, reference)
        ()
      }
      .start()
    q.awaitTermination(timeoutMs)
    if (q.isActive) {
      q.stop()
      throw new IllegalStateException(
        s"streaming curation timed out after ${timeoutMs}ms with batches " +
          s"unprocessed — the curated state at $root is PARTIAL; raise " +
          "timeoutMs or shrink the delta")
    }
    q
  }
}
