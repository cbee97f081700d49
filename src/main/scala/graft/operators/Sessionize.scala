package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization — the gaps-and-islands operator an
  * activity-stream engine needs next to its windowed aggregations
  * (reference surface: the SWA family, `feathr-rs` window configs;
  * sessions are the window whose length the DATA decides).
  *
  * Semantics: per key, events ordered by time; a new session starts
  * when the gap since the previous event is `>= gapSeconds`. The
  * boundary is deliberately EXCLUSIVE-end (an event exactly `gap`
  * after its predecessor opens a new session) to match Spark's
  * `session_window` — batch, streaming, and the oracle then agree on
  * the same partition of events.
  *
  * Scale posture: ONE shuffle on the key; the per-key window is
  * sequential but bounded by that key's event count (the same bound
  * any sessionization has — a key's timeline is inherently serial).
  * The cumulative-sum frame is the default RANGE frame, which makes
  * tied timestamps deterministic: of a tied pair at a session
  * boundary, exactly one carries the session-start flag, and the
  * RANGE frame sums BOTH peers into both rows, so ties always land in
  * the same session on every engine and every run.
  */
object Sessionize {

  /** Per-event session assignment: input columns plus `session_seq`
    * (1-based, per key, in time order). */
  def assign(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val us = unix_micros(col(tsCol))
    val isNew = when(
      lag(us, 1).over(w).isNull ||
        us - lag(us, 1).over(w) >= gapSeconds * 1000000L, 1L).otherwise(0L)
    // default RANGE frame on the running sum — the tie-safety contract
    df.withColumn("session_seq", sum(isNew).over(
      Window.partitionBy(col(keyCol)).orderBy(col(tsCol))))
  }

  /** Per-session roll-up: `(key, session_seq, session_start,
    * session_end, duration_us, n_events)` plus caller aggregates.
    * `duration_us` stays integer microseconds — no float quotient in
    * a gate hash. */
  def sessions(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, extraAggs: org.apache.spark.sql.Column*): DataFrame =
    assign(df, keyCol, tsCol, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        Seq(
          max(col(tsCol)).as("session_end"),
          (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
            .as("duration_us"),
          count(lit(1)).as("n_events")) ++ extraAggs: _*)
}
