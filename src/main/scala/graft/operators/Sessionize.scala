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

  /** Cohort retention: keys cohorted by the UTC day-grid period of
    * their first event (`periodSeconds` wide, anchored at the epoch),
    * then counted per (cohort, offset) where offset = how many whole
    * periods after its cohort a key was active. The classic retention
    * triangle, all integer arithmetic on epoch-micros — engine-exact.
    *
    * Two key-grouped aggregations (first-event, then distinct
    * (key, cohort, offset)) and one count — no per-key timelines, no
    * windows; scales as groupBys do.
    */
  def retention(df: DataFrame, keyCol: String, tsCol: String,
      periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0, s"bad period: $periodSeconds")
    val periodUs = periodSeconds * 1000000L
    val period = call_function("div", unix_micros(col(tsCol)), lit(periodUs))
    val first = df.groupBy(col(keyCol))
      .agg(min(period).as("cohort"))
    df.select(col(keyCol), period.as("__p"))
      .join(first, Seq(keyCol))
      .select(col(keyCol), col("cohort"), (col("__p") - col("cohort")).as("offset"))
      .distinct()
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Conversion funnel anchored at each key's FIRST occurrence of
    * `steps.head`: step i+1 matches its first event strictly after
    * step i's match, and `completed` requires every step matched with
    * the last inside `horizonSeconds` of the anchor. The
    * anchored-greedy semantic is deliberate — it is the one a SQL
    * oracle states exactly (nested first-after-t minimums), where
    * sliding-anchor variants are engine-folklore.
    *
    * Output per key with step 1: `t1_us … tN_us` (null from the first
    * unmatched step on), `steps_reached`, `completed`.
    *
    * Plan shape: one type-filtered scan + min-aggregate per step
    * (filter pushdown keeps each scan to its step's rows), chained by
    * key-equi joins — no per-key event lists ever materialize, so a
    * key with millions of events costs the same as one with ten.
    */
  def funnel(df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], horizonSeconds: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got $steps")
    // internal anchor columns carry a reserved __-prefix and are
    // tracked by NAME, never rediscovered by pattern: a keyCol like
    // "token_id" or "type" must not be mistaken for an anchor column
    def tc(i: Int) = s"__t${i}_us"
    val tsUs = unix_micros(col(tsCol))
    val base = df.where(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(tsUs).as(tc(1)))

    // inner-chain: frame i holds keys that reached step i, with all
    // earlier anchor times carried (constant per key under max)
    val frames = steps.zipWithIndex.tail.scanLeft(base) {
      case (prev, (step, i)) =>
        val carried = (1 until i + 1).map(j => max(col(tc(j))).as(tc(j)))
        df.where(col(typeCol) === step)
          .join(prev, Seq(keyCol))
          .where(tsUs > col(tc(i)))
          .groupBy(col(keyCol))
          .agg(min(tsUs).as(tc(i + 1)), carried: _*)
    }

    // left-join each deeper frame's NEW anchor (frame at index i
    // introduced __t{i+2}_us) back onto the anchor population
    val full = frames.tail.zipWithIndex.foldLeft(frames.head) {
      case (acc, (f, i)) =>
        acc.join(f.select(col(keyCol), col(tc(i + 2))), Seq(keyCol), "left_outer")
    }
    val tCols = steps.indices.map(i => col(tc(i + 1)))
    val reached = tCols.map(c => when(c.isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    full.select(col(keyCol) +:
      steps.indices.map(i => col(tc(i + 1)).as(s"t${i + 1}_us")) :+
      reached.as("steps_reached") :+
      (tCols.last.isNotNull &&
        tCols.last - tCols.head <= horizonSeconds * 1000000L).as("completed"): _*)
  }

  /** Within-session path n-grams — "what do users DO, in order" (the
    * product-analytics path report): for every run of `n` consecutive
    * events inside one session, the '>'-joined `typeCol` sequence,
    * counted corpus-wide. No per-session event-list materialization:
    * the n-gram is assembled from n−1 `lead()`s over the session
    * window (ordered by ts with `ordCol` as the deterministic
    * tiebreak), so state per row is n small strings, never a
    * session's timeline — a 100k-event bot session costs 100k rows,
    * not a 100k-element array on one executor. One key shuffle (the
    * session window) + one count shuffle bounded by distinct paths.
    */
  def pathNgrams(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, ordCol: String, gapSeconds: Long,
      n: Int): DataFrame = {
    require(n >= 2 && n <= 8, s"path n-gram length out of range: $n")
    val w = Window.partitionBy(col(keyCol), col("session_seq"))
      .orderBy(col(tsCol), col(ordCol))
    val steps = (0 until n).map(i =>
      if (i == 0) col(typeCol) else lead(col(typeCol), i).over(w))
    assign(df, keyCol, tsCol, gapSeconds)
      .withColumn("__path", concat_ws(">", steps: _*))
      // rows whose trailing leads fell off the session end have a
      // short path — exactly the rows where the last lead is null
      // (projected first: window expressions can't sit in WHERE)
      .withColumn("__last", steps.last)
      .where(col("__last").isNotNull)
      .groupBy(col("__path").as("path"))
      .agg(count(lit(1)).as("n_occurrences"))
  }
}
