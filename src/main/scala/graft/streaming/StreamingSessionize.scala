package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous sessionization with custom state — the production
  * counterpart of the `session_window` aggregation (which recomputes
  * merged windows per trigger): sessions are EMITTED exactly once, as
  * soon as the watermark proves them closed, and state holds only the
  * still-open tail of each key's timeline.
  *
  * Correctness argument (the buffer-until-watermark contract): a
  * buffered session `[start, end]` is finalized iff
  * `watermark >= end + gap`. Any event that could still extend it
  * (`ts < end + gap`), bridge into it from the front
  * (`ts ∈ (start − gap, start)`), or merge two buffered sessions,
  * carries `ts < end + gap <= watermark` — and an event older than
  * the watermark is dropped by Spark's late-data contract before it
  * reaches this operator. So finalized sessions are immutable, and
  * everything newer stays in the buffer as RAW events, re-sessionized
  * each batch (a later batch's event can still split-merge them).
  *
  * The boundary rule is `diff >= gap` opens a session — identical to
  * [[graft.operators.Sessionize]] and `session_window`'s exclusive
  * end, so all three agree on the same partition of events.
  *
  * Scale posture: state per key is O(open-tail events), bounded by
  * gap × event rate + watermark delay; an idle key's tail flushes via
  * EventTimeTimeout at `end + gap` and its state is REMOVED — total
  * state tracks ACTIVE keys, not all-time keys (the unbounded-growth
  * hazard at the 100 TB north star).
  */
object StreamingSessionize {

  case class Event(key: Long, tsMicros: Long, value: Double)
  case class Session(key: Long, startMicros: Long, endMicros: Long,
      n: Long, vSum: Double)
  /** Ts-ordered (oldest first) open-tail event buffer. */
  case class SessState(events: List[(Long, Double)])

  implicit val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit val sessionEnc: Encoder[Session] = Encoders.product[Session]
  implicit val stateEnc: Encoder[SessState] = Encoders.product[SessState]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  def apply(events: Dataset[Event], gapSeconds: Long,
      watermarkDelay: String = "1 second"): Dataset[Session] = {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    require(gapSeconds > 0, s"gapSeconds must be positive: $gapSeconds")
    val gapUs = gapSeconds * 1000000L
    val prepared = events
      .withColumn("__graft_wm", timestamp_micros(col("tsMicros")))
      .withWatermark("__graft_wm", watermarkDelay)
      .as[Event](eventEnc)

    /** Greedy split of a ts-sorted buffer into sessions. */
    def sessionize(buf: List[(Long, Double)]): List[List[(Long, Double)]] =
      buf.foldLeft(List.empty[List[(Long, Double)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._1 - cur.head._1 < gapUs =>
            // cur is newest-first within a session; cur.head is its end
            (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }.map(_.reverse).reverse

    def toSession(key: Long, s: List[(Long, Double)]): Session =
      Session(key, s.head._1, s.last._1, s.size.toLong, s.map(_._2).sum)

    prepared
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: Long, batch: Iterator[Event], state: GroupState[SessState]) =>
          // one path for data batches AND timeout firings (a timeout is
          // just an empty batch at a later watermark): merge, split,
          // emit the closed prefix, keep the open suffix
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val merged = (state.getOption.map(_.events).getOrElse(Nil) ++
            batch.map(e => (e.tsMicros, e.value)))
            .sortBy(identity)
          // sessions are time-ordered, so closure (wm >= end + gap) is
          // a prefix property — later sessions have later ends
          val (closed, open) = sessionize(merged)
            .partition(s => wmUs >= s.last._1 + gapUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessState(open.flatten))
            // wake when the FIRST open session becomes provably closed
            // (registering the tail's close instead would sit on
            // already-closed prefix sessions until the tail idles) —
            // CEIL to ms (a floor could fire sub-ms early, while an
            // extending event at ts ∈ [wm, end+gap) is still
            // admissible); must also sit strictly above the current
            // watermark (contract of setTimeoutTimestamp)
            val flushMs = math.max(
              (open.head.last._1 + gapUs + 999L) / 1000L,
              state.getCurrentWatermarkMs() + 1L)
            state.setTimeoutTimestamp(flushMs)
          }
          closed.map(toSession(key, _)).iterator
      }
  }
}
