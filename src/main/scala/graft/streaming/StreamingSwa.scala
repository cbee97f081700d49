package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable

/** Streaming sliding-window aggregation with custom state
  * (SURVEY.md §2.7: `KeyValueGroupedDataset.flatMapGroupsWithState`).
  *
  * For every incoming event this emits the aggregate over
  * `(event_ts - window, event_ts]` for its key — the streaming
  * equivalent of the batch SWA features with the observation spine
  * equal to the source itself.
  *
  * Incremental evaluation: the state is the ts-ordered event buffer
  * inside the window; per key per micro-batch the running sum and the
  * monotonic min/max deques are rebuilt once (O(buffer)), then every
  * in-order event is O(1) amortized — append, evict expired heads,
  * read the aggregates. An out-of-order event (older than the buffer
  * tail) takes an exact one-off O(buffer) scan and a deque rebuild,
  * without disturbing newer events. State stays bounded by
  * window × event rate — the same bound the batch range join carries
  * per (key, window).
  */
object StreamingSwa {

  case class Event(key: Long, tsMicros: Long, value: Double)
  case class SwaResult(key: Long, tsMicros: Long,
      f_sum: Double, f_cnt: Long, f_min: Double, f_max: Double, f_avg: Double)
  /** Ts-ordered (oldest first) window buffer. */
  case class SwaState(events: List[(Long, Double)])

  implicit val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit val resultEnc: Encoder[SwaResult] = Encoders.product[SwaResult]
  implicit val stateEnc: Encoder[SwaState] = Encoders.product[SwaState]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Window as a parsed duration — exact micros, so sub-second windows
    * behave identically to the batch SWA planner.
    */
  def apply(events: Dataset[Event], window: java.time.Duration): Dataset[SwaResult] =
    applyMicros(events, graft.model.Durations.toMicros(window), None)

  def apply(events: Dataset[Event], windowSeconds: Long): Dataset[SwaResult] =
    applyMicros(events, windowSeconds * 1000000L, None)

  /** With `idleTimeout`: a key whose newest buffered event falls
    * `idleTimeout` behind the watermark has its state REMOVED
    * (event-time timeout) — without this, total state grows with
    * all-time distinct keys, not active ones, the one unbounded-growth
    * path at the 100 TB north star. The operator derives the watermark
    * internally from `tsMicros` with delay `watermarkDelay` (Spark
    * needs the watermarked attribute visible at the stateful operator;
    * the derived column rides along untyped and is never emitted).
    * The watermark carries Spark's standard late-data contract: input
    * rows older than `watermark` are dropped at this operator — size
    * `watermarkDelay` to the latest event you intend to accept.
    * Watermark-correct when `idleTimeout >= window`: an evicted
    * buffer's events are older than `watermark − idleTimeout`, so only
    * an event itself older than the watermark (already dropped by the
    * same contract) could still have seen them.
    */
  def apply(events: Dataset[Event], window: java.time.Duration,
      idleTimeout: java.time.Duration,
      watermarkDelay: java.time.Duration): Dataset[SwaResult] =
    applyMicros(events, graft.model.Durations.toMicros(window),
      Some((graft.model.Durations.toMicros(idleTimeout),
        watermarkDelay.toMillis)))

  def apply(events: Dataset[Event], windowSeconds: Long,
      idleTimeoutSeconds: Long, watermarkDelaySeconds: Long): Dataset[SwaResult] =
    applyMicros(events, windowSeconds * 1000000L,
      Some((idleTimeoutSeconds * 1000000L, watermarkDelaySeconds * 1000L)))

  private def applyMicros(events: Dataset[Event], wUs: Long,
      evict: Option[(Long, Long)]): Dataset[SwaResult] = {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val idleUs = evict.map(_._1)
    val prepared = evict match {
      case Some((_, delayMs)) =>
        events.withColumn("__graft_wm", timestamp_micros(col("tsMicros")))
          .withWatermark("__graft_wm", s"$delayMs milliseconds")
          .as[Event](eventEnc)
      case None => events
    }
    val timeoutConf =
      if (idleUs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    prepared
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (key: Long, batch: Iterator[Event], state: GroupState[SwaState]) =>
          if (state.hasTimedOut) {
            // idle key: the watermark passed newest-event + idleTimeout
            state.remove()
            Iterator.empty
          } else {
          val buf = mutable.ArrayDeque.from(
            state.getOption.map(_.events).getOrElse(Nil))
          var sum = 0.0
          // classic sliding-window-extrema deques: ts ascending, values
          // monotone; the head is always the window min/max
          val minDq = mutable.ArrayDeque.empty[(Long, Double)]
          val maxDq = mutable.ArrayDeque.empty[(Long, Double)]
          def push(ts: Long, v: Double): Unit = {
            while (minDq.nonEmpty && minDq.last._2 >= v) minDq.removeLast()
            minDq.append((ts, v))
            while (maxDq.nonEmpty && maxDq.last._2 <= v) maxDq.removeLast()
            maxDq.append((ts, v))
          }
          def rebuild(): Unit = {
            sum = 0.0; minDq.clear(); maxDq.clear()
            buf.foreach { case (ts, v) => sum += v; push(ts, v) }
          }
          rebuild()

          val out = batch.toSeq.sortBy(_.tsMicros).map { e =>
            if (buf.isEmpty || e.tsMicros >= buf.last._1) {
              // in-order fast path: O(1) amortized
              buf.append((e.tsMicros, e.value))
              sum += e.value
              push(e.tsMicros, e.value)
              val cutoff = e.tsMicros - wUs
              while (buf.nonEmpty && buf.head._1 <= cutoff) {
                sum -= buf.removeHead()._2
              }
              while (minDq.nonEmpty && minDq.head._1 <= cutoff) minDq.removeHead()
              while (maxDq.nonEmpty && maxDq.head._1 <= cutoff) maxDq.removeHead()
              val n = buf.size
              SwaResult(key, e.tsMicros, sum, n.toLong,
                minDq.head._2, maxDq.head._2, sum / n)
            } else {
              // late event: exact one-off scan over its own window; the
              // buffer keeps newer events (they still need this row)
              val idx = buf.lastIndexWhere(_._1 <= e.tsMicros) + 1
              buf.insert(idx, (e.tsMicros, e.value))
              rebuild()
              val vals = buf.iterator
                .filter { case (ts, _) => ts > e.tsMicros - wUs && ts <= e.tsMicros }
                .map(_._2).toVector
              SwaResult(key, e.tsMicros, vals.sum, vals.size.toLong,
                vals.min, vals.max, vals.sum / vals.size)
            }
          }
          state.update(SwaState(buf.toList))
          idleUs.foreach { idle =>
            // fire when the watermark passes newest-event + idle; the
            // floor keeps the call legal (Spark requires a timeout
            // timestamp strictly beyond the current watermark)
            state.setTimeoutTimestamp(math.max(
              (buf.last._1 + idle) / 1000, state.getCurrentWatermarkMs + 1))
          }
          out.iterator
          }
      }
  }
}
