package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sliding-window aggregation with custom state
  * (SURVEY.md §2.7: `KeyValueGroupedDataset.flatMapGroupsWithState`).
  *
  * For every incoming event this emits the aggregate over
  * `(event_ts - window, event_ts]` for its key — the streaming
  * equivalent of the batch SWA features with the observation spine
  * equal to the source itself. Batch/stream parity is exact for
  * in-order streams (events late across micro-batches older than the
  * window are dropped by the state trim; use a watermark upstream to
  * bound buffering).
  *
  * State per key is the event buffer inside the window — bounded by
  * window × event rate, the same bound the batch range join carries
  * per (key, window).
  */
object StreamingSwa {

  case class Event(key: Long, tsMicros: Long, value: Double)
  case class SwaResult(key: Long, tsMicros: Long,
      f_sum: Double, f_cnt: Long, f_min: Double, f_max: Double, f_avg: Double)
  case class SwaState(events: List[(Long, Double)])

  implicit val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit val resultEnc: Encoder[SwaResult] = Encoders.product[SwaResult]
  implicit val stateEnc: Encoder[SwaState] = Encoders.product[SwaState]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  def apply(events: Dataset[Event], windowSeconds: Long): Dataset[SwaResult] = {
    val wUs = windowSeconds * 1000000L
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[Event], state: GroupState[SwaState]) =>
          var buf = state.getOption.map(_.events).getOrElse(Nil)
          val out = batch.toSeq.sortBy(_.tsMicros).map { e =>
            buf = ((e.tsMicros, e.value) :: buf)
              .filter { case (ts, _) => ts > e.tsMicros - wUs && ts <= e.tsMicros }
            val vals = buf.map(_._2)
            SwaResult(key, e.tsMicros,
              f_sum = vals.sum,
              f_cnt = vals.size.toLong,
              f_min = vals.min,
              f_max = vals.max,
              f_avg = vals.sum / vals.size)
          }
          state.update(SwaState(buf))
          out.iterator
      }
  }
}
