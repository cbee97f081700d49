package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single point of truth for normalizing the fixtures' event-time column
  * to Spark `TimestampType` (reference event-time parsing contract:
  * feathr-rs/src/observation.rs:99-130; watermark semantics SURVEY §2.7).
  *
  * The driver has regenerated `events.parquet` with three distinct
  * physical encodings across rounds, and every one must keep working:
  *
  *   - `TIMESTAMP(NANOS)`: Spark 4's parquet reader surfaces it as
  *     `LongType` under `spark.sql.legacy.parquet.nanosAsLong` — convert
  *     nanos → micros (lossless for this data, and what DuckDB does).
  *   - `TIMESTAMP(MICROS, isAdjustedToUTC=false)` (NTZ): Spark reads
  *     `TimestampNTZType`, which `withWatermark` and `unix_micros`
  *     reject — cast to `TimestampType`, value-preserving under the UTC
  *     session the harness pins, with DuckDB oracle semantics unchanged
  *     (it already treats ts as wall-clock).
  *   - `TIMESTAMP(MICROS, isAdjustedToUTC=true)`: already
  *     `TimestampType` — pass through.
  *
  * Keep ALL event-time shimming here: round 9 proved that copy-pasting
  * this logic across files turns one fixture drift into a 7-site red.
  */
object EventTime {

  /** Column-level normalizer, dispatched on the column's physical type
    * (callers that build a NEW column — the S7 observation-ts parser —
    * need the expression, not an in-place rewrite). Unlisted types fall
    * through to a plain timestamp cast, the historical `native`
    * behavior for e.g. string columns.
    */
  def normalizeCol(c: Column, dt: DataType): Column = dt match {
    // integer division — (c / 1000).cast(long) would round-trip through
    // double and lose precision above 2^53 (every nanos epoch value)
    case LongType => timestamp_micros(call_function("div", c, lit(1000L)))
    case TimestampNTZType => c.cast(TimestampType)
    case _ => c.cast(TimestampType)
  }

  /** Normalize `column` (default `ts`) to `TimestampType`; no-op when the
    * column is absent or already a timestamp.
    */
  def normalize(df: DataFrame, column: String = "ts"): DataFrame =
    if (!df.columns.contains(column)) df
    else df.schema(column).dataType match {
      case dt @ (LongType | TimestampNTZType) =>
        df.withColumn(column, normalizeCol(col(column), dt))
      case _ => df
    }

  /** Chain-friendly syntax: `df.normalizeEventTime` ≡ `normalize(df)`. */
  implicit class Ops(private val df: DataFrame) extends AnyVal {
    def normalizeEventTime: DataFrame = EventTime.normalize(df)
  }
}
