package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hard gate on driver fixture drift (the round-9 failure mode): if the
  * driver regenerates a fixture with a physical type the readers can't
  * normalize, THIS fails with a named diff — not 11 scattered analysis
  * errors across unrelated suites.
  */
class FixtureContractSpec extends SparkTestBase {

  test("all fixtures match the schema contract at sf0.001") {
    val vs = FixtureContract.check(spark, sf)
    assert(vs.isEmpty, "\n" + vs.mkString("\n"))
  }

  test("all fixtures match the schema contract at sf0.01") {
    val vs = FixtureContract.check(spark, "/root/testdata/sf0.01")
    assert(vs.isEmpty, "\n" + vs.mkString("\n"))
  }

  test("EventTime.normalize handles all three observed ts encodings") {
    import spark.implicits._
    // nanos-as-long
    val asLong = Seq((1L, 1704067200000000000L)).toDF("id", "ts")
    assert(EventTime.normalize(asLong).schema("ts").dataType == TimestampType)
    assert(EventTime.normalize(asLong).select(unix_micros(col("ts")))
      .head.getLong(0) == 1704067200000000L)
    // micro-NTZ: value-preserving cast under the pinned UTC session
    val ntz = asLong.select(col("id"),
      timestamp_micros(expr("ts DIV 1000")).cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    assert(EventTime.normalize(ntz).schema("ts").dataType == TimestampType)
    assert(EventTime.normalize(ntz).select(unix_micros(col("ts")))
      .head.getLong(0) == 1704067200000000L)
    // already TimestampType: byte-for-byte pass-through
    val tz = asLong.select(col("id"),
      timestamp_micros(expr("ts DIV 1000")).as("ts"))
    assert(EventTime.normalize(tz).schema == tz.schema)
    // absent column: no-op
    assert(EventTime.normalize(asLong.select("id")).columns.sameElements(Array("id")))
  }

  test("normalized events fixture supports watermark and unix_micros") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = EventTime.normalize(spark.read.parquet(s"$sf/events.parquet"))
    assert(ev.schema("ts").dataType == TimestampType)
    // unix_micros rejected NTZ in round 9 — must analyze now
    assert(ev.select(unix_micros(col("ts"))).head.getLong(0) > 0L)
    // withWatermark rejected NTZ in round 9 — must analyze now
    val withWm = ev.withWatermark("ts", "1 hour")
    assert(withWm.schema("ts").dataType == TimestampType)
  }
}
