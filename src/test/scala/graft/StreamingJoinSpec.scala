package graft

import graft.streaming.StreamingIngest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join: batch parity on the fixture, and the
  * leftOuter watermark-completion contract on a hand-fed stream.
  */
class StreamingJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  test("inner interval join: stream equals the batch BETWEEN join row-for-row") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val ev = EventTime.normalize(raw)
    val rawSchema = raw.schema

    def streamOf(tpe: String) = EventTime.normalize(
      spark.readStream.schema(rawSchema).option("basePath", sf)
        .parquet(s"$sf/events.parque*"))
      .where(col("event_type") === tpe)

    val p = streamOf("purchase").select(col("user_id"),
      col("event_id").as("p_event_id"), col("ts").as("p_ts"))
    val v = streamOf("view").select(col("user_id").as("v_user_id"),
      col("event_id").as("v_event_id"), col("ts").as("v_ts"))

    val name = s"ij_out_${System.nanoTime()}"
    val q = StreamingIngest.intervalJoin(p, v, Seq("user_id" -> "v_user_id"),
        "p_ts", "v_ts", lookbackSeconds = 6 * 3600L, watermarkDelay = "1 hour")
      .select(col("p_event_id"), col("v_event_id"))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table(name)

    val pb = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"), col("ts").as("p_ts"))
    val vb = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("v_event_id"),
        col("ts").as("v_ts"))
    val want = pb.join(vb, col("user_id") === col("v_user_id") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 6 HOUR") &&
        col("v_ts") <= col("p_ts"))
      .select("p_event_id", "v_event_id")

    assert(got.count() > 0, "fixture must produce at least one pair")
    assert(multiset(got) == multiset(want))
  }

  test("leftOuter: unmatched spine rows emit exactly once the watermark passes them") {
    // spine s1 has a match, s2 does not; the late third batch only
    // advances the watermark past both spines
    import StreamingJoinSpec.E
    implicit val sqlCtx = spark.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)

    val spine = MemoryStream[E]
    val other = MemoryStream[E]

    val name = s"ij_outer_${System.nanoTime()}"
    val q = StreamingIngest.intervalJoin(
        spine.toDF().select($"k", $"ts".as("s_ts"), $"id".as("s_id")),
        other.toDF().select($"k".as("o_k"), $"ts".as("o_ts"), $"id".as("o_id")),
        Seq("k" -> "o_k"), "s_ts", "o_ts",
        lookbackSeconds = 60L, watermarkDelay = "10 seconds",
        joinType = "leftOuter")
      .select($"s_id", $"o_id")
      .writeStream.outputMode("append").format("memory").queryName(name).start()

    spine.addData(E(1, t(100), "s1"), E(2, t(100), "s2"))
    other.addData(E(1, t(80), "o1")) // within s1's 60s lookback
    q.processAllAvailable()
    // watermark still at t(100)-10s: s2's null row must NOT be out yet
    assert(spark.table(name).as[(String, Option[String])].collect().toSet ==
      Set(("s1", Some("o1"))))

    // push watermark past the spines: 100 + lookback already over, add
    // far-future events on both inputs (both watermarks must advance)
    spine.addData(E(9, t(1000), "sLate"))
    other.addData(E(9, t(1000), "oLate"))
    q.processAllAvailable(); q.stop()

    val rows = spark.table(name).as[(String, Option[String])].collect().toSet
    assert(rows.contains(("s2", None)), s"expected s2 null row, got $rows")
    assert(rows.count(_._1 == "s1") == 1, "matched spine must not re-emit")
  }
}

object StreamingJoinSpec {
  case class E(k: Long, ts: java.sql.Timestamp, id: String)
}
