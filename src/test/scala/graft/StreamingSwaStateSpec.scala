package graft

import graft.operators.{IncrementalSwa, Spill}
import graft.operators.IncrementalSwa.Config
import graft.streaming.StreamingIngest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class StreamingSwaStateSpec extends SparkTestBase {
  import spark.implicits._

  private val DayUs = 86400000000L
  private val cfg = Config(Seq("k"), "ts", "v", DayUs)

  private def ev(rows: (Long, Int, Double)*): DataFrame =
    rows.toDF("k", "d", "v")
      .withColumn("ts", timestamp_micros(col("d") * DayUs + 3600000000L))
      .select("k", "ts", "v")

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  test("streamed state equals direct ingest regardless of batch boundaries") {
    val all = ev((1L, 0, 1.5), (1L, 1, 2.0), (2L, 0, 3.0), (2L, 2, 4.5),
      (3L, 1, 0.25))
    // three separate appends → ≥3 files → one micro-batch per file;
    // the file/batch split need not align with any logical delta —
    // additive state is split-invariant
    val feed = Spill.newPath(spark) + "/feed"
    ev((1L, 0, 1.5), (1L, 1, 2.0)).coalesce(1).write.mode("append").parquet(feed)
    ev((2L, 0, 3.0), (2L, 2, 4.5)).coalesce(1).write.mode("append").parquet(feed)
    ev((3L, 1, 0.25)).coalesce(1).write.mode("append").parquet(feed)

    val streamed = Spill.newPath(spark)
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", "1").parquet(feed)
    StreamingIngest.swaStateStream(stream, streamed, cfg)
    assert(IncrementalSwa.versions(spark, streamed).size >= 3)

    val direct = Spill.newPath(spark)
    IncrementalSwa.ingest(all, direct, cfg, 0L)

    for (w <- Seq(1, 2, 3)) {
      assert(multiset(IncrementalSwa.serve(spark, streamed, cfg, 3 * DayUs, w)) ==
        multiset(IncrementalSwa.serve(spark, direct, cfg, 3 * DayUs, w)),
        s"window $w")
    }
  }
}
