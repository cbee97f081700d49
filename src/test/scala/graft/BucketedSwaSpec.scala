package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The bucketed SWA pre-aggregation is EXACT — it must agree with the
  * raw range-join plan on every row (floats compared after rounding:
  * partial-sum order differs).
  */
class BucketedSwaSpec extends SparkTestBase {
  import spark.implicits._

  private def runSwa(): Array[Row] =
    SparkEntry.queries("q_swa_basic")(spark, sf).orderBy("event_id").collect()

  test("bucketed SWA (1d and 6h buckets) matches the exact plan") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.unset("spark.graft.swa.bucketSeconds")
    val exact = runSwa()
    for (bucket <- Seq(86400L, 21600L)) {
      spark.conf.set("spark.graft.swa.bucketSeconds", bucket.toString)
      val bucketed = try runSwa()
        finally spark.conf.unset("spark.graft.swa.bucketSeconds")
      assert(exact.length == bucketed.length, s"bucket=$bucket row count")
      exact.zip(bucketed).foreach { case (a, b) =>
        assert(a == b, s"bucket=$bucket\n exact:    $a\n bucketed: $b")
      }
    }
  }

  test("bucketed path leaves LATEST/UNION/groupBy/limit clusters on the exact plan") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.graft.swa.bucketSeconds", "86400")
    try {
      val latest = SparkEntry.queries("q_swa_latest_union")(spark, sf)
        .orderBy("event_id").collect()
      val fl = SparkEntry.queries("q_swa_filter_limit")(spark, sf)
        .orderBy("event_id").collect()
      assert(latest.nonEmpty && fl.nonEmpty)
    } finally spark.conf.unset("spark.graft.swa.bucketSeconds")
  }
}
