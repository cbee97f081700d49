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

  test("bucketed SWA (auto, 1d and 6h buckets) matches the exact plan") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.graft.swa.bucketSeconds", "off")
    val exact = try runSwa()
      finally spark.conf.unset("spark.graft.swa.bucketSeconds")
    for (bucket <- Seq("auto", "86400", "21600")) {
      spark.conf.set("spark.graft.swa.bucketSeconds", bucket)
      val bucketed = try runSwa()
        finally spark.conf.unset("spark.graft.swa.bucketSeconds")
      assert(exact.length == bucketed.length, s"bucket=$bucket row count")
      exact.zip(bucketed).foreach { case (a, b) =>
        assert(a == b, s"bucket=$bucket\n exact:    $a\n bucketed: $b")
      }
    }
  }

  test("the bucketed pre-agg path is the DEFAULT plan for decomposable aggs") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.unset("spark.graft.swa.bucketSeconds")
    val df = SparkEntry.queries("q_swa_basic")(spark, sf)
    // the bucketed plan's partial-aggregate columns are its signature
    assert(df.queryExecution.analyzed.toString.contains("__graft_ps_"),
      "expected the bucketed pre-aggregation plan by default")
    spark.conf.set("spark.graft.swa.bucketSeconds", "off")
    try {
      val off = SparkEntry.queries("q_swa_basic")(spark, sf)
      assert(!off.queryExecution.analyzed.toString.contains("__graft_ps_"),
        "bucketSeconds=off must fall back to the raw range join")
    } finally spark.conf.unset("spark.graft.swa.bucketSeconds")
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
