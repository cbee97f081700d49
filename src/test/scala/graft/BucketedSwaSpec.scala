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

  test("LATEST/UNION stays on the exact range join; record-limit and group_by bucket") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.graft.swa.bucketSeconds", "86400")
    try {
      // non-decomposable aggs without a limit: raw range join
      val latest = SparkEntry.queries("q_swa_latest_union")(spark, sf)
      assert(!latest.queryExecution.analyzed.toString.contains("__graft_ps_"))
      assert(latest.orderBy("event_id").collect().nonEmpty)
      // record-limit without group_by: bucketed top-k-newest plan (raw
      // ≤ k rows per (key, bucket) partial — not pre-agg columns)
      val fl = SparkEntry.queries("q_swa_filter_limit")(spark, sf)
      assert(!fl.queryExecution.analyzed.toString.contains("__graft_ps_"))
      assert(fl.queryExecution.analyzed.toString.contains("__graft_bl_rn"))
      assert(fl.orderBy("event_id").collect().nonEmpty)
      // group_by (with or without limit) takes the bucketed plan — the
      // queries' own engagement require()s throw if it disengages
      SparkEntry.queries("q_swa_groupby")(spark, sf)
      SparkEntry.queries("q_swa_groupby_limit")(spark, sf)
    } finally spark.conf.unset("spark.graft.swa.bucketSeconds")
  }
}
