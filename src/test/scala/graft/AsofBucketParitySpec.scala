package graft

import graft.model._
import graft.project._
import graft.sources._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bucketed as-of join (spark.graft.asof.bucketSeconds) must be a
  * pure PHYSICAL variant: identical results to the union-sort
  * formulation on the fixture query, on Zipf-skewed keys, on tied
  * timestamps (the greatest-value-struct rule), on rows exactly at
  * bucket boundaries, and on pre-epoch timestamps (floor division).
  */
class AsofBucketParitySpec extends SparkTestBase {
  import spark.implicits._

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  private def withBucket[A](seconds: String)(f: => A): A = {
    spark.conf.set("spark.graft.asof.bucketSeconds", seconds)
    try f finally spark.conf.unset("spark.graft.asof.bucketSeconds")
  }

  test("fixture q_asof_join: bucketed equals union-sort") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val plain = multiset(SparkEntry.queries("q_asof_join")(spark, sf))
    val bucketed = withBucket("21600") {
      multiset(SparkEntry.queries("q_asof_join")(spark, sf))
    }
    assert(plain.nonEmpty && bucketed == plain)
  }

  test("synthetic Zipf keys, tied timestamps, boundary rows, pre-epoch: parity") {
    // heavy-skew keys (hottest key takes ~10 % of rows), a COARSE
    // timestamp grid (many exact ties, and every grid point a multiple
    // of the bucket width so boundary rows are exercised), timestamps
    // straddling the epoch (negative micros -> floor division)
    def zipfKey(c: org.apache.spark.sql.Column) =
      floor(pow(lit(100.0),
        pmod(xxhash64(c), lit(10000)).cast("double") / 10000.0)).cast("long")
    val src = spark.range(20000).select(
      zipfKey(col("id")).as("k"),
      timestamp_seconds(
        pmod(xxhash64(col("id") + 7), lit(4000)) * 30 - lit(30000)).as("ts"),
      (pmod(xxhash64(col("id") + 13), lit(1000)).cast("double") / 10.0).as("value"))
    val obs = spark.range(3000).select(
      zipfKey(col("id") * 31 + 5).as("k"),
      timestamp_seconds(
        pmod(xxhash64(col("id") + 23), lit(4000)) * 30 - lit(30000)).as("ts"))
    src.createOrReplaceTempView("asof_parity_src")

    def run(): DataFrame = {
      val p = FeatureProject("asof_parity")
      p.addAnchorGroup("g",
        Source("s", DataLocation.Table("asof_parity_src"),
          timeWindow = Some(TimeWindowParameters("ts", "native"))),
        Seq(AnchorFeature("f_last", FeatureType.DOUBLE,
          Transformation.Expr("value"),
          Seq(TypedKey("k", ValueType.INT64)))))
      FeathrClient.joinFeatures(spark, p, obs, Some(("ts", "native")),
        Seq(FeatureQuery(Seq("f_last"), Seq("k"))))
    }

    val plain = multiset(run())
    // 30-second buckets: every source/obs timestamp lands ON a bucket
    // boundary; 300-second buckets: ties and carries across buckets;
    // "auto" derives span/64 from the source itself (SWA parity)
    for (bs <- Seq("30", "300", "1000000", "auto")) {
      val bucketed = withBucket(bs) { multiset(run()) }
      assert(bucketed == plain, s"bucketSeconds=$bs diverged")
    }
    assert(plain.nonEmpty)
  }

  test("fixture q_asof_join: auto-derived bucket width equals union-sort") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val plain = multiset(SparkEntry.queries("q_asof_join")(spark, sf))
    val auto = withBucket("auto") {
      multiset(SparkEntry.queries("q_asof_join")(spark, sf))
    }
    assert(plain.nonEmpty && auto == plain)
  }
}
