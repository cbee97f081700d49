package graft

import graft.operators.{BucketedLayout, Spill}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class BucketedLayoutSpec extends SparkTestBase {

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  /** run `f` with broadcast joins disabled so the join strategy under
    * test is sort-merge (a broadcast join would hide the Exchange
    * accounting the layout exists to eliminate)
    */
  private def noBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private lazy val setup: Unit = {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    // pre-partition by the bucket key so each task owns exactly one
    // bucket: one file per bucket, which is also what lets the scan
    // report per-bucket sort order
    BucketedLayout.write(cust.repartition(8, col("c_custkey")),
      "blt_cust", Spill.newPath(spark), Seq("c_custkey"), 8)
    BucketedLayout.write(ord.repartition(8, col("o_custkey")),
      "blt_ord", Spill.newPath(spark), Seq("o_custkey"), 8)
  }

  test("both sides bucketed on the join key: zero shuffles, same answer") {
    setup
    noBroadcast {
      val bucketed = BucketedLayout.table(spark, "blt_cust")
        .join(BucketedLayout.table(spark, "blt_ord"),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("total"))
      assert(BucketedLayout.shuffleCount(bucketed) == 0,
        s"expected shuffle-free plan:\n${bucketed.queryExecution.executedPlan}")

      val plain = spark.read.parquet(s"$sf/customer.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet"),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("total"))
      assert(multiset(bucketed) == multiset(plain))
    }
  }

  test("one side bucketed: only the unbucketed side shuffles") {
    setup
    noBroadcast {
      val half = BucketedLayout.table(spark, "blt_ord")
        .join(spark.read.parquet(s"$sf/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_mktsegment")
      assert(BucketedLayout.shuffleCount(half) == 1,
        s"expected exactly one Exchange:\n${half.queryExecution.executedPlan}")
    }
  }

  test("bucketed+sorted single-file buckets: merge join needs no extra sort on the scan") {
    setup
    noBroadcast {
      // Spark 3+ stopped reporting bucket-file sort order by default
      // (reporting it forces single-file-per-bucket scans, SPARK-28632);
      // with one file per bucket — our write shape — opting back in is
      // pure win: the merge join's Sorts disappear
      val prev = spark.conf
        .get("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      try {
        val j = BucketedLayout.table(spark, "blt_cust")
          .join(BucketedLayout.table(spark, "blt_ord"),
            col("c_custkey") === col("o_custkey"))
          .select("c_custkey", "o_orderkey")
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"))
        // both scans expose bucket-file sort order → SMJ elides its
        // Sorts ("Sort [" — not the SortMergeJoin node itself)
        assert(!plan.contains("Sort ["),
          s"expected sort-free merge join:\n$plan")
      } finally spark.conf
        .set("spark.sql.legacy.bucketedTableScan.outputOrdering", prev)
    }
  }

  test("write is idempotent: rewrite replaces table and path cleanly") {
    setup
    val before = spark.table("blt_cust").count()
    BucketedLayout.write(
      spark.read.parquet(s"$sf/customer.parquet").repartition(8, col("c_custkey")),
      "blt_cust", Spill.newPath(spark), Seq("c_custkey"), 8)
    assert(spark.table("blt_cust").count() == before)
  }
}
