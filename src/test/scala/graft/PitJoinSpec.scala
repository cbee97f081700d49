package graft

import graft.EventTime.Ops
import graft.model._
import graft.operators._
import graft.project._
import graft.sources._

import org.apache.spark.sql.functions._

/** Point-in-time join semantics on the sf0.001 fixtures: no future
  * leakage, boundary inclusivity `(obs_ts - w, obs_ts]`, tie handling,
  * left-outer null semantics.
  */
class PitJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def events = spark.read
    .option("mergeSchema", "false")
    .parquet(s"$sf/events.parquet")

  test("as-of join never leaks the future") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = SparkEntry.queries("q_asof_join")(spark, sf)
    // recompute the max qualifying source value per output row
    val src = spark.read.parquet(s"$sf/events.parquet")
      .normalizeEventTime
      .where($"event_type" === "purchase")
      .select($"user_id".as("u"), $"ts".as("sts"), $"value".as("sval"))
    val joined = df.join(src, $"user_id" === $"u" && $"sts" <= $"ts", "left")
      .groupBy($"event_id", $"ts", $"f_last_value")
      .agg(max_by($"sval", $"sts").as("expect"))
    val bad = joined.where(
      ($"f_last_value".isNotNull || $"expect".isNotNull) &&
      !($"f_last_value" <=> $"expect")).count()
    assert(bad == 0)
  }

  test("window boundary is (obs_ts - w, obs_ts]: a row exactly at obs_ts counts") {
    val src = Seq((1L, "2024-01-10 00:00:00", 10.0),
                  (1L, "2024-01-03 00:00:00", 5.0),   // exactly obs-7d: excluded
                  (1L, "2024-01-03 00:00:01", 2.0))   // just inside
      .toDF("k", "ts_s", "v").withColumn("ts", $"ts_s".cast("timestamp"))
    val obs = Seq((1L, "2024-01-10 00:00:00")).toDF("k", "ts_s")
      .withColumn("ts", $"ts_s".cast("timestamp")).select("k", "ts")
    src.createOrReplaceTempView("boundary_src")
    val p = FeatureProject("b")
    val key = TypedKey("k", ValueType.INT64)
    p.addAnchorGroup("g", Source("src", DataLocation.Table("boundary_src"),
      timeWindow = Some(TimeWindowParameters("ts", "native"))), Seq(
      AnchorFeature("f_sum", FeatureType.DOUBLE,
        Transformation.windowAgg("v", "SUM", "7d"), Seq(key))))
    val out = FeathrClient.joinFeatures(spark, p, obs, Some(("ts", "native")),
      Seq(FeatureQuery(Seq("f_sum"), Seq("k")))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("f_sum") == 12.0) // 10 (at obs_ts) + 2 (inside); 5 excluded
  }

  test("missing keys yield nulls (left outer), not dropped rows") {
    val obs = Seq((999999L, "2024-01-15 00:00:00")).toDF("user_id", "ts_s")
      .withColumn("ts", $"ts_s".cast("timestamp")).select("user_id", "ts")
    val p = FeatureProject("events_demo_local")
    val purchases = Source("purchases", DataLocation.Hdfs(s"$sf/events.parquet"),
      timeWindow = Some(TimeWindowParameters("ts", "native")),
      preprocessing = Some { df =>
        df.normalizeEventTime.where(col("event_type") === "purchase")
      })
    p.addAnchorGroup("a", purchases, Seq(
      AnchorFeature("f_last", FeatureType.DOUBLE,
        Transformation.Expr("value"), Seq(TypedKey("user_id", ValueType.INT64))),
      AnchorFeature("f_sum", FeatureType.DOUBLE,
        Transformation.windowAgg("value", "SUM", "7d"),
        Seq(TypedKey("user_id", ValueType.INT64)))))
    val out = FeathrClient.joinFeatures(spark, p, obs, Some(("ts", "native")),
      Seq(FeatureQuery(Seq("f_last", "f_sum"), Seq("user_id")))).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("f_last")))
    assert(out.head.isNullAt(out.head.fieldIndex("f_sum")))
  }

  test("SWA partial/final consistency: 7d sum equals brute-force (property over data)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = SparkEntry.queries("q_swa_basic")(spark, sf)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .normalizeEventTime
    val clicks = ev.where($"event_type" === "click")
      .select($"event_id", $"user_id".as("cu"), $"ts".as("ots"))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts".as("sts"), $"value")
    val brute = clicks.join(purchases,
        $"cu" === $"pu" && $"sts" > $"ots" - expr("INTERVAL 7 DAY") &&
        $"sts" <= $"ots", "left")
      .groupBy("event_id").agg(round(sum($"value"), 4).as("expect"))
    val cmp = out.select($"event_id", $"f_sum_7d").join(brute, "event_id")
    assert(cmp.where(!($"f_sum_7d" <=> $"expect")).count() == 0)
  }

  test("materialization backfill emits one snapshot per step (M1)") {
    import java.time.Instant
    val p = {
      val pp = FeatureProject("m")
      val purchases = Source("purchases", DataLocation.Hdfs(s"$sf/events.parquet"),
        timeWindow = Some(TimeWindowParameters("ts", "native")),
        preprocessing = Some { df =>
          df.normalizeEventTime
            .where(col("event_type") === "purchase")
        })
      pp.addAnchorGroup("a", purchases, Seq(
        AnchorFeature("f_last", FeatureType.DOUBLE,
          Transformation.Expr("value"), Seq(TypedKey("user_id", ValueType.INT64)))))
      pp
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tmp = java.nio.file.Files.createTempDirectory("graft_store").toString
    val store = new FileOnlineStore(tmp)
    val out = Materializer.backfill(spark, p, Seq("f_last"), Seq("user_id"),
      Instant.parse("2024-01-10T00:00:00Z"), Instant.parse("2024-01-12T00:00:00Z"),
      DateTimeResolution.Daily,
      Seq(OutputSink.Online("feat", store)))
    // 10th, 11th, 12th — all from one plan
    assert(out.select("__step_end").distinct().count() == 3)
    val written = new java.io.File(tmp, "feat").list()
    assert(written != null && written.nonEmpty)
  }

  test("M1/M2 consistency: a backfill step equals the snapshot at the same endTime") {
    import java.time.Instant
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val p = {
      val pp = FeatureProject("m12")
      val purchases = Source("purchases", DataLocation.Hdfs(s"$sf/events.parquet"),
        timeWindow = Some(TimeWindowParameters("ts", "native")),
        preprocessing = Some { df =>
          df.normalizeEventTime
            .where(col("event_type") === "purchase")
        })
      pp.addAnchorGroup("a", purchases, Seq(
        AnchorFeature("f_last", FeatureType.DOUBLE,
          Transformation.Expr("value"), Seq(TypedKey("user_id", ValueType.INT64))),
        AnchorFeature("f_sum_7d", FeatureType.DOUBLE,
          Transformation.windowAgg("value", "SUM", "7d"),
          Seq(TypedKey("user_id", ValueType.INT64)))))
      pp
    }
    val t = Instant.parse("2024-01-15T00:00:00Z")
    val feats = Seq("f_last", "f_sum_7d")
    // quantize the float SUM before the exact set compare: snapshot and
    // backfill are two INDEPENDENT evaluations, and a float sum's
    // low-order bits depend on partial-aggregation order (task
    // scheduling) — values sit on the 0.01 grid, so round(·, 4)
    // collapses the ulp jitter without masking real differences (the
    // same flake class as the r6 online/offline consistency test)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("f_sum_7d", round(col("f_sum_7d"), 4))
    val snap = canon(Materializer.snapshot(spark, p, feats, Seq("user_id"), t))
    val step = canon(Materializer.backfill(spark, p, feats, Seq("user_id"),
        Instant.parse("2024-01-14T00:00:00Z"), t, DateTimeResolution.Daily, Nil)
      .where(col("__step_end") === lit(java.sql.Timestamp.from(t)))
      .drop("__step_end"))
    assert(snap.count() == step.count())
    assert(snap.exceptAll(step).isEmpty && step.exceptAll(snap).isEmpty)
  }

  test("M3: one evaluation fans out to offline AND online sinks") {
    import java.time.Instant
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val p = {
      val pp = FeatureProject("m3")
      val purchases = Source("purchases", DataLocation.Hdfs(s"$sf/events.parquet"),
        timeWindow = Some(TimeWindowParameters("ts", "native")),
        preprocessing = Some { df =>
          df.normalizeEventTime
            .where(col("event_type") === "purchase")
        })
      pp.addAnchorGroup("a", purchases, Seq(
        AnchorFeature("f_last", FeatureType.DOUBLE,
          Transformation.Expr("value"), Seq(TypedKey("user_id", ValueType.INT64)))))
      pp
    }
    val base = java.nio.file.Files.createTempDirectory("graft_fanout")
    val offline = new java.io.File(base.toFile, "offline").toString
    val storeDir = new java.io.File(base.toFile, "online").toString
    val store = new FileOnlineStore(storeDir)
    val out = Materializer.snapshot(spark, p, Seq("f_last"), Seq("user_id"),
      Instant.parse("2024-01-12T00:00:00Z"))
    Materializer.writeAll(out, Seq("user_id"),
      Seq(OutputSink.hdfs(s"$offline/snap.parquet"),
        OutputSink.Online("feat", store)))
    // offline sink: parquet round-trips the same rows
    val back = spark.read.parquet(s"$offline/snap.parquet")
    assert(back.count() == out.count() && back.count() > 0)
    // online sink: one entry per key, value carries the feature column
    val keys = new java.io.File(storeDir, "feat").list()
    assert(keys != null && keys.length.toLong == out.count())
    val one = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(new java.io.File(storeDir, "feat"), keys.head).toPath))
    assert(one.contains("f_last="))
  }

  test("spark.graft.join.checkUnique fails a duplicate-keyed snapshot source by anchor name (J1 guard)") {
    import spark.implicits._
    val key = TypedKey("k", ValueType.INT64)
    val obs = Seq(1L, 2L).toDF("k")
    Seq((1L, 10.0), (1L, 20.0), (2L, 30.0)).toDF("k", "v")
      .createOrReplaceTempView("uq_dup_src")
    val p = FeatureProject("uq")
    p.addAnchorGroup("dup_anchor", Source("src", DataLocation.Table("uq_dup_src")), Seq(
      AnchorFeature("f_v", FeatureType.DOUBLE, Transformation.Expr("v"), Seq(key))))
    spark.conf.set("spark.graft.join.checkUnique", "true")
    try {
      val e = intercept[IllegalStateException] {
        FeathrClient.joinFeatures(spark, p, obs, None,
          Seq(FeatureQuery(Seq("f_v"), Seq("k"))))
      }
      assert(e.getMessage.contains("dup_anchor") && e.getMessage.contains("key-unique"))
      // a key-unique source passes the guard untouched
      Seq((1L, 10.0), (2L, 30.0)).toDF("k", "v")
        .createOrReplaceTempView("uq_ok_src")
      val p2 = FeatureProject("uq2")
      p2.addAnchorGroup("ok_anchor", Source("src", DataLocation.Table("uq_ok_src")), Seq(
        AnchorFeature("f_v", FeatureType.DOUBLE, Transformation.Expr("v"), Seq(key))))
      val out = FeathrClient.joinFeatures(spark, p2, obs, None,
        Seq(FeatureQuery(Seq("f_v"), Seq("k"))))
      assert(out.count() == 2)
    } finally spark.conf.unset("spark.graft.join.checkUnique")
  }
}
