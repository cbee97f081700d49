package graft

import graft.EventTime.Ops
import graft.model._
import graft.operators._
import graft.project._
import graft.sources._
import graft.functions.UdfRegistry
import graft.streaming.StreamingIngest

import org.apache.spark.sql.functions._

/** Coverage for the remaining §2 operators: E5 named UDFs, A4/A5
  * aggregation variants, K1/K3 generic sinks, K4/T3 streaming sink
  * with timeout, multimodal plumbing.
  */
class OperatorsSpec extends SparkTestBase {
  import spark.implicits._

  private def mkTimedProject(viewName: String, feats: Seq[AnchorFeature]): FeatureProject = {
    val p = FeatureProject("t")
    p.addAnchorGroup("g", Source("src", DataLocation.Table(viewName),
      timeWindow = Some(TimeWindowParameters("ts", "native"))), feats)
    p
  }
  private val key = TypedKey("k", ValueType.INT64)

  test("E5: named UDF transform resolves from the registry") {
    UdfRegistry.register("double_value")(df => col("v") * 2)
    Seq((1L, "2024-01-01 00:00:00", 21.0))
      .toDF("k", "ts_s", "v")
      .withColumn("ts", $"ts_s".cast("timestamp"))
      .createOrReplaceTempView("udf_src")
    val p = mkTimedProject("udf_src", Seq(
      AnchorFeature("f_doubled", FeatureType.DOUBLE,
        Transformation.Udf("double_value"), Seq(key))))
    val obs = Seq((1L, "2024-01-02 00:00:00")).toDF("k", "ts_s")
      .withColumn("ts", $"ts_s".cast("timestamp")).select("k", "ts")
    val out = FeathrClient.joinFeatures(spark, p, obs, Some(("ts", "native")),
      Seq(FeatureQuery(Seq("f_doubled"), Seq("k")))).collect()
    assert(out.head.getAs[Double]("f_doubled") == 42.0)
  }

  test("A4 UNION + A5 elementwise SUM/MIN/MAX over a window") {
    Seq(
      (1L, "2024-01-01 00:00:00", "a", Array(1.0, 10.0)),
      (1L, "2024-01-02 00:00:00", "b", Array(2.0, 20.0)),
      (1L, "2024-01-03 00:00:00", "a", Array(3.0, 30.0)),
      (2L, "2024-01-02 00:00:00", "c", Array(5.0, 50.0)))
      .toDF("k", "ts_s", "tag", "arr")
      .withColumn("ts", $"ts_s".cast("timestamp"))
      .createOrReplaceTempView("agg_src")
    val p = mkTimedProject("agg_src", Seq(
      AnchorFeature("f_tags",
        // UNION collects a set — declared as a 1-d STRING tensor
        FeatureType(TensorCategory.DENSE, Seq(ValueType.INT32), ValueType.STRING),
        Transformation.windowAgg("tag", "UNION", "10d"), Seq(key)),
      AnchorFeature("f_esum", FeatureType.DOUBLE_VECTOR,
        Transformation.windowAgg("arr", "ELEMENTWISE_SUM", "10d"), Seq(key)),
      AnchorFeature("f_emin", FeatureType.DOUBLE_VECTOR,
        Transformation.windowAgg("arr", "ELEMENTWISE_MIN", "10d"), Seq(key)),
      AnchorFeature("f_emax", FeatureType.DOUBLE_VECTOR,
        Transformation.windowAgg("arr", "ELEMENTWISE_MAX", "10d"), Seq(key))))
    val obs = Seq((1L, "2024-01-05 00:00:00"), (2L, "2024-01-05 00:00:00"))
      .toDF("k", "ts_s")
      .withColumn("ts", $"ts_s".cast("timestamp")).select("k", "ts")
    val out = FeathrClient.joinFeatures(spark, p, obs, Some(("ts", "native")),
      Seq(FeatureQuery(Seq("f_tags", "f_esum", "f_emin", "f_emax"), Seq("k"))))
      .orderBy("k").collect()
    val r1 = out(0)
    assert(r1.getAs[Seq[String]]("f_tags").toList == List("a", "b"))
    assert(r1.getAs[Seq[Double]]("f_esum").toList == List(6.0, 60.0))
    assert(r1.getAs[Seq[Double]]("f_emin").toList == List(1.0, 10.0))
    assert(r1.getAs[Seq[Double]]("f_emax").toList == List(3.0, 30.0))
    assert(out(1).getAs[Seq[Double]]("f_esum").toList == List(5.0, 50.0))
  }

  test("a UNION feature declared as a scalar is rejected, not silently skipped") {
    Seq((1L, "2024-01-01 00:00:00", "a"))
      .toDF("k", "ts_s", "tag")
      .withColumn("ts", $"ts_s".cast("timestamp"))
      .createOrReplaceTempView("agg_src_bad")
    val p = mkTimedProject("agg_src_bad", Seq(
      AnchorFeature("f_tags_bad", FeatureType.STRING, // lie: UNION yields a set
        Transformation.windowAgg("tag", "UNION", "10d"), Seq(key))))
    val obs = Seq((1L, "2024-01-05 00:00:00")).toDF("k", "ts_s")
      .withColumn("ts", $"ts_s".cast("timestamp")).select("k", "ts")
    val e = intercept[IllegalArgumentException] {
      FeathrClient.joinFeatures(spark, p, obs, Some(("ts", "native")),
        Seq(FeatureQuery(Seq("f_tags_bad"), Seq("k"))))
    }
    assert(e.getMessage.contains("1-d DENSE tensor"))
  }

  test("K1/K3: generic sink writes with requested partition count") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/out"
    val df = spark.read.parquet(s"$sf/customer.parquet")
    Materializer.write(df, Seq("c_custkey"),
      OutputSink.Generic("parquet", tmp, numParts = Some(3)))
    val files = new java.io.File(tmp).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files == 3)
    assert(spark.read.parquet(tmp).count() == df.count())
  }

  test("K4/T3: streaming query into a file sink stops after timeout") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = StreamingIngest.readStream(spark,
        DataLocation.Hdfs(s"$sf/events.parque*", Some("parquet"),
          Map("basePath" -> sf)), Some(schema))
      .normalizeEventTime
      .where($"event_type" === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString + "/out"
    val q = StreamingIngest.runWithTimeout(stream, Seq("event_id"),
      Seq(OutputSink.Generic("parquet", tmp, mode = "append")),
      timeoutMs = 30000, outputMode = "append")
    assert(!q.isActive)
    val n = spark.read.parquet(tmp).count()
    val want = spark.read.parquet(s"$sf/events.parquet")
      .where($"event_type" === "purchase").count()
    assert(n == want)
  }

  test("exactly-once: a replayed micro-batch leaves sink state identical") {
    // foreachBatch's contract is at-least-once batch delivery: a crash
    // after a partial write replays the WHOLE batch under the same
    // batchId. writeBatch must make that replay a no-op.
    val tmp = java.nio.file.Files.createTempDirectory("graft_eo").toString + "/out"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")
    val fileSink = Seq(OutputSink.Generic("parquet", tmp, mode = "append"))
    Materializer.writeBatch(b0, 0L, Seq("id"), fileSink)
    Materializer.writeBatch(b1, 1L, Seq("id"), fileSink)
    def state() = spark.read.parquet(tmp)
      .select("id", "v", Materializer.BatchIdCol)
      .as[(Long, String, Long)].collect().sorted.toSeq
    val before = state()
    assert(before.map(r => (r._1, r._2)) == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"two batches, three rows: $before")
    Materializer.writeBatch(b0, 0L, Seq("id"), fileSink) // the retry
    assert(state() == before,
      "replaying batch 0 must overwrite its own partition, not append")
    // online sink: replace-on-write per key ⇒ replay is idempotent
    val storeDir = java.nio.file.Files.createTempDirectory("graft_eo_store").toString
    val store = new FileOnlineStore(storeDir)
    val onlineSink = Seq(OutputSink.Online("t", store))
    Materializer.writeBatch(b0, 0L, Seq("id"), onlineSink)
    val first = Seq("1", "2").map(k => k -> store.get("t", k))
    Materializer.writeBatch(b0, 0L, Seq("id"), onlineSink)
    assert(Seq("1", "2").map(k => k -> store.get("t", k)) == first)
  }

  test("multimodal: metadata + batched decode stub + frame sampling") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val packed = docs.select($"doc_id", Multimodal.packBinary($"text").as("payload"))
    val meta = packed.select($"doc_id", Multimodal.mediaMeta($"payload").as("m"))
    assert(meta.where($"m.n_bytes" <= 0).count() == 0)
    assert(meta.where(length($"m.sha256") =!= 64).count() == 0)
    val decoded = Multimodal.decodeStub(packed, "payload", batchSize = 16)
    assert(decoded.count() == 100)
    assert(decoded.where($"decoded.width" < 16 || $"decoded.channels" =!= 3).count() == 0)
    // decode is deterministic
    val a = decoded.select($"doc_id", $"decoded.mean_intensity").collect().toSet
    val b = Multimodal.decodeStub(packed, "payload", batchSize = 64)
      .select($"doc_id", $"decoded.mean_intensity").collect().toSet
    assert(a == b)
    val frames = packed.select(explode(
      Multimodal.frameSample($"payload", 16, 2)).as("f"))
    assert(frames.where(length($"f.frame") === 0).count() == 0)
  }

  test("online/offline consistency: served values equal the snapshot row-for-row") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val p = FeatureProject("ooc")
    p.addAnchorGroup("g", Source("ev", DataLocation.Hdfs(s"$sf/events.parquet"),
      timeWindow = Some(TimeWindowParameters("ts", "native")),
      preprocessing = Some(df =>
        df.normalizeEventTime
          .where(col("event_type") === "purchase"))), Seq(
      AnchorFeature("f_last", FeatureType.DOUBLE,
        Transformation.Expr("value"), Seq(TypedKey("user_id", ValueType.INT64))),
      AnchorFeature("f_sum_7d", FeatureType.DOUBLE,
        Transformation.windowAgg("value", "SUM", "7d"),
        Seq(TypedKey("user_id", ValueType.INT64)))))
    val snap = Materializer.snapshot(spark, p, Seq("f_last", "f_sum_7d"),
      Seq("user_id"), java.time.Instant.parse("2024-01-20T00:00:00Z"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ooc").toString
    val store = new FileOnlineStore(dir)
    Materializer.writeAll(snap, Seq("user_id"),
      Seq(OutputSink.Online("feat", store)))
    val rows = snap.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val served = store.get("feat", String.valueOf(r.getAs[Long]("user_id")))
      assert(served.isDefined, s"missing key ${r.getAs[Long]("user_id")}")
      // sink contract: SQL NULL features are OMITTED from the stored
      // map (absent field = null). Doubles compare with an ulp-scale
      // tolerance, NOT string equality: the store was written from the
      // materializer's evaluation and `snap.collect()` is a SECOND
      // evaluation — a float SUM's low-order bits depend on partial
      // aggregation order (task scheduling), so the two legitimately
      // differ by ~1 ulp run-to-run (the r6 1-in-6 suite flake:
      // "178.22000000000003" != "178.22").
      Seq("f_last", "f_sum_7d").foreach { f =>
        r.getAs[Any](f) match {
          case null => assert(!served.get.contains(f), s"null $f must be omitted")
          case d: Double =>
            val got = served.get(f).toDouble
            assert(math.abs(got - d) <= 1e-9 * math.max(1.0, math.abs(d)),
              s"$f served $got vs snapshot $d")
          case v => assert(served.get(f) == String.valueOf(v))
        }
      }
    }
    assert(store.get("feat", "no-such-key").isEmpty)
  }

  test("S7 timestamp formats: epoch, epoch_millis, custom pattern normalize identically") {
    val base = java.time.Instant.parse("2024-03-05T06:07:08Z")
    val row = Seq((base.getEpochSecond, base.toEpochMilli, "2024/03/05 06:07:08",
        base.toEpochMilli + 500))
      .toDF("es", "ms", "txt", "ms_frac")
      .select(
        TimestampParser.toTimestampCol(col("es"), "epoch").as("a"),
        TimestampParser.toTimestampCol(col("ms"), "epoch_millis").as("b"),
        TimestampParser.toTimestampCol(col("txt"), "yyyy/MM/dd HH:mm:ss").as("c"),
        TimestampParser.toTimestampCol(col("ms_frac"), "epoch_millis").as("d"))
      .head
    assert(row.getTimestamp(0).toInstant == base)
    assert(row.getTimestamp(1).toInstant == base)
    assert(row.getTimestamp(2).toInstant == base, "custom Java pattern (UTC session)")
    // epoch_millis keeps sub-second precision
    assert(row.getTimestamp(3).toInstant == base.plusMillis(500))
  }

  test("S7 native format is type-aware: nanos-long, NTZ, TZ all land on TimestampType") {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val base = java.time.Instant.parse("2024-03-05T06:07:08Z")
    val micros = base.getEpochSecond * 1000000L
    val df = Seq((micros * 1000L, micros)).toDF("nanos", "us")
      .select(col("nanos"),
        timestamp_micros(col("us")).as("tz"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ntz"))
    def parsed(c: String) = {
      val out = df.select(TimestampParser.toTimestampColOf(df, c, "native").as("t"))
      assert(out.schema("t").dataType == TimestampType, s"$c type")
      out.head.getTimestamp(0).toInstant
    }
    // a nanos long must NOT be misread as epoch seconds (blind cast did)
    assert(parsed("nanos") == base, "nanos-as-long")
    assert(parsed("ntz") == base, "micro-NTZ (UTC session)")
    assert(parsed("tz") == base, "TimestampType pass-through")
  }

  test("S7 native over raw NTZ source: as-of + SWA join with NO preprocessing shim") {
    // the parser itself must absorb the fixture's current NTZ encoding —
    // a source declaring ("ts", "native") needs no fixTs preprocessing
    import org.apache.spark.sql.types.TimestampNTZType
    val obs = Seq((7L, "2024-01-10 00:00:00"))
      .toDF("user_id", "ts_s")
      .withColumn("ts", col("ts_s").cast(TimestampNTZType)).select("user_id", "ts")
    val src = Seq(
      (7L, "2024-01-08 00:00:00", 3.0),   // in 7d window, latest as-of
      (7L, "2024-01-05 00:00:00", 2.0),   // in window
      (7L, "2024-01-12 00:00:00", 99.0))  // future: excluded
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast(TimestampNTZType))
      .select("user_id", "ts", "value")
    src.createOrReplaceTempView("ntz_src")
    val p = FeatureProject("ntz_native")
    p.addAnchorGroup("a",
      Source("s", DataLocation.Table("ntz_src"),
        timeWindow = Some(TimeWindowParameters("ts", "native"))), Seq(
      AnchorFeature("f_last", FeatureType.DOUBLE,
        Transformation.Expr("value"), Seq(TypedKey("user_id", ValueType.INT64))),
      AnchorFeature("f_sum", FeatureType.DOUBLE,
        Transformation.windowAgg("value", "SUM", "7d"),
        Seq(TypedKey("user_id", ValueType.INT64)))))
    val out = FeathrClient.joinFeatures(spark, p, obs, Some(("ts", "native")),
      Seq(FeatureQuery(Seq("f_last", "f_sum"), Seq("user_id")))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDouble(r.fieldIndex("f_last")) == 3.0, "as-of over NTZ source")
    assert(r.getDouble(r.fieldIndex("f_sum")) == 5.0, "SWA over NTZ source")
  }

  test("online sink batches: one putAll per partition; newlines round-trip") {
    // values with '\n' and '=' must survive the k=v line encoding
    val dir = java.nio.file.Files.createTempDirectory("graft_enc").toString
    val plain = new FileOnlineStore(dir)
    val tricky = Map("f_a" -> "line1\nline2", "f_b" -> "x=y", "plain" -> "v")
    plain.put("t", "k 1", tricky)
    assert(plain.get("t", "k 1").contains(tricky))

    // the sink path makes ONE bulk call per partition (pipelining hook)
    CountingStore.calls.set(0)
    val store = new CountingStore(
      java.nio.file.Files.createTempDirectory("graft_bulk").toString)
    import spark.implicits._
    val df = (1 to 30).map(i => (i.toLong, i * 1.5)).toDF("k", "f_v").repartition(3)
    Materializer.write(df, Seq("k"), OutputSink.Online("feat", store))
    assert(CountingStore.calls.get() == 3,
      s"expected one putAll per partition (3), got ${CountingStore.calls.get()}")
    assert(store.get("feat", "7").contains(Map("f_v" -> "10.5")))
  }

  test("enrichStream: snapshot features attach to a stream, match batch exactly") {
    val p = FeatureProject("es")
    val custKey = TypedKey("c_custkey", ValueType.INT64)
    p.addAnchorGroup("cust", Source("customer",
      DataLocation.Hdfs(s"$sf/customer.parquet")), Seq(
      AnchorFeature("f_acctbal", FeatureType.DOUBLE,
        Transformation.Expr("c_acctbal"), Seq(custKey)),
      AnchorFeature("f_seg", FeatureType.STRING,
        Transformation.Expr("c_mktsegment"), Seq(custKey))))
    val fq = Seq(FeatureQuery(Seq("f_acctbal", "f_seg"), Seq("o_custkey")))
    val schema = spark.read.parquet(s"$sf/orders.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("basePath", sf).parquet(s"$sf/orders.parque*")
      .select("o_orderkey", "o_custkey")
    val enriched = StreamingIngest.enrichStream(spark, p, stream, fq)
    assert(enriched.isStreaming)
    val name = s"enrich_${System.nanoTime()}"
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table(name)
    val want = FeathrClient.joinFeatures(spark, p,
      spark.read.parquet(s"$sf/orders.parquet").select("o_orderkey", "o_custkey"),
      None, fq)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // time-aware features are rejected with direction, not a deep
    // streaming planner error
    val pt = FeatureProject("es_t")
    pt.addAnchorGroup("ev", Source("ev", DataLocation.Hdfs(s"$sf/events.parquet"),
      timeWindow = Some(TimeWindowParameters("ts", "native"))), Seq(
      AnchorFeature("f_last", FeatureType.DOUBLE,
        Transformation.Expr("value"), Seq(TypedKey("user_id", ValueType.INT64)))))
    val err = intercept[IllegalArgumentException] {
      StreamingIngest.enrichStream(spark, pt, stream,
        Seq(FeatureQuery(Seq("f_last"), Seq("o_custkey"))))
    }
    assert(err.getMessage.contains("materialize a snapshot"))
  }

  test("S1 format inference: csv and json paths scan through DataLocation.Hdfs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey")
    nation.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$dir/nation.csv")
    nation.coalesce(1).write.mode("overwrite").json(s"$dir/nation.json")

    val fromCsv = SourceResolver.read(spark, DataLocation.Hdfs(s"$dir/nation.csv"))
    assert(fromCsv.count() == 25)
    // the csv path adds header + inferSchema: keys come back numeric
    assert(fromCsv.schema("n_nationkey").dataType.isInstanceOf[
      org.apache.spark.sql.types.NumericType])
    assert(fromCsv.agg(sum($"n_nationkey")).head.getLong(0) == 300L)

    val fromJson = SourceResolver.read(spark, DataLocation.Hdfs(s"$dir/nation.json"))
    assert(fromJson.count() == 25)
    assert(fromJson.agg(sum($"n_regionkey")).head.getLong(0) ==
      nation.agg(sum($"n_regionkey")).head.getLong(0))
  }

  test("M1 backfill with Hourly resolution: one step per hour, inclusive ends") {
    import java.time.Instant
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val p = FeatureProject("hb")
    val src = Source("ev", DataLocation.Hdfs(s"$sf/events.parquet"),
      timeWindow = Some(TimeWindowParameters("ts", "native")),
      preprocessing = Some(df =>
        df.normalizeEventTime
          .where(col("event_type") === "purchase")))
    p.addAnchorGroup("g", src, Seq(
      AnchorFeature("f_cnt_1d", FeatureType.INT64,
        Transformation.windowAgg("value", "COUNT", "1d"),
        Seq(TypedKey("user_id", ValueType.INT64)))))
    val out = Materializer.backfill(spark, p, Seq("f_cnt_1d"), Seq("user_id"),
      Instant.parse("2024-01-10T00:00:00Z"), Instant.parse("2024-01-10T03:00:00Z"),
      DateTimeResolution.Hourly, sinks = Nil)
    val steps = out.select("__step_end").distinct().collect()
      .map(_.getTimestamp(0).toInstant).sortBy(_.toEpochMilli)
    assert(steps.length == 4) // 00, 01, 02, 03 — both endpoints inclusive
    assert(steps.head == Instant.parse("2024-01-10T00:00:00Z"))
    assert(steps.last == Instant.parse("2024-01-10T03:00:00Z"))
    assert(out.where(col("f_cnt_1d") <= 0).count() == 0)
  }

  test("secret resolution layers: env/sysprops -> secrets file -> vault") {
    val f = java.nio.file.Files.createTempFile("graft_secrets", ".yaml")
    java.nio.file.Files.write(f, java.util.List.of(
      "# secrets file (YAML-subset key: value lines)",
      "FILE_SECRET: hunter2",
      "QUOTED: \"q v\""))
    sys.props("graft.secrets.file") = f.toString
    sys.props("SYS_SECRET") = "sys"
    try {
      assert(SourceResolver.resolveSecrets("${SYS_SECRET}") == "sys")
      assert(SourceResolver.resolveSecrets("u=${FILE_SECRET}") == "u=hunter2")
      assert(SourceResolver.resolveSecrets("${QUOTED}") == "q v")
      assert(SourceResolver.resolveSecrets("${MISSING_XYZ}") == "")
      SecretProvider.register(name =>
        if (name == "VAULT_ONLY") Some("vv") else None)
      assert(SourceResolver.resolveSecrets("${VAULT_ONLY}") == "vv")
      // earlier layers win: sysprops over file over vault
      sys.props("FILE_SECRET") = "syswin"
      assert(SourceResolver.resolveSecrets("${FILE_SECRET}") == "syswin")
    } finally {
      sys.props.remove("graft.secrets.file")
      sys.props.remove("SYS_SECRET")
      sys.props.remove("FILE_SECRET")
      SecretProvider.clear()
      java.nio.file.Files.deleteIfExists(f)
    }
  }

  test("multimodal: real ImageIO codec decodes PNG and BMP; corrupt bytes -> null") {
    import spark.implicits._
    def img(w: Int, h: Int, gray: Int, fmt: String): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = im.createGraphics()
      g.setColor(new java.awt.Color(gray, gray, gray))
      g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, fmt, bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, img(20, 10, 100, "png")),
      (2L, img(7, 5, 255, "bmp")),
      (3L, "not an image".getBytes("UTF-8")),
      (4L, null))
    val df = rows.toDF("id", "payload")
    val out = Multimodal.decodeImages(df, "payload", batchSize = 2)
      .select($"id", $"decoded.width", $"decoded.height",
        $"decoded.channels", $"decoded.mean_intensity")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 20 && out(1L).getInt(2) == 10 &&
      out(1L).getInt(3) == 3 && out(1L).getDouble(4) == 100.0)
    assert(out(2L).getInt(1) == 7 && out(2L).getInt(2) == 5 &&
      out(2L).getDouble(4) == 255.0)
    assert(out(3L).isNullAt(1) && out(4L).isNullAt(1))
    // sniff sees the real magic bytes
    val mimes = Multimodal.sniffMime(df("payload"))
    val m = df.select($"id", mimes.as("mime")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "image/png")
  }

  test("multimodal: resize re-encodes a decodable PNG at the target size") {
    import spark.implicits._
    def img(w: Int, h: Int, gray: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = im.createGraphics()
      g.setColor(new java.awt.Color(gray, gray, gray))
      g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, img(40, 30, 77)),
      (2L, img(8, 8, 200)),
      (3L, "garbage".getBytes("UTF-8")),
      (4L, null)).toDF("id", "payload")
    val resized = Multimodal.resizeImages(df, "payload", 16, 12, batchSize = 2)
    val out = Multimodal.decodeImages(resized, "payload_resized")
      .select($"id", Multimodal.sniffMime($"payload_resized").as("mime"),
        $"decoded.width", $"decoded.height", $"decoded.mean_intensity")
      .collect().map(r => r.getLong(0) -> r).toMap
    // solid-color input: any convex interpolation preserves the constant
    assert(out(1L).getString(1) == "image/png" && out(1L).getInt(2) == 16 &&
      out(1L).getInt(3) == 12 && out(1L).getDouble(4) == 77.0)
    assert(out(2L).getInt(2) == 16 && out(2L).getDouble(4) == 200.0)
    assert(out(3L).isNullAt(2) && out(4L).isNullAt(2))
  }

  test("multimodal: wavMeta parses a canonical RIFF/WAVE header with pure columns") {
    import spark.implicits._
    def wav(channels: Int, rate: Int, bits: Int, dataBytes: Int): Array[Byte] = {
      val byteRate = rate * channels * bits / 8
      val blockAlign = channels * bits / 8
      val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(rate).putInt(byteRate)
        .putShort(blockAlign.toShort).putShort(bits.toShort)
        .put("data".getBytes("US-ASCII")).putInt(dataBytes)
      bb.array()
    }
    val df = Seq(
      (1L, wav(1, 8000, 16, 1600)),
      (2L, wav(2, 44100, 16, 44100 * 4)),
      (3L, "RIFFnot really a wav payload at all, but 44+ bytes long..."
        .getBytes("US-ASCII")),
      (4L, null)).toDF("id", "payload")
    val out = df.select($"id", Multimodal.wavMeta($"payload").as("w"))
      .select($"id", $"w.channels", $"w.sample_rate", $"w.bits_per_sample",
        $"w.data_bytes", $"w.duration_secs")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 1 && out(1L).getInt(2) == 8000 &&
      out(1L).getInt(3) == 16 && out(1L).getLong(4) == 1600L &&
      out(1L).getDouble(5) == 0.1)
    assert(out(2L).getInt(1) == 2 && out(2L).getInt(2) == 44100 &&
      out(2L).getDouble(5) == 1.0)
    assert(out(3L).isNullAt(1) && out(4L).isNullAt(1))
    // the whole parse is a projection: no exchange in the plan
    val plan = df.select(Multimodal.wavMeta($"payload"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}

/** Test store: counts bulk-write calls (local-mode tasks share the JVM,
  * so the static counter observes executor-side invocations).
  */
class CountingStore(dir: String) extends FileOnlineStore(dir) {
  override def putAll(table: String,
      rows: Iterator[(String, Map[String, String])]): Unit = {
    CountingStore.calls.incrementAndGet()
    super.putAll(table, rows)
  }
}
object CountingStore {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}
