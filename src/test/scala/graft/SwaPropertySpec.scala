package graft

import graft.model._
import graft.project._
import graft.sources._

import org.apache.spark.sql.functions._

/** Property test over duration grammar × SWA: random odd/sub-second
  * windows (100ms–4s at millisecond granularity) over randomly-timed
  * events must produce the same aggregates as an in-memory reference
  * fold — on BOTH physical plans (bucketed pre-aggregation and the raw
  * range join). Guards the window arithmetic end to end: parse →
  * micros → interval/bucket boundaries → `(t − w, t]` inclusivity.
  */
class SwaPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("random ms-granularity windows match the reference fold on both plans") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 5) {
      val windowMs = 100 + rnd.nextInt(3900)
      val wUs = windowMs * 1000L
      // 3 keys × 25 events inside a 10-second span (micros granularity),
      // integral values so float parity is exact across plan shapes
      val events = for (k <- 0 until 3; _ <- 0 until 25) yield
        (k.toLong, 1700000000000000L + (rnd.nextLong().abs % 10000000L),
          math.round(rnd.nextDouble() * 100).toDouble)
      val df = events.toDF("k", "ts_us", "v")
        .withColumn("ts", timestamp_micros($"ts_us"))
      val view = s"swa_prop_$round"
      df.createOrReplaceTempView(view)

      val p = FeatureProject(s"prop$round")
      val key = TypedKey("k", ValueType.INT64)
      p.addAnchorGroup("g", Source("src", DataLocation.Table(view),
        timeWindow = Some(TimeWindowParameters("ts", "native"))), Seq(
        AnchorFeature("f_sum", FeatureType.DOUBLE,
          Transformation.windowAgg("v", "SUM", s"${windowMs}ms"), Seq(key)),
        AnchorFeature("f_cnt", FeatureType.INT64,
          Transformation.windowAgg("v", "COUNT", s"${windowMs}ms"), Seq(key))))
      val obs = df.select($"k", $"ts", $"ts_us")

      val expected = events.map { case (k, t, _) =>
        val in = events.filter { case (k2, t2, _) => k2 == k && t2 > t - wUs && t2 <= t }
        (k, t) -> ((in.map(_._3).sum, in.size.toLong))
      }.toMap

      for (mode <- Seq("auto", "off")) {
        spark.conf.set("spark.graft.swa.bucketSeconds", mode)
        try {
          val out = FeathrClient.joinFeatures(spark, p, obs, Some(("ts", "native")),
            Seq(FeatureQuery(Seq("f_sum", "f_cnt"), Seq("k")))).collect()
          assert(out.length == events.length)
          out.foreach { r =>
            val (es, ec) = expected((r.getAs[Long]("k"), r.getAs[Long]("ts_us")))
            assert(r.getAs[Long]("f_cnt") == ec,
              s"count mismatch: window=${windowMs}ms plan=$mode")
            assert(math.abs(r.getAs[Double]("f_sum") - es) < 1e-9,
              s"sum mismatch: window=${windowMs}ms plan=$mode")
          }
        } finally spark.conf.unset("spark.graft.swa.bucketSeconds")
      }
    }
  }

  test("composite (2-column) key SWA matches the reference fold on both plans") {
    val rnd = new scala.util.Random(31)
    val windowMs = 1500
    val wUs = windowMs * 1000L
    val events = for (k1 <- 0 until 2; k2 <- 0 until 2; _ <- 0 until 15) yield
      (k1.toLong, s"r$k2",
        1700000000000000L + (rnd.nextLong().abs % 6000000L),
        math.round(rnd.nextDouble() * 100).toDouble)
    val df = events.toDF("k1", "k2", "ts_us", "v")
      .withColumn("ts", timestamp_micros($"ts_us"))
    df.createOrReplaceTempView("swa_prop_ck")

    val p = FeatureProject("propck")
    p.addAnchorGroup("g", Source("src", DataLocation.Table("swa_prop_ck"),
      timeWindow = Some(TimeWindowParameters("ts", "native"))), Seq(
      AnchorFeature("f_sum2", FeatureType.DOUBLE,
        Transformation.windowAgg("v", "SUM", s"${windowMs}ms"),
        Seq(TypedKey("k1", ValueType.INT64), TypedKey("k2", ValueType.STRING)))))
    val obs = df.select($"k1", $"k2", $"ts", $"ts_us")

    val expected = events.map { case (k1, k2, t, _) =>
      val in = events.filter { case (j1, j2, t2, _) =>
        j1 == k1 && j2 == k2 && t2 > t - wUs && t2 <= t }
      (k1, k2, t) -> in.map(_._4).sum
    }.toMap

    for (mode <- Seq("auto", "off")) {
      spark.conf.set("spark.graft.swa.bucketSeconds", mode)
      try {
        val out = FeathrClient.joinFeatures(spark, p, obs, Some(("ts", "native")),
          Seq(FeatureQuery(Seq("f_sum2"), Seq("k1", "k2")))).collect()
        assert(out.length == events.length)
        out.foreach { r =>
          val want = expected((r.getAs[Long]("k1"), r.getAs[String]("k2"),
            r.getAs[Long]("ts_us")))
          assert(math.abs(r.getAs[Double]("f_sum2") - want) < 1e-9,
            s"composite-key sum mismatch plan=$mode")
        }
      } finally spark.conf.unset("spark.graft.swa.bucketSeconds")
    }
  }

  test("as-of join matches the reference last-value fold on random event sets") {
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 4) {
      // source events and an INDEPENDENT spine (obs times that mostly
      // don't coincide with source times — the general as-of case),
      // plus spine rows before any source row (must stay null)
      val src = for (k <- 0 until 3; _ <- 0 until 20) yield
        (k.toLong, 1700000000000000L + (rnd.nextLong().abs % 10000000L),
          math.round(rnd.nextDouble() * 1000).toDouble)
      val obsRows = for (k <- 0 until 3; _ <- 0 until 15) yield
        (k.toLong, 1700000000000000L - 1000000L + (rnd.nextLong().abs % 12000000L))
      val srcDf = src.toDF("k", "ts_us", "v")
        .withColumn("ts", timestamp_micros($"ts_us"))
      val view = s"asof_prop_$round"
      srcDf.createOrReplaceTempView(view)

      val p = FeatureProject(s"asofp$round")
      val key = TypedKey("k", ValueType.INT64)
      p.addAnchorGroup("g", Source("src", DataLocation.Table(view),
        timeWindow = Some(TimeWindowParameters("ts", "native"))), Seq(
        AnchorFeature("f_last", FeatureType.DOUBLE,
          Transformation.Expr("v"), Seq(key))))
      val obs = obsRows.toDF("k", "ts_us")
        .withColumn("ts", timestamp_micros($"ts_us"))

      val out = FeathrClient.joinFeatures(spark, p, obs, Some(("ts", "native")),
        Seq(FeatureQuery(Seq("f_last"), Seq("k")))).collect()
      assert(out.length == obsRows.length)
      out.foreach { r =>
        val k = r.getAs[Long]("k"); val t = r.getAs[Long]("ts_us")
        // reference: the latest source row with ts <= obs ts (ties by
        // value desc — the engine's deterministic tie-break; random
        // micros make real ties vanishingly rare anyway)
        val want = src.filter(s => s._1 == k && s._2 <= t)
          .sortBy(s => (-s._2, -s._3)).headOption.map(_._3)
        val got = if (r.isNullAt(r.fieldIndex("f_last"))) None
          else Some(r.getAs[Double]("f_last"))
        assert(got == want, s"as-of mismatch k=$k t=$t: got=$got want=$want")
      }
    }
  }

  test("record-limit (top-k newest) matches the reference fold on both plans") {
    val rnd = new scala.util.Random(19)
    for (round <- 1 to 3) {
      val windowMs = 200 + rnd.nextInt(3000)
      val wUs = windowMs * 1000L
      val events = for (k <- 0 until 3; _ <- 0 until 25) yield
        (k.toLong, 1700000000000000L + (rnd.nextLong().abs % 8000000L),
          math.round(rnd.nextDouble() * 100).toDouble)
      val df = events.toDF("k", "ts_us", "v")
        .withColumn("ts", timestamp_micros($"ts_us"))
      val view = s"swa_prop_lim_$round"
      df.createOrReplaceTempView(view)

      val p = FeatureProject(s"proplim$round")
      val key = TypedKey("k", ValueType.INT64)
      p.addAnchorGroup("g", Source("src", DataLocation.Table(view),
        timeWindow = Some(TimeWindowParameters("ts", "native"))), Seq(
        AnchorFeature("f_top3", FeatureType.DOUBLE,
          Transformation.WindowAgg("v", Aggregation.SUM,
            Durations.parse(s"${windowMs}ms"), limit = Some(3)), Seq(key)),
        AnchorFeature("f_top3_cnt", FeatureType.INT64,
          Transformation.WindowAgg("v", Aggregation.COUNT,
            Durations.parse(s"${windowMs}ms"), limit = Some(3)), Seq(key))))
      val obs = df.select($"k", $"ts", $"ts_us")

      // reference fold: top-3 by (ts desc, v desc) inside (t − w, t]
      val expected = events.map { case (k, t, _) =>
        val in = events.filter { case (k2, t2, _) => k2 == k && t2 > t - wUs && t2 <= t }
        val top = in.sortBy { case (_, t2, v2) => (-t2, -v2) }.take(3)
        (k, t) -> ((top.map(_._3).sum, top.size.toLong))
      }.toMap

      for (mode <- Seq("auto", "off")) {
        spark.conf.set("spark.graft.swa.bucketSeconds", mode)
        try {
          val out = FeathrClient.joinFeatures(spark, p, obs, Some(("ts", "native")),
            Seq(FeatureQuery(Seq("f_top3", "f_top3_cnt"), Seq("k"))))
          val plan = out.queryExecution.analyzed.toString
          if (mode == "off") assert(!plan.contains("__graft_bl_rn"))
          else assert(plan.contains("__graft_bl_rn"),
            "record-limit must take the bucketed top-k plan by default")
          val rows = out.collect()
          assert(rows.length == events.length)
          rows.foreach { r =>
            val (es, ec) = expected((r.getAs[Long]("k"), r.getAs[Long]("ts_us")))
            assert(r.getAs[Long]("f_top3_cnt") == ec,
              s"limit count mismatch: window=${windowMs}ms plan=$mode")
            assert(math.abs(r.getAs[Double]("f_top3") - es) < 1e-9,
              s"limit sum mismatch: window=${windowMs}ms plan=$mode")
          }
        } finally spark.conf.unset("spark.graft.swa.bucketSeconds")
      }
    }
  }

  test("group_by (+ top-k-groups limit) matches the reference fold on both plans") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 3) {
      val windowMs = 200 + rnd.nextInt(3000)
      val wUs = windowMs * 1000L
      val events = for (k <- 0 until 3; i <- 0 until 25) yield
        (k.toLong, 1700000000000000L + (rnd.nextLong().abs % 8000000L),
          math.round(rnd.nextDouble() * 100).toDouble, s"g${i % 4}")
      val df = events.toDF("k", "ts_us", "v", "g")
        .withColumn("ts", timestamp_micros($"ts_us"))
      val view = s"swa_prop_gb_$round"
      df.createOrReplaceTempView(view)

      val p = FeatureProject(s"propgb$round")
      val key = TypedKey("k", ValueType.INT64)
      p.addAnchorGroup("g", Source("src", DataLocation.Table(view),
        timeWindow = Some(TimeWindowParameters("ts", "native"))), Seq(
        AnchorFeature("f_by_g", FeatureType.DOUBLE,
          Transformation.WindowAgg("v", Aggregation.SUM,
            Durations.parse(s"${windowMs}ms"), groupBy = Some("g"),
            limit = Some(2)), Seq(key))))
      val obs = df.select($"k", $"ts", $"ts_us")

      val expected = events.map { case (k, t, _, _) =>
        val in = events.filter { case (k2, t2, _, _) => k2 == k && t2 > t - wUs && t2 <= t }
        val groups = in.groupBy(_._4).view.mapValues(_.map(_._3).sum).toSeq
        // top-2 groups by (sum desc, sub-key asc)
        (k, t) -> groups.sortBy { case (g, s) => (-s, g) }.take(2).toMap
      }.toMap

      for (mode <- Seq("auto", "off")) {
        spark.conf.set("spark.graft.swa.bucketSeconds", mode)
        try {
          val out = FeathrClient.joinFeatures(spark, p, obs, Some(("ts", "native")),
            Seq(FeatureQuery(Seq("f_by_g"), Seq("k")))).collect()
          assert(out.length == events.length)
          out.foreach { r =>
            val got = r.getAs[Map[String, Double]]("f_by_g")
            val want = expected((r.getAs[Long]("k"), r.getAs[Long]("ts_us")))
            assert(got.keySet == want.keySet &&
              want.forall { case (g, s) => math.abs(got(g) - s) < 1e-9 },
              s"group map mismatch: window=${windowMs}ms plan=$mode got=$got want=$want")
          }
        } finally spark.conf.unset("spark.graft.swa.bucketSeconds")
      }
    }
  }
}
