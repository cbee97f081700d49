package graft

import graft.model.{Aggregation, Durations, FeatureType, Transformation, TypedKey, ValueType}
import graft.operators.{IncrementalMaterializer, Spill}
import graft.project.AnchorFeature

import org.apache.spark.sql.functions._

class IncrementalMaterializerSpec extends SparkTestBase {
  import spark.implicits._

  private val DayUs = 86400000000L
  private val key = TypedKey("k", ValueType.INT64)

  private def wa(agg: String, window: String = "2d",
      filter: Option[String] = None) =
    Transformation.WindowAgg("v", Aggregation.parse(agg),
      Durations.parse(window), filter = filter)

  private def feat(name: String, t: Transformation) =
    AnchorFeature(name, FeatureType.DOUBLE, t, Seq(key))

  private val events = Seq(
    (1L, 0, 1.0, "a"), (1L, 0, 2.0, "b"), (1L, 1, 4.0, "a"),
    (2L, 1, 10.0, "b"))
    .toDF("k", "d", "v", "tag")
    .withColumn("ts", timestamp_micros(col("d") * DayUs + 3600000000L))
    .select("k", "ts", "v", "tag")

  test("refresh + snapshot: shared measure store, filters, multi-window") {
    val root = Spill.newPath(spark)
    val feats = Seq(
      feat("s2", wa("SUM")), feat("c2", wa("COUNT")),
      feat("m1", wa("MAX", "1d")),
      feat("sa", wa("SUM", "2d", Some("tag = 'a'"))))
    IncrementalMaterializer.refresh(events, root, feats,
      Seq("k"), "ts", DayUs, 0L)
    // 2 distinct (defExpr, filter) measures -> 2 stores
    assert(new java.io.File(root).listFiles.count(_.getName.startsWith("m=")) == 2)
    val snap = IncrementalMaterializer.snapshot(spark, root, feats,
      Seq("k"), "ts", DayUs, 2 * DayUs)
      .select("k", "s2", "c2", "m1", "sa")
      .as[(Long, Double, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(snap == Seq(
      (1L, 7.0, 3L, Some(4.0), Some(5.0)),
      (2L, 10.0, 1L, Some(10.0), None))) // k=2: no 'a' rows, day-1 max
  }

  test("unsupported shapes are refused by name") {
    val root = Spill.newPath(spark)
    def refuse(f: AnchorFeature, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        IncrementalMaterializer.refresh(events, root, Seq(f),
          Seq("k"), "ts", DayUs, 0L)
      }
      assert(e.getMessage.contains(f.name) && e.getMessage.contains(needle),
        e.getMessage)
    }
    refuse(feat("g", wa("SUM").copy(groupBy = Some("tag"))), "group_by")
    refuse(feat("l", wa("SUM").copy(limit = Some(2))), "limit")
    refuse(feat("u", wa("UNION")), "not incrementally maintainable")
    refuse(feat("h", wa("SUM", "36h")), "whole multiple")
    refuse(feat("x", Transformation.Expr("v")), "only window aggregations")
  }
}
