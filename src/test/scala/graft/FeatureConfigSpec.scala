package graft

import graft.model._
import graft.project._
import graft.sources._

import org.apache.spark.sql.functions._

/** Feature-config JSON round-trip (export ↔ import) and a
  * reference-shaped fixture driving a real join — R6's engine-config
  * counterpart (reference document shape: feathr-rs/src/project.rs:374-437).
  */
class FeatureConfigSpec extends SparkTestBase {

  private val userKey = TypedKey("user_id", ValueType.INT64)

  private def sampleProject: FeatureProject = {
    val p = FeatureProject("rt")
    val hdfs = Source("ev", DataLocation.Hdfs("/data/events.parquet",
        Some("parquet"), Map("mergeSchema" -> "true")),
      timeWindow = Some(TimeWindowParameters("ts", "native")))
    val jdbc = Source("db", DataLocation.Jdbc("jdbc:derby:memory:x",
      dbtable = Some("t"), auth = JdbcAuth.UserPass("U_ENV", "P_ENV")))
    val kafka = Source("kf", DataLocation.Kafka(Seq("b1:9092", "b2:9092"),
      Seq("topic1"), """{"type":"record","name":"R","fields":[]}"""))
    val gen = Source("gn", DataLocation.Generic("csv", Some("append"),
      Map("sep" -> "|"), Some("/data/x.csv")))
    p.addAnchorGroup("a1", hdfs, Seq(
      AnchorFeature("f_v", FeatureType.DOUBLE,
        Transformation.Expr("value"), Seq(userKey)),
      AnchorFeature("f_sum", FeatureType.DOUBLE,
        Transformation.WindowAgg("value", Aggregation.SUM,
          java.time.Duration.ofDays(7), groupBy = Some("etype"),
          filter = Some("value > 0"), limit = Some(3)), Seq(userKey))))
    p.addAnchorGroup("a2", jdbc, Seq(
      AnchorFeature("f_db", FeatureType.STRING,
        Transformation.Expr("name"), Seq(userKey))))
    p.addAnchorGroup("a3", kafka, Seq(
      AnchorFeature("f_kf", FeatureType.INT64,
        Transformation.Expr("cnt"), Seq(userKey))))
    p.addAnchorGroup("a4", gen, Seq(
      AnchorFeature("f_gn", FeatureType.FLOAT,
        Transformation.Udf("my_udf"), Seq(userKey))))
    p.addDerived(DerivedFeature("f_d1", FeatureType.DOUBLE,
      "f_v + f_sum", Seq(InputFeature("f_v", Seq(userKey)),
        InputFeature("f_sum", Seq(userKey))), Seq(userKey)))
    p.addDerived(DerivedFeature("f_d2", FeatureType.DOUBLE,
      "f_d1 * 2", Seq(InputFeature("f_d1", Seq(userKey))), Seq(userKey)))
    p
  }

  test("toJson/fromJson round-trips the full document") {
    val p = sampleProject
    val json = FeatureConfig.toJson(p)
    val p2 = FeatureConfig.fromJson(json)
    assert(FeatureConfig.toJson(p2) == json)
    // spot-check the reconstructed model, not just the serialized form
    val (g, f) = p2.anchorFeature("f_sum").get
    assert(g.name == "a1" && g.source.timeWindow.get.timestampColumn == "ts")
    val wa = f.transform.asInstanceOf[Transformation.WindowAgg]
    assert(wa.window == java.time.Duration.ofDays(7) &&
      wa.groupBy.contains("etype") && wa.limit.contains(3))
    val jdbcSrc = p2.source("db")
    assert(jdbcSrc.location ==
      DataLocation.Jdbc("jdbc:derby:memory:x", Some("t"), None,
        JdbcAuth.UserPass("U_ENV", "P_ENV")))
    val kf = p2.source("kf").location.asInstanceOf[DataLocation.Kafka]
    assert(kf.avroSchemaJson.nonEmpty && kf.brokers == Seq("b1:9092", "b2:9092"))
    assert(p2.derivedFeature("f_d2").get.inputs.head.featureName == "f_d1")
  }

  test("Kafka brokers/topics round-trip: empty lists and comma-in-value") {
    val p = FeatureProject("kfrt")
    // empty lists must come back as Nil (not Seq("")), and a broker
    // value containing a comma must survive — both break under a
    // comma-joined serialization
    val empty = Source("kf_empty", DataLocation.Kafka(Nil, Nil, ""))
    val comma = Source("kf_comma",
      DataLocation.Kafka(Seq("host:9092,backup:9092"), Seq("t,1", "t2"), ""))
    p.addAnchorGroup("g1", empty, Seq(
      AnchorFeature("f_e", FeatureType.INT64, Transformation.Expr("x"), Seq(userKey))))
    p.addAnchorGroup("g2", comma, Seq(
      AnchorFeature("f_c", FeatureType.INT64, Transformation.Expr("x"), Seq(userKey))))
    val p2 = FeatureConfig.fromJson(FeatureConfig.toJson(p))
    assert(p2.source("kf_empty").location == DataLocation.Kafka(Nil, Nil, ""))
    assert(p2.source("kf_comma").location ==
      DataLocation.Kafka(Seq("host:9092,backup:9092"), Seq("t,1", "t2"), ""))
  }

  test("legacy comma-joined Kafka source documents still parse") {
    val legacy =
      """{
        |  "anchors": {},
        |  "derivations": {},
        |  "sources": {
        |    "kf": {"type": "kafka", "brokers": "b1:9092,b2:9092",
        |           "topics": "topic1"}
        |  }
        |}""".stripMargin
    val p = FeatureConfig.fromJson(legacy)
    assert(p.source("kf").location ==
      DataLocation.Kafka(Seq("b1:9092", "b2:9092"), Seq("topic1"), ""))
  }

  test("a reference-shaped fixture loads and drives a passing join") {
    val fixture =
      s"""{
         |  "anchors": {
         |    "cust_anchor": {
         |      "key": {"sqlExpr": ["c_custkey"]},
         |      "source": "customers",
         |      "features": {
         |        "f_acctbal": {
         |          "type": {"type": "TENSOR", "tensorCategory": "DENSE",
         |                   "dimensionType": [], "valType": "DOUBLE"},
         |          "transformation": {"transform_expr": "c_acctbal"},
         |          "key": [{"key_column": "c_custkey", "key_column_type": "LONG"}]
         |        }
         |      }
         |    }
         |  },
         |  "derivations": {
         |    "f_bal_x2": {
         |      "type": {"type": "TENSOR", "tensorCategory": "DENSE",
         |               "dimensionType": [], "valType": "DOUBLE"},
         |      "definition": "f_acctbal * 2",
         |      "inputs": {"f_acctbal": {"feature": "f_acctbal", "key": ["c_custkey"]}},
         |      "key": [{"key_column": "c_custkey", "key_column_type": "LONG"}]
         |    }
         |  },
         |  "sources": {
         |    "customers": {"type": "hdfs", "location": "$sf/customer.parquet"}
         |  }
         |}""".stripMargin
    val p = FeatureConfig.fromJson(fixture)
    val obs = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val out = FeathrClient.joinFeatures(spark, p, obs, None,
      Seq(FeatureQuery(Seq("f_acctbal", "f_bal_x2"), Seq("o_custkey"))))
    val expected = obs.join(
      spark.read.parquet(s"$sf/customer.parquet")
        .select(col("c_custkey").as("o_custkey"),
          col("c_acctbal").cast("double").as("f_acctbal"),
          (col("c_acctbal") * 2).cast("double").as("f_bal_x2")),
      Seq("o_custkey"), "left_outer")
    assert(out.count() == obs.count())
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty)
  }
}
