package graft

import graft.model._
import graft.project._
import graft.sources._

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Generator-based round-trip property for the feature-config document
  * (R6's engine-config counterpart): for RANDOM projects — every source
  * kind, every transformation kind, sparse/vector/scalar declared
  * types, optional key aliases, derived chains —
  * `fromJson(toJson(p))` must re-serialize to the identical document.
  * Hardens the serde far beyond the fixed samples in FeatureConfigSpec.
  */
class ConfigPropertySpec extends AnyFunSuite {

  private val genValueType: Gen[ValueType] = Gen.oneOf(
    ValueType.BOOL, ValueType.INT32, ValueType.INT64,
    ValueType.FLOAT, ValueType.DOUBLE, ValueType.STRING, ValueType.BYTES)

  private val genFeatureType: Gen[FeatureType] = Gen.oneOf(
    genValueType.map(v => FeatureType(TensorCategory.DENSE, Nil, v)),
    genValueType.map(v => FeatureType(TensorCategory.DENSE, Seq(ValueType.INT32), v)),
    genValueType.map(v =>
      FeatureType(TensorCategory.SPARSE, Seq(ValueType.INT64), v)))

  private def genKey(i: Int): Gen[TypedKey] = for {
    vt <- genValueType
    alias <- Gen.option(Gen.const(s"k${i}_alias"))
  } yield TypedKey(s"key_col_$i", vt, alias)

  private val genAgg: Gen[String] = Gen.oneOf(
    "SUM", "AVG", "MIN", "MAX", "COUNT", "LATEST", "UNION")

  private def genTransform(i: Int): Gen[Transformation] = Gen.oneOf(
    Gen.const(Transformation.Expr(s"col_$i * 2 + 1")),
    Gen.const(Transformation.Udf(s"udf_$i")),
    for {
      agg <- genAgg
      // ms-granularity windows exercise the sub-second duration grammar
      winMs <- Gen.chooseNum(500L, 90L * 86400 * 1000)
      groupBy <- Gen.option(Gen.const(s"sub_$i"))
      filter <- Gen.option(Gen.const(s"col_$i > 0"))
      limit <- Gen.option(Gen.chooseNum(1, 10))
    } yield Transformation.WindowAgg(s"col_$i", Aggregation.parse(agg),
      java.time.Duration.ofMillis(winMs), groupBy, filter, limit))

  private def genLocation(i: Int): Gen[DataLocation] = Gen.oneOf(
    Gen.const(DataLocation.Hdfs(s"/data/src_$i.parquet", Some("parquet"),
      Map("mergeSchema" -> "true"))),
    Gen.const(DataLocation.Hdfs(s"/data/src_$i.csv")),
    Gen.const(DataLocation.Jdbc(s"jdbc:derby:memory:db_$i",
      dbtable = Some(s"t_$i"), auth = JdbcAuth.UserPass("U_ENV", "P_ENV"))),
    Gen.const(DataLocation.Jdbc(s"jdbc:derby:memory:db_$i",
      query = Some(s"SELECT * FROM t_$i"), auth = JdbcAuth.Token("TOK_ENV"))),
    Gen.listOfN(2, Gen.alphaNumStr.suchThat(_.nonEmpty)).map(bs =>
      DataLocation.Kafka(bs.map(b => s"$b:9092"), Seq(s"topic_$i"),
        """{"type":"record","name":"R","fields":[]}""")),
    Gen.const(DataLocation.Kafka(Nil, Nil, "")),
    Gen.const(DataLocation.Generic("csv", Some("append"),
      Map("sep" -> "|"), Some(s"/data/g_$i.csv"))),
    Gen.const(DataLocation.Table(s"view_$i")))

  private def genSource(i: Int): Gen[Source] = for {
    loc <- genLocation(i)
    tw <- Gen.option(Gen.oneOf("native", "epoch", "epoch_millis")
      .map(f => TimeWindowParameters(s"ts_$i", f)))
  } yield Source(s"src_$i", loc, tw)

  private val genProject: Gen[FeatureProject] = for {
    nGroups <- Gen.chooseNum(1, 3)
    sources <- Gen.sequence[Seq[Source], Source]((0 until nGroups).map(genSource))
    keys <- Gen.sequence[Seq[TypedKey], TypedKey]((0 until nGroups).map(genKey))
    featsPerGroup <- Gen.chooseNum(1, 3)
    types <- Gen.listOfN(nGroups * featsPerGroup, genFeatureType)
    transforms <- Gen.sequence[Seq[Transformation], Transformation](
      (0 until nGroups * featsPerGroup).map(genTransform))
    nDerived <- Gen.chooseNum(0, 2)
  } yield {
    val p = FeatureProject("gen")
    var f = 0
    for (g <- 0 until nGroups) {
      val feats = (0 until featsPerGroup).map { _ =>
        val af = AnchorFeature(s"f_$f", types(f), transforms(f), Seq(keys(g)))
        f += 1; af
      }
      p.addAnchorGroup(s"g_$g", sources(g), feats)
    }
    for (d <- 0 until nDerived) {
      val input = if (d == 0) "f_0" else s"d_${d - 1}"
      p.addDerived(DerivedFeature(s"d_$d", FeatureType.DOUBLE,
        s"$input + 1", Seq(InputFeature(input, Seq(keys.head))), Seq(keys.head)))
    }
    p
  }

  test("feature-config JSON round-trips for random projects (property)") {
    val prop = Prop.forAll(genProject) { p =>
      val json = FeatureConfig.toJson(p)
      val back = FeatureConfig.toJson(FeatureConfig.fromJson(json))
      if (back != json) {
        System.err.println(s"=== original ===\n$json\n=== reparsed ===\n$back")
      }
      back == json
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }
}
