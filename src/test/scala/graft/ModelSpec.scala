package graft

import graft.model._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Pure-model tests: duration grammar (reference utils.rs:62-112
  * semantics), tensor type mapping, key/project validation.
  */
class ModelSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("duration grammar: units and aliases") {
    assert(Durations.parse("90d").toDays == 90)
    assert(Durations.parse("24h") == Durations.parse("1d"))
    assert(Durations.parse("60 minutes") == Durations.parse("1h"))
    assert(Durations.parse("1500ms").toMillis == 1500)
    assert(Durations.parse("250").toMillis == 250) // bare number = ms
    assert(Durations.parse("3 seconds").getSeconds == 3)
    intercept[IllegalArgumentException](Durations.parse("10 fortnights"))
    intercept[IllegalArgumentException](Durations.parse("d"))
  }

  test("duration format round-trips through parse (property)") {
    checkProp(Prop.forAll(Gen.chooseNum(1L, 1000000L)) { n =>
      val d = java.time.Duration.ofSeconds(n)
      Durations.parse(Durations.format(d)) == d
    })
  }

  test("feature types map to Spark SQL types (SURVEY §1.2)") {
    assert(FeatureType.DOUBLE.sparkType == DoubleType)
    assert(FeatureType.BOOLEAN.sparkType == BooleanType)
    assert(FeatureType.BYTES.sparkType == BinaryType)
    assert(FeatureType.FLOAT_VECTOR.sparkType == ArrayType(FloatType))
    // the reference's vector ctors all say BOOL (model.rs:110-143 bug);
    // ours carry the intended value type
    assert(FeatureType.INT64_VECTOR.sparkType == ArrayType(LongType))
    val sparse = FeatureType(TensorCategory.SPARSE, Seq(ValueType.INT32), ValueType.DOUBLE)
    assert(sparse.sparkType.isInstanceOf[StructType])
  }

  test("anchor group rejects mixed key schemas (project.rs:501-504)") {
    import graft.project._
    import graft.sources._
    val p = FeatureProject("t")
    val src = Source("s", DataLocation.Hdfs("/tmp/x.parquet"))
    val k1 = TypedKey("a", ValueType.INT64)
    val k2 = TypedKey("b", ValueType.INT64)
    intercept[IllegalArgumentException] {
      p.addAnchorGroup("g", src, Seq(
        AnchorFeature("f1", FeatureType.DOUBLE, Transformation.Expr("x"), Seq(k1)),
        AnchorFeature("f2", FeatureType.DOUBLE, Transformation.Expr("y"), Seq(k2))))
    }
  }

  test("dummy-key features require INPUT_CONTEXT (project.rs:522-526)") {
    import graft.project._
    import graft.sources._
    val p = FeatureProject("t")
    val src = Source("s", DataLocation.Hdfs("/tmp/x.parquet"))
    intercept[IllegalArgumentException] {
      p.addAnchorGroup("g", src, Seq(
        AnchorFeature("f1", FeatureType.DOUBLE, Transformation.Expr("x"),
          Seq(TypedKey.DUMMY_KEY))))
    }
  }

  test("derived-feature DAG: topo order + cycle detection") {
    import graft.project._
    import graft.sources._
    val p = FeatureProject("t")
    val k = TypedKey("a", ValueType.INT64)
    p.addAnchorGroup("g", Source("s", DataLocation.Hdfs("/tmp/x.parquet")), Seq(
      AnchorFeature("base", FeatureType.DOUBLE, Transformation.Expr("x"), Seq(k))))
    p.addDerived(DerivedFeature("d1", FeatureType.DOUBLE, "base + 1",
      Seq(InputFeature("base", Seq(k))), Seq(k)))
    p.addDerived(DerivedFeature("d2", FeatureType.DOUBLE, "d1 * 2",
      Seq(InputFeature("d1", Seq(k))), Seq(k)))
    assert(p.topoSortDerived(Seq("d2")).map(_.name) == Seq("d1", "d2"))
    assert(p.requiredAnchorFeatures(Seq("d2")) == Seq(("base", "base")))
    intercept[NoSuchElementException](p.requiredAnchorFeatures(Seq("nope")))
  }

  test("feathr expression rewriter maps extension scalars") {
    import graft.functions.FeathrExpr
    assert(FeathrExpr.rewrite("cast_float(x) + cast_int(y)") == "float(x) + int(y)")
    assert(FeathrExpr.rewrite("isPresent(a_cast_float)") == "isnotnull(a_cast_float)")
    // no false positives on substrings
    assert(FeathrExpr.rewrite("my_cast_floats(x)") == "my_cast_floats(x)")
  }
}
