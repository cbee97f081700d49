package graft

import graft.operators.Validate
import graft.operators.Validate._

class ValidateSpec extends SparkTestBase {
  import spark.implicits._

  private def result(df: org.apache.spark.sql.DataFrame, checks: Seq[Check]) =
    Validate.run(df, checks).as[(String, Boolean, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("row checks: nulls violate NotNull only; range/set/regex skip nulls") {
    val df = Seq(
      (Some("a-1"), Some(5.0)), (None, Some(50.0)), (Some("b!"), None))
      .toDF("s", "v")
    val r = result(df, Seq(
      NotNull("s"), NotNull("v"),
      InRange("v", 0, 10),
      InSet("s", Seq("a-1")),
      MatchesRegex("s", "[a-z]-?[0-9!]+"),
      SizeBetween(4, 10)))
    assert(r("not_null(s)") == ((false, 1L)))
    assert(r("not_null(v)") == ((false, 1L)))
    assert(r("in_range(v,0.0,10.0)") == ((false, 1L))) // 50 violates, null skips
    assert(r("in_set(s:a-1)") == ((false, 1L))) // "b!" violates, null skips
    assert(r("matches_regex(s)") == ((true, 0L))) // full-match both non-nulls
    assert(r("size_between(4,10)") == ((false, 3L)))
  }

  test("unique: multi-column tuples; violations = extras beyond first") {
    val df = Seq((1, "x"), (1, "x"), (1, "x"), (1, "y"), (2, "x"))
      .toDF("a", "b")
    val r = result(df, Seq(Unique(Seq("a", "b")), Unique(Seq("a"))))
    assert(r("unique(a,b)") == ((false, 2L))) // (1,x) has 2 extras
    assert(r("unique(a)") == ((false, 3L))) // a=1 has 3 extras
  }

  test("referential integrity counts orphan rows, null FK rows skip") {
    val df = Seq(Some(1L), Some(2L), Some(9L), Some(9L), None).toDF("fk")
    val ref = Seq(1L, 2L, 3L).toDF("pk")
    val r = result(df, Seq(RefIntegrity("fk", ref, "pk")))
    assert(r("ref_integrity(fk->pk)") == ((false, 2L)))
  }

  test("empty input: row checks pass, SizeBetween(1,_) fails") {
    val df = Seq.empty[(Option[String], Option[Double])].toDF("s", "v")
    val r = result(df, Seq(NotNull("s"), InRange("v", 0, 1), SizeBetween(1, 10)))
    assert(r("not_null(s)") == ((true, 0L)))
    assert(r("in_range(v,0.0,1.0)") == ((true, 0L)))
    assert(r("size_between(1,10)") == ((false, 0L)))
  }
}
