package graft

import graft.operators.Upsert

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  private val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "v")

  test("upsert replaces, inserts, deletes; tombstone drops its base row") {
    val delta = Seq(
      (2L, "b2", 22.0, false), // replace
      (4L, "d", 40.0, false),  // insert
      (3L, "c", 0.0, true))    // delete
      .toDF("k", "name", "v", "dead")
    val got = Upsert.merge(base, delta, Seq("k"), tombstoneCol = Some("dead"))
    assert(multiset(got) == multiset(
      Seq((1L, "a", 10.0), (2L, "b2", 22.0), (4L, "d", 40.0)).toDF("k", "name", "v")))
  }

  test("latest-wins by version; deterministic within-version tiebreak") {
    val delta = Seq(
      (2L, "old", 21.0, 1L), (2L, "new", 22.0, 5L),
      (1L, "tie_b", 11.0, 7L), (1L, "tie_a", 12.0, 7L)) // tie → desc cols
      .toDF("k", "name", "v", "ver")
    val got = Upsert.merge(base, delta, Seq("k"), versionCol = Some("ver"))
    val byKey = got.as[(Long, String, Double)].collect().map(r => r._1 -> r).toMap
    assert(byKey(2L) == ((2L, "new", 22.0)))
    // name desc: "tie_b" > "tie_a"
    assert(byKey(1L) == ((1L, "tie_b", 11.0)))
    assert(byKey(3L) == ((3L, "c", 30.0)))
  }

  test("duplicate delta keys without versionCol are rejected") {
    val delta = Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "name", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.merge(base, delta, Seq("k"))
    }
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("merge is idempotent: re-applying the same delta changes nothing") {
    val delta = Seq((2L, "b2", 22.0, false), (3L, "c", 0.0, true))
      .toDF("k", "name", "v", "dead")
    val once = Upsert.merge(base, delta, Seq("k"), tombstoneCol = Some("dead"))
    val twice = Upsert.merge(once, delta, Seq("k"), tombstoneCol = Some("dead"))
    assert(multiset(once) == multiset(twice))
  }

  test("schema mismatch is rejected with direction") {
    val delta = Seq((2L, "b2")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      Upsert.merge(base, delta, Seq("k"))
    }
    assert(e.getMessage.contains("must be base"))
  }
}
