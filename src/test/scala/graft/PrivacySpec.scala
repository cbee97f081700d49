package graft

import graft.operators.Privacy

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  // (id, lang, source): en/web ×4, en/book ×2, fr/web ×1
  private val docs = Seq(
    (1L, "en", "web"), (2L, "en", "web"), (3L, "en", "web"), (4L, "en", "web"),
    (5L, "en", "book"), (6L, "en", "book"),
    (7L, "fr", "web"))
    .toDF("id", "lang", "source")
    .withColumn("n", col("id") * 10)

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  test("kAnonymize keeps exactly the cells of size >= k") {
    assert(Privacy.kAnonymize(docs, Seq("lang", "source"), 3)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(Privacy.kAnonymize(docs, Seq("lang", "source"), 2)
      .select("id").as[Long].collect().sorted.toSeq == (1L to 6L))
    // k=1 is a no-op
    assert(Privacy.kAnonymize(docs, Seq("lang", "source"), 1).count() == 7)
  }

  test("null quasi-identifier combinations count and survive like any other") {
    // 4 rows with lang=NULL share one combination — a plain equi-semi-
    // join would drop all of them regardless of k
    val withNulls = docs.unionByName(
      Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L))
        .toDF("id", "n").withColumn("lang", lit(null: String))
        .withColumn("source", lit("web")).select("id", "lang", "source", "n"))
    val kept = Privacy.kAnonymize(withNulls, Seq("lang", "source"), 4)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L))
  }

  test("kAnonymousReport folds small cells into a reconciling residual") {
    val rep = Privacy.kAnonymousReport(docs, Seq("lang", "source"), 3,
      Seq("n"))
    val want = Seq(
      ("en", "web", 4L, 100L), // 10+20+30+40
      ("*", "*", 3L, 180L))    // book 50+60 + fr/web 70
      .toDF("lang", "source", "n_rows", "sum_n")
    assert(multiset(rep) == multiset(want))
    // totals reconcile with the corpus
    val tot = rep.agg(sum("n_rows"), sum("sum_n")).head()
    assert(tot.getLong(0) == 7L && tot.getLong(1) == 280L)
  }

  test("no small cells -> no residual row; all small -> residual only") {
    val rep1 = Privacy.kAnonymousReport(docs, Seq("lang", "source"), 1)
    assert(rep1.where(col("lang") === "*").count() == 0)
    assert(rep1.count() == 3)
    val rep2 = Privacy.kAnonymousReport(docs, Seq("lang", "source"), 100)
    assert(rep2.count() == 1 &&
      rep2.head().getString(0) == "*" && rep2.head().getAs[Long]("n_rows") == 7L)
  }

  test("strictResidual drops a residual smaller than k") {
    // only fr/web (1 row) is suppressed at k=2 — residual of size 1 < k
    val strict = Privacy.kAnonymousReport(docs, Seq("lang", "source"), 2,
      strictResidual = true)
    assert(strict.where(col("lang") === "*").count() == 0)
    assert(strict.agg(sum("n_rows")).head().getLong(0) == 6L)
  }
}
