package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** BM25 top-k retrieval (`Retrieval.bm25TopK`). */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the lazy dog sleeps all day in the sun"),
    (3L, "quantum chromodynamics governs the strong interaction"),
    (4L, "a fox and a dog walk into the sun"),
    (5L, "the the the the the the the the")
  ).toDF("doc_id", "text")

  test("self-retrieval: a document's own text is its best match") {
    val queries = corpus.select($"doc_id".as("q_id"), $"text".as("q_text"))
    val top = Retrieval.bm25TopK(corpus, queries, k = 1)
      .select("q_id", "doc_id").as[(Long, Long)].collect().toMap
    for (id <- 1L to 5L)
      assert(top(id) == id, s"query $id retrieved ${top(id)}")
  }

  test("idf ordering: rare-term match outranks common-term match") {
    // "quantum" appears in one doc, "dog" in three; a query with both
    // must rank the quantum doc (rare term, high idf) first
    val queries = Seq((100L, "quantum dog")).toDF("q_id", "q_text")
    val hits = Retrieval.bm25TopK(corpus, queries, k = 5)
      .orderBy($"rank").select("doc_id").as[Long].collect()
    assert(hits.head == 3L, s"expected doc 3 first, got ${hits.toSeq}")
    // every dog-containing doc surfaces after it
    assert(hits.toSet.intersect(Set(1L, 2L, 4L)) == Set(1L, 2L, 4L))
  }

  test("maxDfFrac prunes saturated terms from the candidate set") {
    // "the" is in 5/5 docs; with maxDfFrac=0.9 a the-only query
    // matches nothing instead of fanning out to the whole corpus
    val queries = Seq((100L, "the")).toDF("q_id", "q_text")
    val pruned = Retrieval.bm25TopK(corpus, queries, k = 5, maxDfFrac = 0.9)
    assert(pruned.count() == 0)
    val unpruned = Retrieval.bm25TopK(corpus, queries, k = 5)
    assert(unpruned.count() == 5)
  }

  test("scores match an independent plain-Scala BM25 fold (rounded grid)") {
    val docs = corpus.as[(Long, String)].collect().toSeq
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = docs.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def df(term: String) = toks.values.count(_.contains(term))
    def bm25(q: Seq[String], d: Long): Double = {
      val dl = toks(d).size
      q.distinct.filter(t => toks(d).contains(t)).map { t =>
        val tf = toks(d).count(_ == t)
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.sum
    }
    val qText = "lazy fox sun"
    val queries = Seq((7L, qText)).toDF("q_id", "q_text")
    val got = Retrieval.bm25TopK(corpus, queries, k = 5)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val want = docs.map(_._1)
      .map(id => id -> bm25(qText.split(" ").toSeq, id))
      .filter(_._2 > 0).toMap
    assert(got.keySet == want.keySet)
    for ((id, s) <- want)
      assert(math.abs(got(id) - s) < 1e-5, s"doc $id: got ${got(id)}, want $s")
  }

  test("rrfFuse matches an independent plain-Scala fusion fold") {
    // two hand-built rankings with partial overlap and a cross-list tie
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1)).toDF("q_id", "doc_id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 13L, 2), (1L, 12L, 3),
      (2L, 21L, 1)).toDF("q_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(a, b, k = 10)
      .select("q_id", "doc_id", "rank", "rrf_i")
      .as[(Long, Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(r => (r._2, r._4)).toSeq)
      .toMap
    def rrf(ra: Option[Int], rb: Option[Int]): Double =
      ra.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rb.map(r => 1.0 / (60 + r)).getOrElse(0.0)
    val wantQ1 = Map(
      10L -> rrf(Some(1), None), 11L -> rrf(Some(2), Some(1)),
      12L -> rrf(Some(3), Some(3)), 13L -> rrf(None, Some(2)))
      .toSeq.sortBy { case (id, s) => (-s, id) }
      .map { case (id, s) => (id, math.floor(s * 1e9).toLong) }
    assert(got(1L) == wantQ1, s"q1: ${got(1L)} vs $wantQ1")
    // q2: doc 20 (list a rank 1) and doc 21 (list b rank 1) tie on
    // rrf — the id tiebreak must order 20 before 21
    assert(got(2L).map(_._1) == Seq(20L, 21L))
    assert(got(2L)(0)._2 == got(2L)(1)._2)
  }

  test("rrfFuse caps output at k per query") {
    val a = (1 to 30).map(r => (1L, 100L + r, r)).toDF("q_id", "doc_id", "rank")
    val b = (1 to 30).map(r => (1L, 200L + r, r)).toDF("q_id", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(a, b, k = 7)
    assert(fused.count() == 7)
    assert(fused.agg(max("rank")).as[Int].head() == 7)
  }

  test("corpus statistics count zero-token and null-text documents " +
      "(r15 single-pass stats collect the same N/sumdl the lazy frame did)") {
    // the r15 rewrite collects (N, sumdl) once from the persisted
    // tokenized projection and injects them as literals; docs whose
    // token list is EMPTY or whose text is NULL must still count
    // toward N (they did under the old lazy count(lit(1)) over the
    // corpus), shifting every idf — pin the full ranked output against
    // the same independent fold as above, with such docs present
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val rows = Seq(Row(1L, "the quick brown fox"), Row(2L, "lazy dog"),
      Row(3L, ""), Row(4L, null))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val c = spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava),
      schema)
    val queries = Seq((7L, "fox dog")).toDF("q_id", "q_text")
    val got = Retrieval.bm25TopK(c, queries, k = 5)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // independent fold with N = 4 (empty and null docs count), sumdl = 6
    val toks = Map(1L -> Seq("the", "quick", "brown", "fox"),
      2L -> Seq("lazy", "dog"))
    val n = 4; val avgdl = 6.0 / n
    def df(t: String) = toks.values.count(_.contains(t))
    def bm25(q: Seq[String], d: Long): Double =
      q.distinct.filter(toks(d).contains).map { t =>
        val tf = toks(d).count(_ == t)
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks(d).size / avgdl))
      }.sum
    val want = Seq(1L, 2L).map(id => id -> bm25(Seq("fox", "dog"), id)).toMap
    assert(got.keySet == want.keySet)
    for ((id, s) <- want)
      assert(math.abs(got(id) - s) < 1e-5, s"doc $id: got ${got(id)}, want $s")
  }

  test("query terms absent from the corpus contribute nothing") {
    val queries = Seq((9L, "zzz unseen fox")).toDF("q_id", "q_text")
    val withUnseen = Retrieval.bm25TopK(corpus, queries, k = 5)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val foxOnly = Retrieval.bm25TopK(
        corpus, Seq((9L, "fox")).toDF("q_id", "q_text"), k = 5)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(withUnseen == foxOnly)
  }
}
