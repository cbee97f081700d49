package graft

import graft.operators.TextAnalysis

/** Span-level exact dedup (Lee et al. 2021 repeated substrings):
  * window accounting, within-doc repeats excluded, the CUT removal
  * policy, and the degenerate short/null/fully-covered documents.
  */
class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val L = 3

  private def corpus = Seq(
    (1L, "a b c X Y Z"),        // 4 windows, shares "X Y Z" with doc 2
    (2L, "p q X Y Z"),          // 3 windows, shares "X Y Z"
    (3L, "u v w"),              // 1 unique window
    (4L, "m n o m n o"),        // within-doc repeat only: NOT cross-doc
    (5L, "k"),                  // shorter than L: zero windows
    (6L, null.asInstanceOf[String])) // null text: zero windows
    .toDF("doc_id", "text")

  test("repeatedSpanStats: exact window counts; within-doc repeats excluded") {
    val stats = TextAnalysis.repeatedSpanStats(corpus, "text", "doc_id",
      spanTokens = L)
      .select("doc_id", "n_windows", "n_repeated", "has_repeat")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(stats.size == 6, "every document gets a row")
    assert(stats(1L) == ((1L, 4L, 1L, true)))
    assert(stats(2L) == ((2L, 3L, 1L, true)))
    assert(stats(3L) == ((3L, 1L, 0L, false)))
    // "m n o" occurs twice WITHIN doc 4 but in no other doc
    assert(stats(4L) == ((4L, 4L, 0L, false)), s"within-doc: ${stats(4L)}")
    assert(stats(5L) == ((5L, 0L, 0L, false)))
    assert(stats(6L) == ((6L, 0L, 0L, false)))
  }

  test("dropRepeatedSpans: CUT excises every occurrence, survivors keep order") {
    val out = TextAnalysis.dropRepeatedSpans(corpus, "text", "doc_id",
      spanTokens = L)
      .as[(Long, String)].collect().toMap
    assert(out.size == 6)
    assert(out(1L) == "a b c", s"slogan cut from doc 1: '${out(1L)}'")
    assert(out(2L) == "p q", s"slogan cut from doc 2: '${out(2L)}'")
    assert(out(3L) == "u v w", "unique doc unchanged")
    assert(out(4L) == "m n o m n o", "within-doc repeat not excised")
    assert(out(5L) == "k", "short doc unchanged")
    assert(out(6L) == "", "null-text doc survives as empty string")
  }

  test("fully-covered document survives as empty string") {
    val c = corpus.unionByName(Seq((7L, "X Y Z")).toDF("doc_id", "text"))
    val out = TextAnalysis.dropRepeatedSpans(c, "text", "doc_id", spanTokens = L)
      .as[(Long, String)].collect().toMap
    assert(out(7L) == "", s"doc 7 fully covered: '${out(7L)}'")
    // doc 7 joining the "X Y Z" club changes nothing for docs 1-2
    assert(out(1L) == "a b c" && out(2L) == "p q")
  }

  test("overlapping repeated windows excise the union of their cover") {
    // docs share a 4-token run -> two overlapping repeated 3-windows;
    // covered positions are the union (all 4 tokens), once each
    val c = Seq((1L, "s t u v tail1"), (2L, "s t u v tail2"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.dropRepeatedSpans(c, "text", "doc_id", spanTokens = L)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "tail1" && out(2L) == "tail2", s"$out")
  }
}
