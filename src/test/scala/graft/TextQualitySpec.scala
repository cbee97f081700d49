package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.Row

/** Gopher/C4 quality rules — each rule isolated by a crafted document. */
class TextQualitySpec extends SparkTestBase {
  import spark.implicits._

  private def rules(text: String): Row =
    TextAnalysis.gopherRules(Seq((1L, text)).toDF("doc_id", "text"), "text")
      .select("rule_word_count", "rule_mean_word_len", "rule_symbol_ratio",
        "rule_alpha_words", "rule_stopwords", "passes")
      .head()

  private val goodWords =
    (0 until 60).map(i => s"word$i").mkString(" ") + " the of and is"

  test("a normal document passes every rule") {
    val r = rules(goodWords)
    assert((0 until 6).forall(r.getBoolean), s"expected all-pass, got $r")
  }

  test("each rule fails in isolation on its pathological document") {
    // too short (10 words), everything else healthy
    assert(!rules("the of and is a word here to read now").getBoolean(0))
    // mean word length > 10
    val longWords = (0 until 60).map(i => s"pneumonoultramicroscopic$i")
      .mkString(" ") + " the of and is"
    val rLong = rules(longWords)
    assert(rLong.getBoolean(0) && !rLong.getBoolean(1))
    // symbol-heavy: > 0.1 '#' per word
    val symbolic = goodWords + " " + ("#### ### ##" * 3)
    assert(!rules(symbolic).getBoolean(2))
    // mostly numeric words → alpha fraction < 0.8
    val numeric = (0 until 60).map(i => s"$i$i$i").mkString(" ") + " the of and is"
    assert(!rules(numeric).getBoolean(3))
    // no English stopwords at all
    val noStop = (0 until 64).map(i => s"w$i").mkString(" ")
    val rNs = rules(noStop)
    assert(!rNs.getBoolean(4) && !rNs.getBoolean(5))
  }

  test("repetition filter: chorus-heavy doc fails, varied doc passes") {
    val varied = (0 until 60).map(i => s"w$i").mkString(" ")
    val chorus = (0 until 20).map(_ => "la la la hey").mkString(" ")
    val df = Seq((1L, varied), (2L, chorus)).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(df, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(3), "unique bigrams must pass")
    assert(!r(2L).getBoolean(3), "repeated chorus must fail")
    assert(r(2L).getDouble(2) > 0.9)
    // gram count = words - 1 for multi-word docs
    assert(r(1L).getLong(1) == 59)
  }

  test("diagnostics are exact on a constructed document") {
    // 50 words of length 4 + 'the the' → 52 words
    val doc = (0 until 50).map(_ => "abcd").mkString(" ") + " the the"
    val r = TextAnalysis.gopherRules(Seq((1L, doc)).toDF("doc_id", "text"), "text")
      .select("n_words", "mean_word_len", "stopword_hits", "passes").head()
    assert(r.getInt(0) == 52)
    assert(math.abs(r.getDouble(1) - (50 * 4 + 2 * 3) / 52.0) < 5e-5)
    assert(r.getInt(2) == 2)
    assert(r.getBoolean(3))
  }
}
