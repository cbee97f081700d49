package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md
  * §2.11): quality stats, language ID, token counting, fingerprinting.
  * All pure columnar projections — zero shuffle, fully codegen'd, so
  * they stream at scan speed over 100 TB.
  */
object TextAnalysis {

  /** Whitespace word tokens of the normalized text. */
  def words(text: Column): Column = split(Dedup.normText(text), " ")

  /** Basic quality statistics. Deterministic, oracle-friendly
    * definitions (documented inline).
    */
  def stats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val ws = words(t)
    df.withColumn("n_chars_calc", length(t))
      .withColumn("n_words", size(ws))
      .withColumn("avg_word_len",
        round(aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
          size(ws), 4))
      .withColumn("n_punct", size(split(t, "[\\p{Punct}]")) - 1)
      .withColumn("n_digits", size(split(t, "[0-9]")) - 1)
      .withColumn("distinct_word_ratio",
        round(size(array_distinct(ws)).cast("double") / size(ws), 4))
  }

  /** Heuristic quality score in [0, 1]: long-enough docs with diverse
    * words and few digits score high. The exact formula is arbitrary
    * but fixed (reproducible across engines).
    */
  def qualityScore(text: Column): Column = {
    val ws = words(text)
    val lenScore = least(size(ws).cast("double") / 100.0d, lit(1.0d))
    val diversity = size(array_distinct(ws)).cast("double") / greatest(size(ws), lit(1))
    val digitPenalty = (size(split(text, "[0-9]")) - 1).cast("double") /
      greatest(length(text), lit(1))
    round(greatest(least(lenScore * diversity - digitPenalty, lit(1.0d)), lit(0.0d)), 4)
  }

  /** Tiny stopword lists per language for n-gram/stopword language ID.
    * Real pipelines plug in larger lists; the operator shape (count
    * word-set hits per language, argmax) is what matters.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "nicht"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Count of tokens that are stopwords of the given language. */
  def stopwordHits(text: Column, lang: String): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    size(filter(words(text), w => array_contains(sw, w)))
  }

  /** Language ID: argmax of per-language stopword hit counts; `und`
    * when no list matches at all. Deterministic tie-break by language
    * code order.
    */
  def languageId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scored = array(langs.map(l =>
      struct(stopwordHits(text, l).as("hits"), lit(l).as("lang"))): _*)
    val best = array_max(filter(scored, s => s.getField("hits") > 0))
    when(best.isNull, lit("und")).otherwise(best.getField("lang"))
  }

  /** BPE-ish subword token count: splits words longer than `maxLen`
    * chars into ceil(len/maxLen) pieces — the standard cheap proxy for
    * LLM token budgeting when the real tokenizer is out of process.
    */
  def approxTokenCount(text: Column, maxLen: Int = 4): Column =
    aggregate(words(text), lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / maxLen).cast("long"))

  /** Stable document fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(Dedup.normText(text))

  /** Rolling polynomial hash over word tokens (base 31, mod 2^61-1) —
    * shift-invariant prefix hashing primitive for chunk-level dedup.
    */
  def rollingHash(text: Column): Column = {
    val mod = lit(2305843009213693951L) // 2^61 - 1
    aggregate(words(text), lit(0L),
      (acc, w) => pmod(acc * 31L + pmod(xxhash64(w), mod), mod))
  }

  def analyze(df: DataFrame, textCol: String): DataFrame =
    stats(df, textCol)
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("lang_pred", languageId(col(textCol)))
      .withColumn("approx_tokens", approxTokenCount(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))
}
