package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass language-ID / stopword / token-count stack as a native
  * codegen'd Catalyst expression — the 100 TB shape for per-document
  * text classification (SURVEY.md §2.11).
  *
  * The higher-order-function formulation (5 languages × `filter` +
  * `array_contains` lambdas, plus an `aggregate` lambda for the token
  * count) is scale-safe in SHAPE (pure projection, zero shuffle) but
  * Spark evaluates HOF lambdas interpreted, never codegen'd, so the
  * per-row CPU multiplied 6 array traversals per document. This
  * expression walks the normalized text ONCE, emitting a struct of
  *  - per-language stopword hit counts (`de/en/es/fr/zh_hits`),
  *  - `lang_pred` — argmax of hits, ties broken toward the
  *    lexicographically greatest language code (parity with
  *    `array_max` over `struct(hits, lang)`), `und` when no list hits,
  *  - `approx_tokens` — Σ ceil(wordChars / maxLen), the BPE-ish proxy.
  *
  * Input MUST be the normalized text ([[graft.operators.Dedup.normText]]:
  * lowercase, single-space collapsed, trimmed) so the normalization
  * itself stays in Catalyst's codegen'd `lower`/`regexp_replace`/`trim`
  * and value parity with the split-on-" " pipeline is exact (an empty
  * string is one empty word). Multiple `getField` projections of the
  * same call collapse to one evaluation via Spark's subexpression
  * elimination.
  *
  * Reference semantics: Feathr's transformation expressions are plain
  * Spark SQL (feathr-rs/src/project.rs); this stack is graft's
  * LLM-pipeline extension, not a reference port.
  */
object TextLangTokens {
  // Sorted language order — tie-break scans left to right taking >=,
  // so the lexicographically greatest winner matches array_max.
  // This is the CANONICAL copy of the per-language stopword lists:
  // `TextAnalysis.stopwords` derives from it (the DuckDB oracles in
  // SparkEntry embed the same lists — change all together).
  val langs: Array[String] = Array("de", "en", "es", "fr", "zh")

  val stopwordSets: Array[Array[String]] = Array(
    Array("der", "die", "das", "und", "ist", "ein", "zu", "nicht"), // de
    Array("the", "a", "of", "and", "to", "in", "is", "that"), // en
    Array("el", "la", "de", "que", "y", "en", "un", "es"), // es
    Array("le", "la", "de", "et", "un", "est", "que", "dans"), // fr
    Array("的", "是", "了", "在", "我", "有", "和", "不")) // zh

  // word -> bitmask over langs (words like "la"/"de"/"que"/"un" are
  // stopwords of more than one language).
  private val masks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < stopwordSets.length) {
      stopwordSets(i).foreach { w =>
        m.put(w, Integer.valueOf(Option(m.get(w)).fold(0)(_.intValue()) | (1 << i)))
      }
      i += 1
    }
    m
  }

  def compute(norm: UTF8String, maxLen: Int): InternalRow = {
    if (norm == null) return null
    val str = norm.toString
    val n = str.length
    val hits = new Array[Int](5)
    var tokens = 0L
    var wordStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        val cpLen = str.codePointCount(wordStart, i)
        if (cpLen > 0) tokens += (cpLen + maxLen - 1) / maxLen
        val mask = masks.get(str.substring(wordStart, i))
        if (mask != null) {
          val m = mask.intValue()
          var b = 0
          while (b < 5) { if ((m & (1 << b)) != 0) hits(b) += 1; b += 1 }
        }
        wordStart = i + 1
      }
      i += 1
    }
    var best = -1
    var bestHits = 0
    var b = 0
    while (b < 5) {
      if (hits(b) > 0 && hits(b) >= bestHits) { best = b; bestHits = hits(b) }
      b += 1
    }
    val lang = if (best < 0) "und" else langs(best)
    new GenericInternalRow(Array[Any](
      hits(0), hits(1), hits(2), hits(3), hits(4),
      UTF8String.fromString(lang), tokens))
  }
}

case class TextLangTokensExpr(child: Expression, maxLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("de_hits", IntegerType, nullable = false),
    StructField("en_hits", IntegerType, nullable = false),
    StructField("es_hits", IntegerType, nullable = false),
    StructField("fr_hits", IntegerType, nullable = false),
    StructField("zh_hits", IntegerType, nullable = false),
    StructField("lang_pred", StringType, nullable = false),
    StructField("approx_tokens", LongType, nullable = false)))

  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"text_lang_tokens needs STRING, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextLangTokens.compute(input.asInstanceOf[UTF8String], maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextLangTokens.compute($c, $maxLen)")

  override protected def withNewChildInternal(newChild: Expression): TextLangTokensExpr =
    copy(child = newChild)

  override def prettyName: String = "text_lang_tokens"
}

object TextLangTokensExpr {
  import org.apache.spark.sql.graft.ColumnBridge

  /** `c` must already be normText-normalized. */
  def textLangTokens(c: Column, maxLen: Int = 4): Column =
    ColumnBridge.column(TextLangTokensExpr(ColumnBridge.expression(c), maxLen))
}
