package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native integration point for graft's custom Catalyst
  * expressions: enable with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (the standard
  * `SparkSessionExtensions` mechanism), or call
  * [[GraftFunctions.registerAll]] on a live session. Either way the
  * expressions become plain SQL functions:
  *
  *   SELECT simhash64(text),
  *          minhash_sig(text, 128, 5),
  *          graft_dot(a, b), graft_l2norm(a),
  *          winnow_fps64(text, 5, 4),
  *          kgram_hashes64(text, 5),
  *          rolling_span_hash64(text, 50),
  *          pq_adc(codes, table, 16)
  *
  * All are codegen'd native expressions — usable from pure-SQL
  * pipelines without touching the Scala API. The SQL text fingerprints
  * apply the SAME normalization as the operator path
  * ([[graft.operators.Dedup.normText]]: lowercase, collapse
  * whitespace, trim) — a signature computed in SQL collides with one
  * computed by `Dedup.minhashNearDuplicates` for case/whitespace
  * variants of the same text, as LSH recall requires.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.{Literal, Lower, RegExpReplace, StringTrim}

  private def intArg(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal integer")
    e.eval().asInstanceOf[Number].intValue()
  }

  /** The Catalyst form of [[graft.operators.Dedup.normText]] — the
    * SAME three passes (CJK codepoint spacing, whitespace collapse,
    * lowercase+trim), so SQL-computed fingerprints are
    * collision-compatible with operator-side ones for CJK text too
    * (idempotent, so double application is harmless).
    */
  def normText(e: Expression): Expression =
    StringTrim(RegExpReplace(
      RegExpReplace(Lower(e),
        Literal("([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}])"),
        Literal(" $1 ")),
      Literal("\\s+"), Literal(" ")))

  private def fn(name: String, builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo("graft.functions", name), builder)

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("simhash64", es => SimHash64Expr(normText(es.head))),
    fn("minhash_sig", es => MinHashSigExpr(normText(es.head),
      if (es.length > 1) intArg(es(1), "minhash_sig numHashes") else 128,
      if (es.length > 2) intArg(es(2), "minhash_sig shingleSize") else 5)),
    fn("graft_dot", es => DotProductExpr(es(0), es(1))),
    fn("graft_l2norm", es =>
      org.apache.spark.sql.catalyst.expressions.Sqrt(DotProductExpr(es.head, es.head))),
    fn("winnow_fps64", es => WinnowFps64Expr(normText(es.head),
      if (es.length > 1) intArg(es(1), "winnow_fps64 k") else 5,
      if (es.length > 2) intArg(es(2), "winnow_fps64 w") else 4)),
    fn("kgram_hashes64", es => KGramHashes64Expr(normText(es.head),
      if (es.length > 1) intArg(es(1), "kgram_hashes64 k") else 5)),
    fn("rolling_span_hash64", es => RollingSpanHash64Expr(normText(es.head),
      if (es.length > 1) intArg(es(1), "rolling_span_hash64 span") else 50)),
    fn("pq_adc", es => PqAdcExpr(es(0), es(1),
      if (es.length > 2) intArg(es(2), "pq_adc kCodes") else 16)))

  /** Register every graft function on an already-running session. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
