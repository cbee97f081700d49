package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All sliding-window span hashes of a single-space-tokenized string
  * (normText output) in ONE pass — the Rabin-Karp rolling
  * formulation: per-token 64-bit
  * FNV-1a once per token, then each window hash derives from its
  * predecessor in O(1) (`H' = (H - t_out·B^(n-1))·B + t_in` over the
  * 2^64 ring). The SQL-combinator formulation
  * (`transform(sequence, i -> xxhash64(array_join(slice(w,i,n))))`)
  * re-joins and re-hashes n tokens PER WINDOW — O(tokens·n) hash work
  * and an interpreted HOF lambda; this is O(tokens) inside whole-stage
  * codegen. At the realistic spanTokens = 50 that is ~50× less hash
  * work per document.
  *
  * Contract: hash equality ⇔ window token-sequence equality (the only
  * property the span-dedup operators need), modulo 64-bit birthday
  * collisions — same risk class as the xxhash64 formulation. The hash
  * VALUES differ from any SQL builtin by design; never persist them
  * across engine versions.
  *
  * Fewer than `span` tokens → empty array; null input → null.
  */
object RollingSpanHash64 {
  private[functions] final val B = 0x100000001b3L // FNV prime (odd → bijective ·B)

  /** Per-token 64-bit FNV-1a hashes, one pass over the chars (shared
    * by the rolling-span, k-gram, and winnow expressions).
    *
    * Tokens split on the ASCII space ONLY — exact parity with the
    * `split(normText(text), " ")` formulation these expressions
    * replace and with the DuckDB oracles' `string_split(..., ' ')`.
    * `Character.isWhitespace` would NOT be parity: `normText`'s
    * Java-regex `\s+` collapse leaves non-ASCII whitespace (U+3000
    * ideographic space, U+2028/29, …) INSIDE tokens, and so must we.
    */
  private[functions] def tokenHashes(str: String): Array[Long] = {
    val tb = new scala.collection.mutable.ArrayBuilder.ofLong
    var i = 0
    val len = str.length
    while (i < len) {
      while (i < len && str.charAt(i) == ' ') i += 1
      if (i < len) {
        var h = 0xcbf29ce484222325L
        while (i < len && str.charAt(i) != ' ') {
          h ^= str.charAt(i)
          h *= B
          i += 1
        }
        tb += h
      }
    }
    tb.result()
  }

  def hashes(s: UTF8String, span: Int): ArrayData = {
    if (s == null) return null
    val t = tokenHashes(s.toString)
    val m = t.length - span + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    var bn = 1L // B^(span-1): the roll-out coefficient
    var k = 0
    while (k < span - 1) { bn *= B; k += 1 }
    val out = new Array[Long](m)
    var h = 0L
    k = 0
    while (k < span) { h = h * B + t(k); k += 1 }
    out(0) = h
    var w = 1
    while (w < m) {
      h = (h - t(w - 1) * bn) * B + t(w + span - 1)
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }
}

case class RollingSpanHash64Expr(child: Expression, span: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() = {
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_span_hash64 needs STRING, got ${child.dataType}")
    else if (span < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_span_hash64 needs span >= 1, got $span")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(input: Any): Any =
    RollingSpanHash64.hashes(input.asInstanceOf[UTF8String], span)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingSpanHash64.hashes($c, $span)")

  override protected def withNewChildInternal(
      newChild: Expression): RollingSpanHash64Expr = copy(child = newChild)

  override def prettyName: String = "rolling_span_hash64"
}

object RollingSpanHash64Expr {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API: all `span`-token window hashes of a normalized string. */
  def spanHashes64(c: Column, span: Int): Column =
    ColumnBridge.column(RollingSpanHash64Expr(ColumnBridge.expression(c), span))
}
