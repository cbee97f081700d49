package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (MOSS, Schleimer et al. 2003) of a
  * whitespace-tokenized string in ONE pass per row, inside whole-stage
  * codegen: per-token FNV-1a, rolling k-gram polynomial hashes
  * (O(1) per gram, the [[RollingSpanHash64]] formulation), sliding
  * minimum over `w` grams via a monotonic deque, sort + dedupe.
  *
  * The SQL-combinator formulation this replaces needed `posexplode` +
  * THREE window functions over `partitionBy(doc)` — a full shuffle and
  * per-doc sort of every token in the corpus — plus a global
  * `distinct`. This is a zero-shuffle projection.
  *
  * Winnow guarantee (unchanged — it is a property of the algorithm,
  * not the hash family): two documents sharing a token run of at least
  * `w + k - 1` tokens share at least one fingerprint. Matching the
  * combinator formulation's edge semantics: documents with fewer than
  * `k` tokens emit ONE truncated gram (so every non-empty document has
  * at least one fingerprint); prefix windows shorter than `w` emit
  * their partial minima. Token-less input → empty; null → null.
  * Fingerprint VALUES are engine-internal — never persist across
  * versions.
  */
object WinnowFps64 {
  import RollingSpanHash64.{B, tokenHashes}

  def fps(s: UTF8String, k: Int, w: Int): ArrayData = {
    if (s == null) return null
    val t = tokenHashes(s.toString)
    if (t.length == 0) return new GenericArrayData(Array.emptyLongArray)
    // k-gram rolling hashes (shared with the shingle expression);
    // < k tokens → one truncated gram
    val grams = KGramHashes64.gramHashes(t, k)
    val m = grams.length
    // sliding min over w grams (partial prefix windows included) via a
    // monotonic deque of gram indices; one fingerprint per gram position
    val out = new Array[Long](m)
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    var j = 0
    while (j < m) {
      while (tail > head && grams(deque(tail - 1)) >= grams(j)) tail -= 1
      deque(tail) = j
      tail += 1
      if (deque(head) <= j - w) head += 1
      out(j) = grams(deque(head))
      j += 1
    }
    // dedupe (unsigned sort order — order is irrelevant to consumers)
    java.util.Arrays.sort(out)
    var n = 0
    j = 0
    while (j < m) {
      if (n == 0 || out(j) != out(n - 1)) { out(n) = out(j); n += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }
}

case class WinnowFps64Expr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() = {
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fps64 needs STRING, got ${child.dataType}")
    else if (k < 1 || w < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fps64 needs k >= 1 and w >= 1, got k=$k w=$w")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(input: Any): Any =
    WinnowFps64.fps(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFps64.fps($c, $k, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFps64Expr = copy(child = newChild)

  override def prettyName: String = "winnow_fps64"
}

object WinnowFps64Expr {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API: distinct winnow fingerprints of a normalized string. */
  def winnowFps64(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFps64Expr(ColumnBridge.expression(c), k, w))
}
