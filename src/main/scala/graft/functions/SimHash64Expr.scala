package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 64-bit SimHash of a whitespace-tokenized string as a
  * native Catalyst expression WITH codegen — the SQL-combinator
  * formulation needs 64 interpreted folds over the token array (or an
  * explode + 64 aggregates + a shuffle); this does one pass per row
  * inside whole-stage codegen, zero shuffle.
  *
  * Semantics: normalize (lowercase, split on whitespace runs), hash
  * each token with a 64-bit FNV-1a, accumulate +1/-1 per bit by the
  * token-hash bit, emit the sign bit vector. Self-consistent (pairs
  * with [[SimHash64.hamming]]); not required to match any SQL builtin.
  */
object SimHash64 {
  def hash(s: UTF8String): Long = {
    if (s == null) return 0L
    val str = s.toString.toLowerCase
    val counts = new Array[Int](64)
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && Character.isWhitespace(str.charAt(i))) i += 1
      if (i < n) {
        // FNV-1a over the token's chars
        var h = 0xcbf29ce484222325L
        while (i < n && !Character.isWhitespace(str.charAt(i))) {
          h ^= str.charAt(i)
          h *= 0x100000001b3L
          i += 1
        }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs STRING, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64Expr {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API (Spark 4 classic Column ↔ Expression bridge). */
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(c)))

  /** SQL registration: `SELECT simhash64(text) ...` — normalizes like
    * the operator path (see [[GraftFunctions.normText]]).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(GraftFunctions.normText(exprs.head)),
      "built-in")
}
