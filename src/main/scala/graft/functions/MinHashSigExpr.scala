package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature of a normalized (lowercased,
  * space-collapsed) string as a native Catalyst expression WITH
  * codegen — the 100 TB shape for near-dup candidate generation.
  *
  * The pipeline formulation (explode shingle rows → window → typed
  * min-fold aggregation, [[graft.operators.Dedup.minhashSignatures]])
  * shuffles EVERY (id, shingle) row by id before folding; this
  * expression computes the whole `numHashes`-long signature inside the
  * scan projection, so the only thing that ever shuffles is the
  * (id, signature) row — ~1 KB per document instead of the document's
  * shingle set.
  *
  * Semantics: word `shingleSize`-grams over the single-space-separated
  * words; each shingle hashed once (FNV-1a over the words' 64-bit
  * FNV-1a hashes + separators), expanded to `numHashes` families via
  * Kirsch-Mitzenmacher `h1 + k·h2` (31-bit masked, same construction
  * as the pipeline formulation), min-folded per family. Documents with
  * fewer words than `shingleSize` hash their single shorter shingle —
  * exactly [[graft.operators.Dedup.shingleRows]]'s behavior. The hash
  * family differs from the pipeline's (xxhash64 of the shingle string):
  * equal shingle sets still give equal signatures, which is the LSH
  * recall contract; verification always recomputes exact Jaccard on
  * the real shingle strings.
  */
object MinHashSig {
  def compute(s: UTF8String, numHashes: Int, shingleSize: Int): ArrayData = {
    if (s == null) return null
    val str = s.toString
    val n = str.length
    // FNV-1a per word (words are single-space separated post-normText;
    // an empty string is one empty word — parity with split(s, " "))
    var nWords = 1
    var i = 0
    while (i < n) { if (str.charAt(i) == ' ') nWords += 1; i += 1 }
    val wh = new Array[Long](nWords)
    var w = 0
    var h = 0xcbf29ce484222325L
    i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c == ' ') { wh(w) = h; w += 1; h = 0xcbf29ce484222325L }
      else { h ^= c; h *= 0x100000001b3L }
      i += 1
    }
    wh(w) = h

    val nShingles = math.max(nWords - shingleSize + 1, 1)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var s0 = 0
    while (s0 < nShingles) {
      var sh = 0xcbf29ce484222325L
      var j = s0
      val end = math.min(s0 + shingleSize, nWords)
      while (j < end) {
        val v = wh(j)
        var b = 0
        while (b < 8) { sh ^= (v >>> (8 * b)) & 0xffL; sh *= 0x100000001b3L; b += 1 }
        sh ^= 0x20L; sh *= 0x100000001b3L
        j += 1
      }
      val h1 = sh & 0x7fffffffL
      var z = sh
      z ^= z >>> 33; z *= 0xff51afd7ed558ccdL; z ^= z >>> 33
      val h2 = z & 0x7fffffffL
      var k = 0
      while (k < numHashes) {
        val g = h1 + k.toLong * h2
        if (g < sig(k)) sig(k) = g
        k += 1
      }
      s0 += 1
    }
    new GenericArrayData(sig)
  }
}

case class MinHashSigExpr(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs STRING, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], numHashes, shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig.compute($c, $numHashes, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSigExpr {
  import org.apache.spark.sql.graft.ColumnBridge

  def minhashSig(c: Column, numHashes: Int, shingleSize: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(c), numHashes, shingleSize))
}
