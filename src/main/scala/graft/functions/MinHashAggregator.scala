package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.concurrent.TrieMap

/** MinHash signature as ONE typed aggregate (SURVEY.md §2.11).
  *
  * The naive formulation — `numHashes` separate `min(h1 + k*h2)`
  * columns — is semantically identical but generates a 128-column
  * aggregate whose codegen/plan-compile cost dominates the whole
  * pipeline at small scale and bloats every partial-agg row. One
  * aggregator keeps the Kirsch-Mitzenmacher family fold
  * (`min over h1 + k*h2`) in a single O(numHashes) buffer that Spark
  * still runs partial/final, so map-side combine applies unchanged.
  *
  * Input rows are the per-(doc, shingle) 31-bit hash pairs; `h1 + k*h2`
  * stays well inside a Long for k < 2^32.
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[(Long, Long), Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty[Long]

  override def reduce(b: Array[Long], in: (Long, Long)): Array[Long] = {
    val acc = if (b.length == numHashes) b
      else Array.fill(numHashes)(Long.MaxValue)
    val (h1, h2) = in
    var k = 0
    while (k < numHashes) {
      val v = h1 + k * h2
      if (v < acc(k)) acc(k) = v
      k += 1
    }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.length != numHashes) b
    else if (b.length != numHashes) a
    else {
      var k = 0
      while (k < numHashes) { if (b(k) < a(k)) a(k) = b(k); k += 1 }
      a
    }

  override def finish(b: Array[Long]): Seq[Long] =
    if (b.length != numHashes) null else b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashAggregator {
  private val fns = TrieMap.empty[Int, org.apache.spark.sql.expressions.UserDefinedFunction]

  /** Aggregate Column: (h1, h2) pairs → `array<bigint>` signature. */
  def apply(numHashes: Int)(h1: Column, h2: Column): Column = {
    implicit val inEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    fns.getOrElseUpdate(numHashes, udaf(new MinHashAggregator(numHashes)))(h1, h2)
  }
}
