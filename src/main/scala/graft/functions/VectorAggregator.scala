package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise tensor aggregation as a typed `Aggregator` (SURVEY.md
  * §2.10: the one aggregation whose naive formulation —
  * `collect_list` + array fold — holds the whole window in memory).
  * Buffer state is O(dim) regardless of window row count, and Spark
  * runs it partial/final like any aggregate, so map-side combine
  * applies.
  *
  * Inputs must share one length; a mismatched row fails fast rather
  * than silently truncating.
  */
class VectorAggregator(op: String) extends Aggregator[Seq[Double], VectorAggregator.Buf, Seq[Double]] {
  import VectorAggregator.Buf

  override def zero: Buf = Buf(null, 0L)

  private def combine(acc: Array[Double], v: Array[Double]): Array[Double] = {
    require(acc.length == v.length,
      s"elementwise agg over mismatched lengths: ${acc.length} vs ${v.length}")
    var i = 0
    while (i < acc.length) {
      acc(i) = op match {
        case "min" => math.min(acc(i), v(i))
        case "max" => math.max(acc(i), v(i))
        case _ => acc(i) + v(i)
      }
      i += 1
    }
    acc
  }

  override def reduce(b: Buf, in: Seq[Double]): Buf =
    if (in == null) b
    else {
      val arr = in.toArray
      if (b.vec == null) Buf(arr.clone(), 1L)
      else { b.vec = combine(b.vec, arr); b.n += 1; b }
    }

  override def merge(a: Buf, b: Buf): Buf =
    if (a.vec == null) b
    else if (b.vec == null) a
    else { a.vec = combine(a.vec, b.vec); a.n += b.n; a }

  override def finish(b: Buf): Seq[Double] =
    if (b.vec == null) null
    else if (op == "avg") b.vec.map(_ / b.n).toSeq
    else b.vec.toSeq

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VectorAggregator {
  case class Buf(var vec: Array[Double], var n: Long)

  /** avg buffers sum+count; min/max/sum fold directly. */
  private def make(op: String) = udaf(new VectorAggregator(op))

  private lazy val fns = Map(
    "sum" -> make("sum"), "avg" -> make("avg"),
    "min" -> make("min"), "max" -> make("max"))

  /** Aggregate Column over an `array<double>` input column. */
  def apply(op: String, input: Column): Column = fns(op)(input)
}

/** Element-wise LONG sum over integer vectors — the EXACT counterpart
  * of [[VectorAggregator]]'s float sum: integer addition is
  * associative/commutative, so the result is independent of partial-
  * aggregation order (float vector sums are not — the documented
  * cross-engine hazard). The exactness is what makes distributed
  * centroids over int8-quantized embeddings hash-gateable. Buffer is
  * O(dim); map-side combine applies.
  */
class LongVectorSumAggregator
    extends Aggregator[Seq[Long], LongVectorSumAggregator.Buf, Seq[Long]] {
  import LongVectorSumAggregator.Buf

  override def zero: Buf = Buf(null)

  private def add(acc: Array[Long], v: Array[Long]): Array[Long] = {
    require(acc.length == v.length,
      s"elementwise sum over mismatched lengths: ${acc.length} vs ${v.length}")
    var i = 0
    while (i < acc.length) { acc(i) += v(i); i += 1 }
    acc
  }

  override def reduce(b: Buf, in: Seq[Long]): Buf =
    if (in == null) b
    else if (b.vec == null) Buf(in.toArray)
    else { b.vec = add(b.vec, in.toArray); b }

  override def merge(a: Buf, b: Buf): Buf =
    if (a.vec == null) b
    else if (b.vec == null) a
    else { a.vec = add(a.vec, b.vec); a }

  override def finish(b: Buf): Seq[Long] =
    if (b.vec == null) null else b.vec.toSeq

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object LongVectorSumAggregator {
  case class Buf(var vec: Array[Long])

  private lazy val fn = udaf(new LongVectorSumAggregator())

  /** Aggregate Column over an `array<bigint>` input column. */
  def longVecSum(input: Column): Column = fn(input)
}
