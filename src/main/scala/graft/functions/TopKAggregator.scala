package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.concurrent.TrieMap

/** Bounded top-k by (score DESC, id ASC) as a typed Aggregator
  * (SURVEY.md §2.11 similarity search).
  *
  * The Window/`row_number` formulation of per-query top-k shuffles and
  * fully sorts EVERY (corpus × query) score; this aggregator is
  * partial/final (map-side combinable), so the shuffle carries at most
  * `partitions × k` rows per query and nothing is ever globally
  * sorted. The buffer is kept sorted best-first and capped at k — the
  * same deterministic order the Window version produced
  * (`score desc, id asc`), so results are identical row for row.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  /** strict "a ranks before b" under (score desc, id asc) */
  private def before(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && !before(in, buf.last)) buf
    else {
      val (head, tail) = buf.span(before(_, in))
      (head ++ (in +: tail)).take(k)
    }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // merge of two sorted runs, capped at k
    val out = Seq.newBuilder[(Double, Long)]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && before(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {
  private val fns = TrieMap.empty[Int, org.apache.spark.sql.expressions.UserDefinedFunction]

  /** Aggregate Column: (score, id) rows → `array<struct<_1,_2>>` of the
    * k best, sorted (score desc, id asc).
    */
  def apply(k: Int)(score: Column, id: Column): Column = {
    implicit val inEnc: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    fns.getOrElseUpdate(k, udaf(new TopKAggregator(k)))(score, id)
  }
}
