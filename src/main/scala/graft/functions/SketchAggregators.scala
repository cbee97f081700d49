package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.concurrent.TrieMap

/** Bounded bottom-k DISTINCT values as a typed Aggregator — the state
  * behind the KMV (k-minimum-values) distinct-count sketch
  * (SURVEY.md §2.11; Bar-Yossef et al. 2002).
  *
  * The exact-distinct formulation (`groupBy(value).count` or
  * `approx_count_distinct`'s HLL) either shuffles every distinct value
  * or produces an engine-private binary sketch no other system can
  * recompute. This aggregator keeps the k smallest distinct hashes in a
  * sorted buffer: O(k) state, map-side combinable (the shuffle carries
  * at most `partitions × k` longs), and the result is a pure function
  * of the input SET — independent of row order and partitioning — so a
  * DuckDB oracle can rebuild it with `ORDER BY hash LIMIT k`.
  */
class BottomKDistinctAgg(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[Long] = Nil

  override def reduce(buf: Seq[Long], in: Long): Seq[Long] =
    if (buf.size >= k && in >= buf.last) buf // also covers in == last (dup)
    else {
      val (lo, hi) = buf.span(_ < in)
      if (hi.headOption.contains(in)) buf // already present
      else (lo ++ (in +: hi)).take(k)
    }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    // merge of two sorted distinct runs, capped at k
    val out = Seq.newBuilder[Long]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && x.head < y.head)) {
        out += x.head; x = x.tail; n += 1
      } else if (x.isEmpty || y.head < x.head) {
        out += y.head; y = y.tail; n += 1
      } else { // equal: emit once
        out += x.head; x = x.tail; y = y.tail; n += 1
      }
    }
    out.result()
  }

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object BottomKDistinctAgg {
  private val fns = TrieMap.empty[Int, org.apache.spark.sql.expressions.UserDefinedFunction]

  /** Aggregate Column: hash longs → sorted `array<long>` of the k
    * smallest distinct values.
    */
  def apply(k: Int)(hash: Column): Column = {
    implicit val inEnc: Encoder[Long] = Encoders.scalaLong
    fns.getOrElseUpdate(k, udaf(new BottomKDistinctAgg(k)))(hash)
  }
}

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) as a typed
  * Aggregator. Input per occurrence is the pre-hashed cell index for
  * each of the `depth` rows (computed by codegen'd SQL md5 — see
  * [[graft.operators.Sketches.cmsCells]] — so a SQL oracle derives the
  * identical cells); state is one `depth × width` counter array.
  *
  * Why this beats exact `groupBy(term).count` at corpus scale: the
  * exact form shuffles every distinct term; this is O(depth·width)
  * fixed state (width 2048 × depth 4 = 64 KB), map-side combinable,
  * mergeable across corpora/days by elementwise ADD, and the final
  * shuffle is a single row. Estimates overcount only (min over depth
  * rows bounds the error by ε·N with ε ≈ e/width).
  */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  require(depth > 0 && width > 0, s"bad CMS shape: $depth x $width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], cells: Seq[Long]): Array[Long] = {
    var i = 0
    val it = cells.iterator
    while (i < depth && it.hasNext) {
      val c = it.next()
      buf(i * width + c.toInt) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinAgg {
  private val fns =
    TrieMap.empty[(Int, Int), org.apache.spark.sql.expressions.UserDefinedFunction]

  /** Aggregate Column: per-occurrence cell-index arrays → the merged
    * `depth × width` counter array (row-major).
    */
  def apply(depth: Int, width: Int)(cells: Column): Column = {
    implicit val inEnc: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    fns.getOrElseUpdate((depth, width), udaf(new CountMinAgg(depth, width)))(cells)
  }
}
