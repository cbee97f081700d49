package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.concurrent.TrieMap

/** Bloom filter over 64-bit fingerprints — the semi-join REDUCTION for
  * joins whose build side outgrew broadcast: instead of shuffling every
  * probe-side row to meet the reference, broadcast a numBits-bit
  * summary of the reference (collected once — megabytes for millions
  * of keys) and shuffle only the probe rows that PASS it: true matches
  * plus an ε false-positive residue. No false negatives, so an EXACT
  * join downstream sees every real match — the filter changes the
  * plan, never the answer. This is the reduction Spark's own runtime
  * bloom-filter join performs for equi-joins; building it explicitly
  * lets the semi-join-shaped decontamination operators use it where
  * the optimizer's version does not apply.
  *
  * Kirsch–Mitzenmacher double hashing over two splitmix64 mixes:
  * `bit_i = (g1 + i·g2) mod numBits` — deterministic, engine-internal
  * (results are prefilter-only, so no cross-engine contract).
  */
object BloomFilter {

  /** splitmix64 finalizer — the repo-standard cheap 64-bit mix. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Power-of-two bit count targeting ~16 bits/key (FP ≈ 0.24 % at
    * k=4), clamped to [2^13, 2^27] (1 KiB – 16 MiB of bits).
    */
  def sizeFor(nKeys: Long): Int = {
    var bits = 1L << 13
    while (bits < nKeys * 16 && bits < (1L << 27)) bits <<= 1
    bits.toInt
  }

  private def setBits(bits: Array[Long], numHashes: Int, fp: Long): Unit = {
    val mask = bits.length * 64 - 1 // power-of-two bit count
    val g1 = mix64(fp)
    val g2 = mix64(fp ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < numHashes) {
      val b = ((g1 + i * g2) & Long.MaxValue) & mask
      bits((b >>> 6).toInt) |= 1L << (b & 63)
      i += 1
    }
  }

  /** Membership test — false positives possible, false negatives not. */
  def contains(bits: Array[Long], numHashes: Int, fp: Long): Boolean = {
    val mask = bits.length * 64 - 1
    val g1 = mix64(fp)
    val g2 = mix64(fp ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < numHashes) {
      val b = ((g1 + i * g2) & Long.MaxValue) & mask
      if ((bits((b >>> 6).toInt) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Mergeable build state: word arrays OR together — map-side
    * combinable, one `numBits/8`-byte row reaches the driver.
    */
  class BloomAgg(numBits: Int, numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64: $numBits")

    override def zero: Array[Long] = new Array[Long](numBits >>> 6)
    override def reduce(buf: Array[Long], fp: Long): Array[Long] = {
      setBits(buf, numHashes, fp); buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  private val fns =
    TrieMap.empty[(Int, Int), org.apache.spark.sql.expressions.UserDefinedFunction]

  /** Aggregate Column: long fingerprints → the filter's word array. */
  def agg(numBits: Int, numHashes: Int)(fp: Column): Column = {
    implicit val inEnc: Encoder[Long] = Encoders.scalaLong
    fns.getOrElseUpdate((numBits, numHashes),
      udaf(new BloomAgg(numBits, numHashes)))(fp)
  }
}
