package graft

import graft.functions.BloomFilter
import graft.operators.TextAnalysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkTestBase {
  import spark.implicits._

  test("no false negatives; false-positive rate near design point") {
    val n = 20000
    val inserted = (0 until n).map(i => BloomFilter.mix64(i.toLong * 7919))
    val numBits = BloomFilter.sizeFor(n)
    val bits = inserted.toDF("fp")
      .agg(BloomFilter.agg(numBits, 4)(col("fp")))
      .head().getSeq[Long](0).toArray

    assert(inserted.forall(BloomFilter.contains(bits, 4, _)),
      "a Bloom filter must never miss an inserted key")

    val absent = (0 until n).map(i => BloomFilter.mix64(0xdeadL - i * 104729))
      .filterNot(inserted.toSet)
    val fp = absent.count(BloomFilter.contains(bits, 4, _)).toDouble / absent.size
    assert(fp < 0.02, s"false-positive rate $fp (16 bits/key, k=4 → ~0.24%)")
  }

  test("aggregation is partition-invariant (OR-merge)") {
    val fps = (1L to 5000L).map(_ * 0x9e37L)
    val bitsOf = (parts: Int) => fps.toDF("fp").repartition(parts)
      .agg(BloomFilter.agg(1 << 16, 4)(col("fp")))
      .head().getSeq[Long](0)
    assert(bitsOf(1) == bitsOf(7))
  }

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  test("oversize-reference bloom path returns exactly the broadcast path's answer") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    // reference: 25 real corpus docs (true contamination) + noise
    val ref = corpus.where(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 5000).as("doc_id"), col("text"))

    def run(): (DataFrame, DataFrame) = (
      TextAnalysis.contaminatedWith(corpus, "text", "doc_id", ref, "text", "doc_id"),
      TextAnalysis.decontaminationStats(corpus, "text", "doc_id", ref, "text", "doc_id"))

    val key = "spark.graft.dedup.broadcastCandidatesBytes"
    val prev = spark.conf.get(key, (16L << 20).toString)
    val (cwB, dsB) = run() // broadcast path (default limit)
    val (cw, ds) =
      try { spark.conf.set(key, "1"); run() } // force the bloom path
      finally spark.conf.set(key, prev)

    assert(multiset(cw) == multiset(cwB),
      "contaminatedWith must be plan-invariant")
    assert(multiset(ds) == multiset(dsB),
      "decontaminationStats must be plan-invariant")
    assert(cwB.count() > 0, "the planted contamination must be found")
  }
}
