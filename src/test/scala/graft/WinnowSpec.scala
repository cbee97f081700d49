package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (MOSS) — detection guarantee, specificity,
  * and hot-fingerprint cap composition.
  */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  // k=5, w=4 → guarantee threshold w+k-1 = 8 shared words
  private val K = 5
  private val W = 4

  private def wordsOf(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("mid-document shared run >= w+k-1 words guarantees a shared fingerprint") {
    val chunk = wordsOf("shared", 8)
    val doc1 = wordsOf("alpha", 20) + " " + chunk + " " + wordsOf("beta", 20)
    val doc2 = wordsOf("gamma", 7) + " " + chunk + " " + wordsOf("delta", 31)
    val df = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val pairs = TextAnalysis.sharedChunkPairs(df, "text", "doc_id", K, W).collect()
    assert(pairs.length == 1 && pairs.head.getLong(0) == 1L &&
      pairs.head.getLong(1) == 2L,
      s"planted 8-word chunk at different offsets must be detected, got ${pairs.toSeq}")
  }

  test("documents with disjoint vocabularies share no fingerprint") {
    val df = Seq((1L, wordsOf("aa", 50)), (2L, wordsOf("bb", 50)))
      .toDF("doc_id", "text")
    assert(TextAnalysis.sharedChunkPairs(df, "text", "doc_id", K, W).isEmpty)
  }

  test("fingerprint density is ~1/w of the k-gram count") {
    val df = Seq((1L, wordsOf("tok", 400))).toDF("doc_id", "text")
    val nGrams = 400 - K + 1
    val fps = TextAnalysis.winnowFingerprints(df, "text", "doc_id", K, W).count()
    // winnowing selects between nGrams/w (one per disjoint window) and
    // nGrams fingerprints; random hashes land near 2*nGrams/(w+1)
    assert(fps >= nGrams / W && fps < nGrams,
      s"density off: $fps selected of $nGrams k-grams (w=$W)")
  }

  test("a boilerplate fingerprint shared by many docs is capped, not quadratic") {
    val boiler = wordsOf("boiler", 8)
    // 12 docs all embedding the same 8-word boilerplate run
    val df = (1L to 12L).map(i => (i, wordsOf(s"u$i", 10) + " " + boiler))
      .toDF("doc_id", "text")
    spark.conf.set("spark.graft.lsh.maxBucket", "5")
    try {
      val pairs = TextAnalysis.sharedChunkPairs(df, "text", "doc_id", K, W)
      // each fp bucket keeps its 5 smallest ids → at most C(5,2) pairs
      // per fingerprint; without the cap the boilerplate alone emits
      // C(12,2) = 66 pairs per shared fingerprint
      val perFpMax = 5 * 4 / 2
      val distinctPairs = pairs.count()
      assert(distinctPairs <= perFpMax * 2, // boilerplate spans 2 windows' minima at most here
        s"cap not engaged: $distinctPairs pairs")
      assert(distinctPairs > 0, "capped buckets must still emit in-cap pairs")
    } finally spark.conf.unset("spark.graft.lsh.maxBucket")
  }

  test("q_text_winnow recall: every planted prefix quote is found (sf0.001)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val planted = docs.where($"doc_id" % 20 === 0)
      .withColumn("doc_id", $"doc_id" + 1000000L)
      .withColumn("text", concat_ws(" ",
        slice(split(Dedup.normText($"text"), " "), 1, 10)))
    val found = TextAnalysis.sharedChunkPairs(
      docs.unionByName(planted), "text", "doc_id", K, W)
      .where($"id_b" - $"id_a" === 1000000L)
    assert(found.count() == docs.where($"doc_id" % 20 === 0).count())
  }
}
