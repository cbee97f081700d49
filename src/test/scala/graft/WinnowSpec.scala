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

  test("an over-cap boilerplate fingerprint is dropped whole; in-cap chunks still pair") {
    val boiler = wordsOf("boiler", 12)
    // 12 docs of IDENTICAL boilerplate text: every fingerprint bucket
    // holds all 12 members (over the cap of 5) → no pair-level signal,
    // each bucket is dropped WHOLE — a kept lowest-5-ids subset would
    // instead emit a biased C(5,2) pair subset. Plus 2 docs sharing a
    // genuine 12-word quote (bucket of 2 ≤ cap) that must still pair.
    val df = ((1L to 12L).map(i => (i, boiler)) ++
      Seq((100L, wordsOf("quote", 12)),
        (101L, wordsOf("quote", 12) + " " + wordsOf("tail", 6))))
      .toDF("doc_id", "text")
    spark.conf.set("spark.graft.lsh.maxBucket", "5")
    try {
      val pairs = TextAnalysis.sharedChunkPairs(df, "text", "doc_id", K, W)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(!pairs.exists { case (a, b) => a <= 12L && b <= 12L },
        s"boilerplate-only pairs must be dropped with their bucket, got $pairs")
      assert(pairs.contains((100L, 101L)),
        s"in-cap shared quote must still pair, got $pairs")
    } finally spark.conf.unset("spark.graft.lsh.maxBucket")
  }

  test("contaminatedWith flags exactly the docs quoting the reference set") {
    val quote = wordsOf("eval", 10)
    val corpus = Seq(
      (1L, wordsOf("alpha", 20) + " " + quote + " " + wordsOf("beta", 15)),
      (2L, wordsOf("clean", 40)),
      (3L, quote), // verbatim leak
      (4L, wordsOf("gamma", 30))).toDF("doc_id", "text")
    val reference = Seq((100L, quote)).toDF("ref_id", "text")
    val flagged = TextAnalysis.contaminatedWith(
      corpus, "text", "doc_id", reference, "text", "ref_id", K, W)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged == Set(1L, 3L),
      s"docs embedding the eval quote must be flagged, got $flagged")
  }

  test("decontaminationStats: fraction is exact at the extremes, monotone between") {
    val quote = wordsOf("eval", 10)
    val corpus = Seq(
      (1L, quote), // full copy → frac exactly 1.0
      (2L, wordsOf("clean", 40)), // disjoint → frac exactly 0.0
      (3L, wordsOf("alpha", 30) + " " + quote), // partial → strictly between
      (4L, wordsOf("beta", 5) + " " + quote)) // mostly quote → higher frac
      .toDF("doc_id", "text")
    val reference = Seq((100L, quote)).toDF("ref_id", "text")
    val stats = TextAnalysis.decontaminationStats(
      corpus, "text", "doc_id", reference, "text", "ref_id", K, W)
      .select("doc_id", "n_fps", "n_shared", "contamination_frac", "contaminated")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(stats.size == 4, "every corpus document gets a row")
    assert(stats(1L)._4 == 1.0 && stats(1L)._2 == stats(1L)._3,
      s"full copy shares every fingerprint: ${stats(1L)}")
    assert(stats(2L)._4 == 0.0 && !stats(2L)._5, s"clean doc: ${stats(2L)}")
    assert(stats(3L)._4 > 0.0 && stats(3L)._4 < 1.0 && stats(3L)._5,
      s"partial quote strictly between: ${stats(3L)}")
    assert(stats(4L)._4 > stats(3L)._4,
      s"more quote, higher fraction: ${stats(4L)._4} vs ${stats(3L)._4}")
  }

  test("zero-fingerprint doc: stats row with n_fps=0, Flag emits false, not null") {
    import TextAnalysis.DecontaminateAction
    val quote = wordsOf("eval", 10)
    val corpus = Seq(
      (1L, quote),
      // null text → posexplode emits no tokens → zero fingerprints
      // (short non-null text still emits one truncated gram by design)
      (2L, null.asInstanceOf[String]),
      (3L, wordsOf("clean", 40))).toDF("doc_id", "text")
    val reference = Seq((100L, quote)).toDF("ref_id", "text")
    val stats = TextAnalysis.decontaminationStats(
      corpus, "text", "doc_id", reference, "text", "ref_id", K, W)
      .select("doc_id", "n_fps", "n_shared", "contamination_frac", "contaminated")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(stats.size == 3, s"zero-fp doc must still get a row: $stats")
    assert(stats(2L) == ((2L, 0L, 0L, 0.0, false)),
      s"zero-fp doc is (0, 0, 0.0, false): ${stats(2L)}")
    val flagged = TextAnalysis.decontaminate(corpus, "text", "doc_id",
      reference, "text", "ref_id", K, W, DecontaminateAction.Flag)
    val row = flagged.where($"doc_id" === 2L)
      .select("contaminated", "contamination_frac").head
    assert(!row.isNullAt(0) && !row.getBoolean(0),
      "Flag mode must emit contaminated = false for a zero-fp doc, not null")
    assert(!row.isNullAt(1) && row.getDouble(1) == 0.0)
  }

  test("decontaminate: Drop removes exactly the contaminated docs; Flag keeps all") {
    import TextAnalysis.DecontaminateAction
    val quote = wordsOf("eval", 10)
    val corpus = Seq(
      (1L, quote),
      (2L, wordsOf("clean", 40)),
      (3L, wordsOf("alpha", 30) + " " + quote)).toDF("doc_id", "text")
    val reference = Seq((100L, quote)).toDF("ref_id", "text")
    val survivors = TextAnalysis.decontaminate(corpus, "text", "doc_id",
      reference, "text", "ref_id", K, W, DecontaminateAction.Drop)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(2L), s"only the clean doc survives, got $survivors")
    val flagged = TextAnalysis.decontaminate(corpus, "text", "doc_id",
      reference, "text", "ref_id", K, W, DecontaminateAction.Flag)
    assert(flagged.count() == 3, "Flag keeps every row")
    assert(flagged.columns.contains("contamination_frac"))
    // a loose threshold spares the partially-contaminated doc
    val loose = TextAnalysis.decontaminate(corpus, "text", "doc_id",
      reference, "text", "ref_id", K, W, DecontaminateAction.Drop,
      maxSharedFraction = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(loose == Set(2L, 3L),
      s"threshold 0.9 keeps the partial quote, got $loose")
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
