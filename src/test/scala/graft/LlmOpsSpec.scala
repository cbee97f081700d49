package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Extension operators (SURVEY §2.11): dedup, similarity, text. */
class LlmOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("exact dedup keeps one canonical row per duplicated text") {
    val dup = docs.select("doc_id", "text")
      .unionByName(docs.select(($"doc_id" + 1000000).as("doc_id"), $"text"))
    val kept = Dedup.dropExactDuplicates(dup, "text", "doc_id")
    assert(kept.count() == docs.count())       // one survivor per text
    assert(kept.where($"doc_id" >= 1000000).count() == 0) // min id wins
    val groups = Dedup.exactGroups(dup, "text", "doc_id")
    assert(groups.where($"n_dups" =!= 2).count() == 0)
  }

  test("minhash LSH finds planted near-duplicates") {
    val planted = docs.where($"doc_id" % 50 === 0)
      .withColumn("doc_id", $"doc_id" + 1000000L)
    val corpus = docs.select("doc_id", "text")
      .unionByName(planted.select("doc_id", "text"))
    val pairs = Dedup.minhashNearDuplicates(corpus, "text", "doc_id", 0.9)
      .where($"id_b" - $"id_a" === 1000000L).collect()
    val expected = docs.where($"doc_id" % 50 === 0).count()
    assert(pairs.length == expected, s"found ${pairs.length}, want $expected")
    assert(pairs.forall(_.getAs[Double]("jaccard") == 1.0))
  }

  test("simhash of identical docs is identical; hamming is 0") {
    val sig = docs.limit(20).select($"doc_id",
      Dedup.simhash64($"text").as("s1"),
      Dedup.simhash64(concat($"text", lit(""))).as("s2"))
    assert(sig.where(Dedup.hamming64($"s1", $"s2") =!= 0).count() == 0)
  }

  test("brute-force top-k: self is rank 1 with score 1") {
    val queries = emb.where($"vec_id" % 200 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val top = Similarity.bruteForceTopK(emb, queries, 5)
    val self = top.where($"rank" === 1)
    assert(self.where($"q_id" =!= $"vec_id").count() == 0)
    assert(self.where(abs($"score" - 1.0) > 1e-9).count() == 0)
  }

  test("IVF top-k achieves reasonable recall vs brute force") {
    val queries = emb.where($"vec_id" % 200 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, queries, 5, nCells = 8, nProbe = 4,
      kmeansIters = 1)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall") // nProbe=half the cells
  }

  test("language id classifies planted stopword-bearing texts") {
    // (the synthetic corpus is English-ish word soup for every lang
    // label, so plant real samples)
    val samples = Seq(
      ("the cat sat on the mat and the dog is in a house", "en"),
      ("el perro y la casa de un hombre que es grande", "es"),
      ("le chat est dans la maison et un chien", "fr"),
      ("der hund und die katze ist ein tier zu haus", "de"),
      ("我 有 一 个 梦想 和 不 同 的 是 在 了", "zh"),
      ("xyzzy plugh quux", "und")).toDF("text", "want")
    val got = samples.select($"want", TextAnalysis.languageId($"text").as("pred"))
    assert(got.where($"want" =!= $"pred").count() == 0)
  }

  test("text stats are sane") {
    val st = TextAnalysis.analyze(docs.limit(50), "text")
    assert(st.where($"n_words" <= 0).count() == 0)
    assert(st.where($"quality" < 0 || $"quality" > 1).count() == 0)
    assert(st.where(length($"fingerprint") =!= 32).count() == 0)
    assert(st.where($"approx_tokens" < $"n_words").count() == 0)
  }
}
