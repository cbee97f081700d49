package graft

import graft.operators.BpeTrainer

import org.apache.spark.sql.functions._

class BpeTrainerSpec extends SparkTestBase {
  import spark.implicits._

  private def segMap(df: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] =
    df.select("term", "syms").as[(String, Seq[String])].collect().toMap

  test("textbook corpus: merge order and final segmentations") {
    // Sennrich's example without the end-of-word marker: es/st tie at
    // 9 resolves lexicographically to (e,s), then est, lo, low
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("term", "freq")
    val bpe = BpeTrainer.train(wf, numMerges = 4)
    assert(bpe.merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(segMap(bpe.segmentation) == Map(
      "low" -> Seq("low"),
      "lower" -> Seq("low", "e", "r"),
      "newest" -> Seq("n", "e", "w", "est"),
      "widest" -> Seq("w", "i", "d", "est")))
  }

  test("merge application is greedy left-to-right (aaa -> [aa, a])") {
    val wf = Seq(("aaa", 3L), ("aaaa", 1L)).toDF("term", "freq")
    val bpe = BpeTrainer.train(wf, numMerges = 1)
    assert(bpe.merges == Seq(("a", "a")))
    assert(segMap(bpe.segmentation) == Map(
      "aaa" -> Seq("aa", "a"), "aaaa" -> Seq("aa", "aa")))
  }

  test("train stops when no pair reaches minCount; segments concat back to the word") {
    val wf = Seq(("ab", 1L), ("cd", 1L)).toDF("term", "freq")
    val bpe = BpeTrainer.train(wf, numMerges = 5, minCount = 2)
    assert(bpe.merges.isEmpty)
    val bad = bpe.segmentation
      .where(concat_ws("", col("syms")) =!= col("term")).count()
    assert(bad == 0)
  }

  test("tokenCounts applies the vocab with character fallback for OOV words") {
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("term", "freq")
    val bpe = BpeTrainer.train(wf, numMerges = 4)
    val docs = Seq((1L, "low lower"), (2L, "oov newest")).toDF("id", "text")
    val got = BpeTrainer.tokenCounts(docs, "text", "id", bpe)
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "low", 2L), (1L, "e", 1L), (1L, "r", 1L),
      (2L, "o", 2L), (2L, "v", 1L), // "oov" falls back to chars
      (2L, "n", 1L), (2L, "e", 1L), (2L, "w", 1L), (2L, "est", 1L)))
  }
}
