package graft

import graft.operators.{ProductQuant, Similarity}

import org.apache.spark.sql.functions._

class ProductQuantSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries = emb.where(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  test("codebooks are deterministic across partitionings; codes in range") {
    val cb1 = ProductQuant.trainCodebooks(emb, m = 8, kCodes = 16, iters = 2)
    val cb2 = ProductQuant.trainCodebooks(emb.repartition(7), m = 8, kCodes = 16,
      iters = 2)
    assert(cb1.length == 8 && cb1.forall(_.length == 16))
    assert(cb1.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq,
      "training must not depend on partitioning")

    val codes = ProductQuant.encode(emb, cb1)
    assert(codes.count() == emb.count())
    val bad = codes.where(exists(col("codes"),
      c => c < 0 || c >= 16)).count()
    assert(bad == 0)
  }

  test("pqTopK with rescore reaches recall@10 >= 0.7 vs brute force on every query") {
    val k = 10
    val approx = ProductQuant.pqTopK(emb, queries, k,
      m = 8, kCodes = 16, rescoreFactor = 10, iters = 5)
    val exact = Similarity.bruteForceTopK(emb, queries, k)
    val hits = approx.select("q_id", "vec_id")
      .join(exact.select("q_id", "vec_id"), Seq("q_id", "vec_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
    val nq = queries.count()
    assert(hits.count() == nq, "every query must emit hits")
    val worst = hits.agg(min("n_hits")).as[Long].head()
    assert(worst >= 7, s"worst-query recall@10 = ${worst / 10.0}")
  }
}
