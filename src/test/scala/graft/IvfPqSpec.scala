package graft

import graft.operators.{IvfPqIndex, Similarity, Spill}

import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries = emb.where(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  test("ivfpq: build layout, recall@10 >= 0.8 per query, rebuild-identical") {
    val path = Spill.newPath(spark)
    IvfPqIndex.build(emb, path, nCells = 16, m = 8, kCodes = 16)

    // layout: codes and vector co-partitioned by cell
    val v = spark.read.parquet(s"$path/vectors")
    assert(v.columns.toSet.contains("codes") && v.columns.toSet.contains("cell_id"))
    assert(v.count() == emb.count())

    val k = 10
    val approx = IvfPqIndex.query(spark, path, queries, k,
      nProbe = 12, rescoreFactor = 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k)
    val hits = approx.select("q_id", "vec_id")
      .join(exact.select("q_id", "vec_id"), Seq("q_id", "vec_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
    assert(hits.count() == queries.count())
    // residual encoding (pq_residual_v1) buys the tighter bar at the
    // SAME rescoreFactor — raw-vector codes held >= 0.7 here
    val worst = hits.agg(min("n_hits")).as[Long].head()
    assert(worst >= 8, s"worst recall@10 = ${worst / 10.0}")

    // deterministic rebuild on another partitioning: same codes per id
    val path2 = Spill.newPath(spark)
    IvfPqIndex.build(emb.repartition(7), path2, nCells = 16, m = 8, kCodes = 16)
    val a = spark.read.parquet(s"$path/vectors")
      .select(col("vec_id"), col("cell_id"), col("codes")).as[(Long, Int, Seq[Int])]
      .collect().sortBy(_._1).toSeq
    val b = spark.read.parquet(s"$path2/vectors")
      .select(col("vec_id"), col("cell_id"), col("codes")).as[(Long, Int, Seq[Int])]
      .collect().sortBy(_._1).toSeq
    assert(a == b, "index must be partition-invariant")
  }
}
