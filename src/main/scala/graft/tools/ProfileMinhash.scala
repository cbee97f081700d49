package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling of the minhash pipeline stages. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val planted = docs.where(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val corpus = docs.unionByName(planted)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }
    time("shingles count")(corpus.select(explode(Dedup.shingles(col("text"), 5))).count())
    time("signatures")(Dedup.minhashSignatures(corpus, "text", "doc_id").count())
    time("bands")(Dedup.lshBands(corpus, "text", "doc_id").count())
    val b = Dedup.lshBands(corpus, "text", "doc_id").persist()
    time("bands persisted")(b.count())
    val l = b.select(col("band_id"), col("band_hash"), col("doc_id").as("id_a"))
    val r = b.select(col("band_id"), col("band_hash"), col("doc_id").as("id_b"))
    val cands = l.join(r, Seq("band_id", "band_hash"))
      .where(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    time("candidates")(println("cands=" + cands.count()))
    time("full nearDuplicates")(
      println("pairs=" + Dedup.minhashNearDuplicates(corpus, "text", "doc_id", 0.8).count()))
    spark.sharedState.cacheManager.clearCache()
    time("full nearDuplicates warm")(
      println("pairs=" + Dedup.minhashNearDuplicates(corpus, "text", "doc_id", 0.8).count()))
    spark.sharedState.cacheManager.clearCache()
    val shRows = Dedup.shingleRows(corpus.repartition(col("doc_id")), "text", "doc_id", 5).persist()
    time("cold shRows")(shRows.count())
    val sig = Dedup.minhashSignaturesFromRows(shRows, "doc_id", 128)
    time("cold sig")(sig.count())
    val b2 = Dedup.lshBandsFromSig(sig, "doc_id", 128, 16).persist()
    time("cold bands")(b2.count())
    val l2 = b2.select(col("band_id"), col("band_hash"), col("doc_id").as("id_a"))
    val r2 = b2.select(col("band_id"), col("band_hash"), col("doc_id").as("id_b"))
    val c2 = l2.join(r2, Seq("band_id", "band_hash"))
      .where(col("id_a") < col("id_b")).select("id_a", "id_b").distinct().persist()
    time("cold cands")(c2.count())
    val candIds = c2.select(col("id_a").as("doc_id"))
      .unionByName(c2.select(col("id_b").as("doc_id"))).distinct()
    val sh2 = shRows.join(candIds, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_set(col("__s")).as("sh"))
    val verif = c2
      .join(sh2.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh2.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= 0.8)
    time("cold verify")(verif.count())
    spark.stop()
  }
}
