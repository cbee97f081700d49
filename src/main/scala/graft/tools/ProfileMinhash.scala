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
    spark.stop()
  }
}
