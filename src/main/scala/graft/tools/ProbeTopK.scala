package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B probe for the r15-verdict TopKAggregator question: is the
  * ObjectHashAggregate top-k (bounded map-side buffers, no codegen)
  * worth replacing with the window row_number formulation (whole-stage
  * codegen'd, but sorts every candidate per query and ships them all)?
  *
  * Candidates are synthetic (nQ queries × nPerQ docs of rounded
  * scores — the rankPostings tail's input shape after its groupBy);
  * both formulations produce identical rows by construction
  * ((score desc, id asc), scores pre-rounded), asserted per run.
  *
  * Usage: runMain graft.tools.ProbeTopK [nQ] [nPerQ] [k]
  */
object ProbeTopK {
  def main(args: Array[String]): Unit = {
    val nQ = args.headOption.map(_.toInt).getOrElse(100)
    val nPerQ = args.drop(1).headOption.map(_.toInt).getOrElse(5000)
    val k = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic scores on the 1e-5 grid (the rankPostings round),
    // with planted ties so the id tiebreak is exercised
    val cands = spark.range(nQ.toLong * nPerQ).select(
      (col("id") % nQ).as("q_id"),
      col("id").as("doc_id"),
      (round(pmod(xxhash64(col("id")), lit(100000)) / lit(100000.0), 5))
        .as("score"))
      .persist()
    cands.count()

    def viaAgg(df: DataFrame): DataFrame = df
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKAggregator(k)(col("score"), col("doc_id")).as("__top"))
      .select(col("q_id"), posexplode(col("__top")).as(Seq("__pos", "__hit")))
      .select(col("q_id"), col("__hit").getField("_2").as("doc_id"),
        (col("__pos") + 1).as("rank"), col("__hit").getField("_1").as("score"))

    def viaWindow(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("doc_id").asc)
      df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
        .select(col("q_id"), col("doc_id"), col("rank"), col("score"))
    }

    def time(tag: String, df: => DataFrame): Unit = {
      // warm + 3 timed
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[topk] $tag%-8s nQ=$nQ nPerQ=$nPerQ k=$k median=${ts(1)}%.3fs runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val a = viaAgg(cands).orderBy("q_id", "rank").collect()
    val b = viaWindow(cands).orderBy("q_id", "rank").collect()
    require(a.sameElements(b), "formulations disagree — tiebreak drift")
    println(s"[topk] outputs identical: ${a.length} rows")

    time("agg", viaAgg(cands))
    time("window", viaWindow(cands))
    spark.stop()
  }
}
