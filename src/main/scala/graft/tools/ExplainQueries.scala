package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans + exchange/broadcast stats for the
  * contract queries — the scale-audit loop (SURVEY.md §4).
  */
object ExplainQueries {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val only = args.toSet
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.executedPlan.toString
          val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
          val bcasts = "BroadcastExchange".r.findAllIn(plan).size
          val wsc = "WholeStageCodegen".r.findAllIn(plan).size
          println(s"== $name: exchanges=$exchanges broadcasts=$bcasts codegenSpans=$wsc")
          if (only.nonEmpty) println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        } catch { case e: Throwable => println(s"== $name FAILED: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
