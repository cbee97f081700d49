package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev check: does `df.count()` on a query actually execute the
  * query's joins, or does the optimizer collapse row-preserving
  * left-outer joins under a bare count? Compares the optimized count
  * plan against full materialization (`toRdd.count`) per query.
  * Usage: runMain graft.tools.CountAudit <sfDir> [query...]
  */
object CountAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q_swa_basic", "q_asof_join", "q_snapshot_join")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (q <- names) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val countPlan = df.groupBy().count().queryExecution.optimizedPlan.toString
      val joinsInCount = countPlan.linesIterator.count(_.contains("Join "))
      val joinsInFull = df.queryExecution.optimizedPlan.toString
        .linesIterator.count(_.contains("Join "))
      def t(f: => Long): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val cnt = t(df.count())
      val full = t(graft.SparkEntry.queries(q)(spark, dir)
        .queryExecution.toRdd.count())
      println(f"[audit] $q%-22s joins: full=$joinsInFull count=$joinsInCount " +
        f"time: count()=$cnt%6.2fs toRdd.count=$full%6.2fs")
    }
    spark.stop()
  }
}
