package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: run named `SparkEntry.queries` entries standalone
  * (fresh JVM per invocation — the reference discipline for timing).
  * Usage: runMain graft.tools.RunQuery <sfDir> <query> [query...]
  * Pass `--show` to print the first rows of each result.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val show = args.contains("--show")
    val rest = args.filterNot(_ == "--show")
    val dir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (rest.length > 1) rest.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- names) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, dir)
      // full materialization — a bare count() lets the optimizer drop
      // the row-preserving PIT joins (see Bench.scala)
      val n = df.queryExecution.toRdd.count()
      println(f"$q%-26s rows=$n%-7d ${(System.nanoTime() - t0) / 1e9}%.2fs")
      if (show) df.show(10, truncate = false)
    }
    spark.stop()
  }
}
