package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump `explain(formatted)` for selected contract queries — the
  * per-round plan audit (pushdown reaching the scan, broadcast vs
  * shuffle joins, whole-stage codegen spans).
  *
  * Usage: runMain graft.tools.PrintPlans [queryName ...]
  */
object PrintPlans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_swa_bucketed", "q_asof_join", "q_scan_project",
        "q_snapshot_join", "q_dedup_minhash", "q_materialize_backfill")
    for (n <- names) {
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
  }
}
