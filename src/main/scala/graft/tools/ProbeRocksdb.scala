package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for the r15-verdict state-store question: does the
  * RocksDB state store provider move a stateful streaming gate at
  * bench scale, and is it output-identical? Runs one
  * `SparkEntry.queries` gate on fresh sessions — default (HDFS-backed
  * in-memory) provider vs RocksDB — warm run + 2 timed runs each,
  * and asserts identical sorted output.
  *
  * The 100 TB motivation (guide §5): with the default provider every
  * key of every state store lives on the executor HEAP; RocksDB keeps
  * state off-heap/on-disk with bounded block cache, which is the only
  * posture that survives state larger than memory. The probe measures
  * what that costs/saves at local one-micro-batch scale.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.ProbeRocksdb <sfDir> <query>
  */
object ProbeRocksdb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

    def run(provider: Option[String]): (Seq[String], Seq[Double]) = {
      var rows: Seq[String] = null
      val times = (0 to 2).map { i =>
        val sess = spark.newSession()
        provider.foreach(p =>
          sess.conf.set("spark.sql.streaming.stateStore.providerClass", p))
        val t0 = System.nanoTime()
        val df = fn(sess, dir)
        val out = df.collect().map(_.toString).sorted.toSeq
        val sec = (System.nanoTime() - t0) / 1e9
        if (rows == null) rows = out
        else require(rows == out, s"provider=$provider run $i output drifted")
        sec
      }
      (rows, times.drop(1))
    }

    val (defRows, defTimes) = run(None)
    val (rocksRows, rocksTimes) = run(Some(rocks))
    require(defRows == rocksRows,
      s"RocksDB output differs from default provider on $name")
    println(s"[rocksdb] $name outputs identical: ${defRows.size} rows")
    println(f"[rocksdb] $name default warm runs: ${defTimes.map(t => f"$t%.2f").mkString(", ")}s")
    println(f"[rocksdb] $name rocksdb warm runs: ${rocksTimes.map(t => f"$t%.2f").mkString(", ")}s")
    spark.stop()
  }
}
