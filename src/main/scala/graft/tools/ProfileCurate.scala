package graft.tools

import graft.SparkEntry
import graft.operators.{IncrementalCuration, Spill}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level job-count/wall profiler for the curation lifecycle —
  * the r13/r14 verdicts' "wall = job count × fixed overhead" finding
  * needs per-phase attribution to know which actions to fuse next.
  * Scratch diagnostics, not part of the library surface.
  */
object ProfileCurate {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("profile-curate").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    case class J(id: Int, t0: Long, var t1: Long, name: String)
    val live = new java.util.concurrent.ConcurrentHashMap[Int, J]
    val done = new java.util.concurrent.ConcurrentLinkedQueue[J]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val n = js.stageInfos.lastOption.map(_.name).getOrElse("?")
          .takeWhile(_ != '+').trim
        live.put(js.jobId, J(js.jobId, System.nanoTime(), 0L, n))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val j = live.remove(je.jobId)
        if (j != null) { j.t1 = System.nanoTime(); done.add(j) }
      }
    })
    def phase[A](name: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime(); done.clear()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[profile] $name%-28s ${dt}%6.2fs  jobs=${jobs.get() - j0}")
      import scala.jdk.CollectionConverters._
      var prevEnd = t0
      done.asScala.toSeq.sortBy(_.t0).foreach { j =>
        val gap = (j.t0 - prevEnd) / 1e9
        val dur = (j.t1 - j.t0) / 1e9
        System.err.println(f"[profile]    gap=${gap}%6.3f dur=${dur}%6.3f  ${j.name}")
        prevEnd = math.max(prevEnd, j.t1)
      }
      r
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    // warm-up: one full lifecycle to absorb JVM/codegen warmup
    locally {
      val root = Spill.newPath(spark) + "/warm"
      IncrementalCuration.bootstrap(docs, SparkEntry.curatePipeline, root)
      IncrementalCuration.refresh(SparkEntry.curateDelta(docs), root, 1L)
        .count()
    }
    // the gate discards the intermediate snapshots (only the final one
    // is collected) — mirror that: no count() on bootstrap/refresh
    val root = Spill.newPath(spark) + "/prof"
    phase("bootstrap") {
      IncrementalCuration.bootstrap(docs, SparkEntry.curatePipeline, root)
    }
    phase("refresh v1") {
      IncrementalCuration.refresh(SparkEntry.curateDelta(docs), root, 1L)
    }
    phase("forget v2") {
      IncrementalCuration.forget(
        docs.where(col("doc_id") % 20 === 2).select("doc_id"), root, 2L)
    }
    phase("refresh v3") {
      IncrementalCuration.refresh(SparkEntry.curateForgetDelta(docs), root, 3L)
    }
    phase("purgeForgotten") {
      IncrementalCuration.purgeForgotten(spark, root)
    }
    phase("snapshot collect") {
      IncrementalCuration.snapshot(spark, root).select("doc_id", "text").count()
    }
    spark.stop()
  }
}
