package graft

import graft.operators._
import graft.streaming.StreamingCuration

import org.apache.spark.sql.DataFrame

class StreamingCurationSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(id: Long, seed: String): (Long, String) =
    id -> (s"the quick $seed document is " +
      (1 to 50).map(i => s"w$seed$i").mkString(" "))

  private def corpus(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val pipeline = CurationPipeline("text", "doc_id", Seq(
    CurationStage.Quality(50, 100000, 2),
    CurationStage.NearDupDrop(0.9, ordered = true)))

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  test("micro-batches curate in order; later batches dedup against earlier admissions") {
    val root = Spill.newPath(spark) + "/state"
    IncrementalCuration.bootstrap(corpus(doc(1, "alpha")), pipeline, root)

    // two single-file batches with id-monotone content and explicit
    // modification times so the file source delivers them in order
    val deltaDir = new java.io.File(Spill.newPath(spark) + "/delta")
    deltaDir.mkdirs()
    def writeBatch(name: String, mtime: Long, rows: (Long, String)*): Unit = {
      val tmp = Spill.newPath(spark)
      corpus(rows: _*).coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(deltaDir, name)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 60000
    writeBatch("b0.parquet", t0,
      doc(10, "alpha"), // dup of bootstrap doc 1 -> dropped
      doc(11, "beta")) // admitted
    writeBatch("b1.parquet", t0 + 10000,
      doc(20, "beta"), // dup of batch-0's ADMITTED doc 11 -> dropped
      doc(21, "gamma")) // admitted

    val stream = spark.readStream
      .schema(corpus(doc(0, "x")).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(deltaDir.getAbsolutePath)
    StreamingCuration.run(stream, root)

    assert(ids(IncrementalCuration.snapshot(spark, root)) == Set(1L, 11L, 21L))
    // versions: bootstrap 0, one per batch — and history replays
    assert(MergeLog.versions(spark, s"$root/log").sorted == Seq(0L, 1L, 2L))
    assert(ids(MergeLog.snapshotAsOf(spark, s"$root/log", Seq("doc_id"), 1L))
      == Set(1L, 11L))
  }

  test("a purge between checkpointed runs does not wedge the resumed stream") {
    // the literal r12 failure scenario: the stream's versions derive
    // from batchIds, the purge's compaction consumes the next
    // sequential log slot, and before the version offset the resumed
    // stream tripped the fold-slot guard forever
    val root = Spill.newPath(spark) + "/ckstate"
    IncrementalCuration.bootstrap(corpus(doc(1, "alpha")), pipeline, root)
    val deltaDir = new java.io.File(Spill.newPath(spark) + "/ckdelta")
    deltaDir.mkdirs()
    def writeBatch(name: String, mtime: Long, rows: (Long, String)*): Unit = {
      val tmp = Spill.newPath(spark)
      corpus(rows: _*).coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(deltaDir, name)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val ckpt = Spill.newPath(spark) + "/ckpt"
    def runStream(): Unit = {
      val stream = spark.readStream
        .schema(corpus(doc(0, "x")).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(deltaDir.getAbsolutePath)
      StreamingCuration.run(stream, root, checkpointLocation = Some(ckpt))
    }
    val t0 = System.currentTimeMillis() - 60000
    writeBatch("b0.parquet", t0, doc(10, "beta"))
    runStream() // batch 0 -> version 1

    // maintenance window at a committed checkpoint: forget + purge
    // (the forget takes the NEXT sequential slot after the stream's)
    IncrementalCuration.forget(spark, Seq(1L), root, version = 2L)
    IncrementalCuration.purgeForgotten(spark, root)

    // resume the SAME checkpoint with a new batch: twin of forgotten
    // doc 1 must now admit; twin of admitted doc 10 must still drop
    writeBatch("b1.parquet", t0 + 10000, doc(20, "alpha"), doc(21, "beta"))
    runStream() // batch 1 -> version 2, resolved past the fold
    assert(ids(IncrementalCuration.snapshot(spark, root)) == Set(10L, 20L))
  }

  test("single-batch streamed curation equals the direct refresh") {
    val base = corpus(doc(1, "alpha"), doc(2, "beta"))
    val delta = corpus(doc(10, "alpha"), doc(11, "gamma"))

    val rootA = Spill.newPath(spark) + "/stateA"
    IncrementalCuration.bootstrap(base, pipeline, rootA)
    val direct = ids(IncrementalCuration.refresh(delta, rootA, 1L))

    val rootB = Spill.newPath(spark) + "/stateB"
    IncrementalCuration.bootstrap(base, pipeline, rootB)
    val deltaPath = Spill.newPath(spark) + "/delta"
    delta.coalesce(1).write.parquet(deltaPath)
    val stream = spark.readStream
      .schema(delta.schema).parquet(deltaPath)
    StreamingCuration.run(stream, rootB)

    assert(ids(IncrementalCuration.snapshot(spark, rootB)) == direct)
    assert(direct == Set(1L, 2L, 11L))
  }
}
