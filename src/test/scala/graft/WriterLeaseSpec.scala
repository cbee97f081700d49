package graft

import graft.operators.{IncrementalSwa, Spill, WriterLease}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

class WriterLeaseSpec extends SparkTestBase {
  import spark.implicits._

  private val DayUs = 86400000000L
  private val cfg = IncrementalSwa.Config(Seq("k"), "ts", "v", DayUs)

  private def delta(rows: (Long, Double)*) =
    rows.toDF("k", "v")
      .withColumn("ts", timestamp_micros(lit(1000000L)))
      .select("k", "ts", "v")

  test("two interleaved writers: the loser fails loudly, state stays consistent") {
    val dir = Spill.newPath(spark)
    IncrementalSwa.ingest(delta((1L, 1.0)), dir, cfg, 0L)
    // writer A holds the store (a long-running refresh mid-flight)
    val a = WriterLease.acquire(spark, dir, "nightly-refresh-A")
    // writer B's ingest must fail by name, not interleave
    val e = intercept[IllegalStateException] {
      IncrementalSwa.ingest(delta((2L, 2.0)), dir, cfg, 1L)
    }
    assert(e.getMessage.contains("locked") &&
      e.getMessage.contains("nightly-refresh-A"), e.getMessage)
    // state shows no trace of B
    assert(IncrementalSwa.versions(spark, dir) == Seq(0L))
    // after A releases, B's retry succeeds and the state is exactly
    // A-then-B — nothing lost, nothing doubled
    WriterLease.release(spark, a)
    IncrementalSwa.ingest(delta((2L, 2.0)), dir, cfg, 1L)
    val served = IncrementalSwa.serve(spark, dir, cfg, DayUs, 1)
      .select("k", "f_sum").as[(Long, Double)].collect().toMap
    assert(served == Map(1L -> 1.0, 2L -> 2.0))
  }

  // age a held lease past the ttl: staleness is judged from the live
  // lease FILE's mtime (the store's clock), so rewind that — and keep
  // the content-carried creation timestamp (the rename-stable IDENTITY
  // field) in sync so the takeover's tomb verification still matches
  // what a contender observed
  private def ageLease(dir: String, byMs: Long): Unit = {
    val p = new Path(s"$dir/_writer_lease")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.setTimes(p, System.currentTimeMillis() - byMs, -1L)
  }

  test("stale lease is taken over; the dead holder's release names the takeover") {
    val dir = Spill.newPath(spark)
    spark.conf.set("spark.graft.lease.ttlSeconds", "1")
    try {
      val dead = WriterLease.acquire(spark, dir, "crashed-writer")
      // age the lease past the ttl (a holder that died can't release)
      ageLease(dir, 5000L)
      // a new writer takes over instead of wedging forever
      IncrementalSwa.ingest(delta((1L, 1.0)), dir, cfg, 0L)
      assert(IncrementalSwa.versions(spark, dir) == Seq(0L))
      // the dead writer's (zombie) release must fail by name if the
      // lease is still held by someone else — here ingest already
      // released, so simulate the mid-takeover state explicitly
      val thief = WriterLease.acquire(spark, dir, "takeover-writer")
      val z = intercept[IllegalStateException] {
        WriterLease.release(spark, dead)
      }
      assert(z.getMessage.contains("TAKEN OVER") &&
        z.getMessage.contains("takeover-writer"), z.getMessage)
      WriterLease.release(spark, thief)
    } finally spark.conf.unset("spark.graft.lease.ttlSeconds")
  }

  test("takeover verifies the observed lease — a racer cannot evict a fresh lease (ABA)") {
    val dir = Spill.newPath(spark)
    spark.conf.set("spark.graft.lease.ttlSeconds", "1")
    try {
      // both racers observe the same stale lease...
      WriterLease.acquire(spark, dir, "old-writer")
      ageLease(dir, 5000L)
      val observed = WriterLease.readLease(spark, dir).get
      // ...racer 1 takes it over first and now holds a FRESH lease
      val racer1 = WriterLease.acquire(spark, dir, "racer-1")
      // racer 2 still acts on the stale observation: its takeover must
      // detect the tomb is NOT the observed lease, restore it, and lose
      assert(WriterLease.takeOver(spark, dir, "racer-2", observed).isEmpty)
      assert(WriterLease.readLease(spark, dir).exists(_._1 == "racer-1"))
      // racer 1 was never evicted: its release succeeds cleanly
      WriterLease.release(spark, racer1)
    } finally spark.conf.unset("spark.graft.lease.ttlSeconds")
  }

  test("release of a ttl-expired lease cannot delete a taker-over's fresh lease") {
    val dir = Spill.newPath(spark)
    spark.conf.set("spark.graft.lease.ttlSeconds", "1")
    try {
      val zombie = WriterLease.acquire(spark, dir, "zombie")
      ageLease(dir, 5000L)
      val taker = WriterLease.acquire(spark, dir, "taker")
      // the zombie's release verifies via rename — it must fail by name
      // AND leave the taker's lease in place (a read-then-delete pair
      // would remove it, unlocking the store under the taker)
      val z = intercept[IllegalStateException] { WriterLease.release(spark, zombie) }
      assert(z.getMessage.contains("TAKEN OVER"), z.getMessage)
      assert(WriterLease.readLease(spark, dir).exists(_._1 == "taker"))
      WriterLease.release(spark, taker)
    } finally spark.conf.unset("spark.graft.lease.ttlSeconds")
  }

  test("withLease releases on failure paths") {
    val dir = Spill.newPath(spark)
    intercept[RuntimeException] {
      WriterLease.withLease(spark, dir, "w") { sys.error("boom") }
    }
    // lease gone: the next acquire succeeds immediately
    WriterLease.release(spark, WriterLease.acquire(spark, dir, "w2"))
  }

  test("lease identity is content-carried (rename-stable); age is the store-clock mtime") {
    // on object stores rename is copy+delete and rewrites mtime, so the
    // takeover IDENTITY check reads the creation time from the lease
    // CONTENT — while staleness stays on the store's clock (the live
    // lease file's mtime), so a writer's skewed wall clock can never
    // make a live lease look expired
    val dir = Spill.newPath(spark)
    val p = new Path(s"$dir/_writer_lease")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir))
    val skewedMs = System.currentTimeMillis() - 3600 * 1000L
    val out = fs.create(p, false)
    out.write(s"skewed-writer\nits-token\n$skewedMs".getBytes("UTF-8"))
    out.close()
    spark.conf.set("spark.graft.lease.ttlSeconds", "600")
    try {
      // identity reads the CONTENT timestamp (survives copy+delete)...
      val read = WriterLease.readLease(spark, dir)
      assert(read.exists(_._3 == skewedMs),
        s"identity created-at must come from content: $read")
      // ...but the fresh FILE means the holder is LIVE: a contender is
      // excluded even though the holder's own clock ran an hour behind
      val e = intercept[IllegalStateException] {
        WriterLease.acquire(spark, dir, "contender")
      }
      assert(e.getMessage.contains("skewed-writer"), e.getMessage)
      // once the STORE-clock age passes the ttl, takeover proceeds and
      // the tomb verification matches on the content identity
      ageLease(dir, 601 * 1000L)
      val taker = WriterLease.acquire(spark, dir, "taker")
      assert(WriterLease.readLease(spark, dir).exists(_._1 == "taker"))
      WriterLease.release(spark, taker)
    } finally spark.conf.unset("spark.graft.lease.ttlSeconds")
  }

  test("a legacy two-line lease falls back to mtime and still excludes") {
    val dir = Spill.newPath(spark)
    val p = new Path(s"$dir/_writer_lease")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir))
    val out = fs.create(p, false)
    out.write("live-writer\nits-token".getBytes("UTF-8"))
    out.close()
    // fresh mtime, no content timestamp: treated as live — excluded
    val e = intercept[IllegalStateException] {
      WriterLease.acquire(spark, dir, "contender")
    }
    assert(e.getMessage.contains("live-writer"), e.getMessage)
    fs.delete(p, false)
  }
}
