package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path

import java.nio.charset.StandardCharsets

/** Cross-process single-writer lease for a state directory — the
  * enforcement of the "single writer per store" assumption every
  * incremental store documents ([[IncrementalSwa]], [[MergeLog]]):
  * two well-behaved jobs that BOTH believe they own the nightly
  * refresh must not interleave version writes, because additive state
  * double-counts and latest-wins resolves nondeterministically.
  *
  * Built on the same primitive as [[Publish]]'s commit marker: a
  * `FileSystem.create(overwrite = false)` of `dir/_writer_lease` is a
  * single atomic create-no-overwrite (conditional put on object
  * stores), so exactly one contender holds the lease and the loser
  * FAILS BY NAME (who holds it, how old it is) rather than corrupting
  * state. The lease carries a UUID token; [[release]] verifies the
  * token so a writer that lost its lease to a stale-takeover cannot
  * delete the new holder's lease on the way out.
  *
  * Staleness: a holder that died cannot release, so a lease older
  * than `ttlMs` (file modification time — assigned atomically with
  * the create, no clock carried in the content) may be TAKEN OVER:
  * delete + re-create. The delete/create pair is not atomic, but the
  * re-create is — of two racing takeovers exactly one wins and the
  * other fails by name. A live long-running writer must therefore
  * finish within the ttl (default 10 min, `spark.graft.lease.ttlSeconds`)
  * or its work may be taken over — the takeover error on ITS release
  * names exactly that.
  */
object WriterLease {
  private val LeaseName = "_writer_lease"

  /** Held lease handle — pass to [[release]]. */
  final case class Lease(dir: String, owner: String, token: String)

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def leasePath(dir: String) = new Path(s"$dir/$LeaseName")

  private def ttlMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.lease.ttlSeconds", "600").toLong * 1000L

  private def readLease(spark: SparkSession, dir: String): Option[(String, String, Long)] = {
    val f = fs(spark, dir)
    val p = leasePath(dir)
    if (!f.exists(p)) None
    else {
      val st = f.getFileStatus(p)
      val in = f.open(p)
      val content =
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      val (owner, token) = content.split("\n", 2) match {
        case Array(o, t) => (o, t.trim)
        case _ => (content.trim, "") // partial write: held, unknown token
      }
      Some((owner, token, st.getModificationTime))
    }
  }

  private def tryCreate(spark: SparkSession, dir: String,
      owner: String): Option[Lease] = {
    val f = fs(spark, dir)
    f.mkdirs(new Path(dir))
    val token = java.util.UUID.randomUUID().toString
    try {
      val out = f.create(leasePath(dir), /* overwrite = */ false)
      try out.write(s"$owner\n$token".getBytes(StandardCharsets.UTF_8))
      finally out.close()
      Some(Lease(dir, owner, token))
    } catch {
      case _: java.io.IOException => None // exists: somebody holds it
    }
  }

  /** Acquire the writer lease on `dir` or fail by name. A lease older
    * than the ttl is presumed abandoned and taken over; of two racing
    * takeovers exactly one wins (the atomic re-create decides).
    */
  def acquire(spark: SparkSession, dir: String, owner: String): Lease =
    tryCreate(spark, dir, owner).getOrElse {
      readLease(spark, dir) match {
        case None =>
          // holder released between our create and read: one retry
          tryCreate(spark, dir, owner).getOrElse(
            throw new IllegalStateException(
              s"writer lease on $dir is contended — another writer " +
                "acquired it concurrently; retry after it finishes"))
        case Some((holder, _, modMs)) =>
          val ageMs = System.currentTimeMillis() - modMs
          if (ageMs <= ttlMs(spark))
            throw new IllegalStateException(
              s"store at $dir is locked by writer '$holder' " +
                s"(lease ${ageMs / 1000}s old, ttl ${ttlMs(spark) / 1000}s) — " +
                "two concurrent writers would interleave version writes; " +
                "wait for it to finish, or raise " +
                "spark.graft.lease.ttlSeconds if it legitimately runs long")
          else {
            // stale: the holder died without releasing. Take over —
            // the re-create is the atomic arbiter between racers.
            fs(spark, dir).delete(leasePath(dir), false)
            tryCreate(spark, dir, owner).getOrElse(
              throw new IllegalStateException(
                s"lost the stale-lease takeover race on $dir (previous " +
                  s"holder '$holder', ${ageMs / 1000}s old) — another " +
                  "writer took it first; retry after it finishes"))
          }
      }
    }

  /** Release a held lease. Fails by name if the lease was taken over
    * (token mismatch) — the caller's writes after the takeover point
    * may have interleaved with the new holder's and need manual
    * review; its own lease file is left untouched for the new holder.
    */
  def release(spark: SparkSession, lease: Lease): Unit =
    readLease(spark, lease.dir) match {
      case Some((_, token, _)) if token == lease.token =>
        fs(spark, lease.dir).delete(leasePath(lease.dir), false)
      case Some((holder, _, _)) =>
        throw new IllegalStateException(
          s"writer lease on ${lease.dir} held by '${lease.owner}' was " +
            s"TAKEN OVER by '$holder' (this writer exceeded the lease " +
            "ttl); writes after the takeover may have interleaved — " +
            "verify the store's version log before trusting this run")
      case None => () // already gone (e.g. released via takeover + release)
    }

  /** Run `f` under the lease, releasing on every path. */
  def withLease[A](spark: SparkSession, dir: String, owner: String)(f: => A): A = {
    val lease = acquire(spark, dir, owner)
    try f finally release(spark, lease)
  }
}
