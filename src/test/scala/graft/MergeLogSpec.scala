package graft

import graft.operators.{MergeLog, Spill, Upsert}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MergeLogSpec extends SparkTestBase {
  import spark.implicits._

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  private val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "v")

  test("snapshot resolves latest-wins across versions; tombstones delete") {
    val dir = Spill.newPath(spark)
    MergeLog.append(base, dir, 0L, Seq("k"))
    MergeLog.append(Seq((2L, "b1", 21.0, false), (4L, "d", 40.0, false))
      .toDF("k", "name", "v", "dead"), dir, 1L, Seq("k"), Some("dead"))
    MergeLog.append(Seq((2L, "b2", 22.0, false), (3L, "c", 0.0, true))
      .toDF("k", "name", "v", "dead"), dir, 2L, Seq("k"), Some("dead"))

    val want = Seq((1L, "a", 10.0), (2L, "b2", 22.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    assert(multiset(MergeLog.snapshot(spark, dir, Seq("k"))) == multiset(want))
  }

  test("contending writers: the loser fails by name, log versions intact") {
    import graft.operators.WriterLease
    val dir = Spill.newPath(spark)
    MergeLog.append(base, dir, 0L, Seq("k"))
    // writer A holds the log (a long-running compact mid-flight)
    val a = WriterLease.acquire(spark, dir, "nightly-compactor-A")
    val e = intercept[IllegalStateException] {
      MergeLog.append(Seq((4L, "d", 40.0)).toDF("k", "name", "v"),
        dir, 1L, Seq("k"))
    }
    assert(e.getMessage.contains("locked") &&
      e.getMessage.contains("nightly-compactor-A"), e.getMessage)
    assert(MergeLog.versions(spark, dir) == Seq(0L),
      "the refused append must leave the log untouched")
    val c = intercept[IllegalStateException] {
      MergeLog.compact(spark, dir, Seq("k"))
    }
    assert(c.getMessage.contains("locked"), c.getMessage)
    // after A releases, the retry lands normally
    WriterLease.release(spark, a)
    MergeLog.append(Seq((4L, "d", 40.0)).toDF("k", "name", "v"),
      dir, 1L, Seq("k"))
    assert(MergeLog.versions(spark, dir).sorted == Seq(0L, 1L))
  }

  test("snapshot equals the equivalent eager Upsert.merge chain") {
    val dir = Spill.newPath(spark)
    val d1 = Seq((2L, "b1", 21.0, false), (4L, "d", 40.0, false))
      .toDF("k", "name", "v", "dead")
    val d2 = Seq((1L, "a", 0.0, true), (4L, "d2", 44.0, false))
      .toDF("k", "name", "v", "dead")
    MergeLog.append(base, dir, 0L, Seq("k"))
    MergeLog.append(d1, dir, 1L, Seq("k"), Some("dead"))
    MergeLog.append(d2, dir, 2L, Seq("k"), Some("dead"))

    val eager = Upsert.merge(
      Upsert.merge(base, d1, Seq("k"), tombstoneCol = Some("dead")),
      d2, Seq("k"), tombstoneCol = Some("dead"))
    assert(multiset(MergeLog.snapshot(spark, dir, Seq("k"))) == multiset(eager))
  }

  test("diff classifies added/removed/updated; equals the two-snapshot reference") {
    val dir = Spill.newPath(spark)
    MergeLog.append(base, dir, 0L, Seq("k"))
    // v1: update 2, add 4, add-then-delete candidate 5
    MergeLog.append(Seq((2L, "b1", 21.0, false), (4L, "d", 40.0, false),
      (5L, "e", 50.0, false)).toDF("k", "name", "v", "dead"),
      dir, 1L, Seq("k"), Some("dead"))
    // v2: delete 3 and 5, re-update 2, touch 1 with an IDENTICAL row
    MergeLog.append(Seq((2L, "b2", 22.0, false), (3L, "c", 0.0, true),
      (5L, "e", 0.0, true), (1L, "a", 10.0, false))
      .toDF("k", "name", "v", "dead"), dir, 2L, Seq("k"), Some("dead"))

    val got = MergeLog.diff(spark, dir, Seq("k"), 0L, 2L)
      .as[(Long, String)].collect().toMap
    // 1 rewritten with identical values -> NOT a change; 5 added then
    // deleted inside the window -> invisible
    assert(got == Map(2L -> "updated", 3L -> "removed", 4L -> "added"),
      s"got $got")

    // reference implementation: full-outer join of the two snapshots
    def ref(f: Long, t: Long): Map[Long, String] = {
      val a = MergeLog.snapshotAsOf(spark, dir, Seq("k"), f)
        .withColumnRenamed("name", "an").withColumnRenamed("v", "av")
      val b = MergeLog.snapshotAsOf(spark, dir, Seq("k"), t)
        .withColumnRenamed("name", "bn").withColumnRenamed("v", "bv")
      a.join(b, Seq("k"), "full_outer")
        .withColumn("change",
          when(col("an").isNull, "added")
            .when(col("bn").isNull, "removed")
            .when(col("an") =!= col("bn") || col("av") =!= col("bv"), "updated"))
        .where(col("change").isNotNull)
        .select(col("k"), col("change")).as[(Long, String)].collect().toMap
    }
    assert(got == ref(0L, 2L))
    assert(MergeLog.diff(spark, dir, Seq("k"), 1L, 2L)
      .as[(Long, String)].collect().toMap == ref(1L, 2L))
    // identical endpoints -> empty; backwards/rebased windows refused
    assert(MergeLog.diff(spark, dir, Seq("k"), 2L, 2L).isEmpty)
    intercept[IllegalArgumentException] {
      MergeLog.diff(spark, dir, Seq("k"), 2L, 1L)
    }
    MergeLog.compact(spark, dir, Seq("k"))
    intercept[IllegalArgumentException] {
      MergeLog.diff(spark, dir, Seq("k"), 0L, MergeLog.versions(spark, dir).max)
    }
  }

  test("replayed append is idempotent (overwrites its own version)") {
    val dir = Spill.newPath(spark)
    MergeLog.append(base, dir, 0L, Seq("k"))
    val d = Seq((2L, "b1", 21.0)).toDF("k", "name", "v")
    MergeLog.append(d, dir, 1L, Seq("k"))
    val once = multiset(MergeLog.snapshot(spark, dir, Seq("k")))
    MergeLog.append(d, dir, 1L, Seq("k")) // replay
    assert(multiset(MergeLog.snapshot(spark, dir, Seq("k"))) == once)
  }

  test("compact folds to one NEW version, same snapshot") {
    val dir = Spill.newPath(spark)
    MergeLog.append(base, dir, 0L, Seq("k"))
    MergeLog.append(Seq((3L, "c", 0.0, true), (5L, "e", 50.0, false))
      .toDF("k", "name", "v", "dead"), dir, 1L, Seq("k"), Some("dead"))
    val before = multiset(MergeLog.snapshot(spark, dir, Seq("k")))
    MergeLog.compact(spark, dir, Seq("k"))
    // the fold lands in a fresh version slot (crash safety: the old
    // vmax partition is never overwritten in place)
    assert(MergeLog.versions(spark, dir) == Seq(2L))
    assert(multiset(MergeLog.snapshot(spark, dir, Seq("k"))) == before)
    // appending after compaction continues the lineage
    assert(MergeLog.nextVersion(spark, dir) == 3L)
    MergeLog.append(Seq((5L, "e2", 55.0)).toDF("k", "name", "v"),
      dir, MergeLog.nextVersion(spark, dir), Seq("k"))
    assert(MergeLog.snapshot(spark, dir, Seq("k"))
      .where($"k" === 5L).as[(Long, String, Double)].head() == ((5L, "e2", 55.0)))
  }

  test("snapshotAsOf replays every historical state; compact rebases with a named error") {
    val dir = Spill.newPath(spark)
    MergeLog.append(base, dir, 0L, Seq("k"))
    MergeLog.append(Seq((2L, "b1", 21.0, false), (4L, "d", 40.0, false))
      .toDF("k", "name", "v", "dead"), dir, 1L, Seq("k"), Some("dead"))
    MergeLog.append(Seq((2L, "b2", 22.0, false), (3L, "c", 0.0, true))
      .toDF("k", "name", "v", "dead"), dir, 2L, Seq("k"), Some("dead"))

    assert(multiset(MergeLog.snapshotAsOf(spark, dir, Seq("k"), 0L)) ==
      multiset(base))
    assert(multiset(MergeLog.snapshotAsOf(spark, dir, Seq("k"), 1L)) ==
      multiset(Seq((1L, "a", 10.0), (2L, "b1", 21.0), (3L, "c", 30.0),
        (4L, "d", 40.0)).toDF("k", "name", "v")))
    // as-of between versions = as-of the floor; beyond max = snapshot
    assert(multiset(MergeLog.snapshotAsOf(spark, dir, Seq("k"), 99L)) ==
      multiset(MergeLog.snapshot(spark, dir, Seq("k"))))

    MergeLog.compact(spark, dir, Seq("k"))
    val e = intercept[IllegalArgumentException] {
      MergeLog.snapshotAsOf(spark, dir, Seq("k"), 1L)
    }
    assert(e.getMessage.contains("rebased by compaction"))
    // the surviving fold version still reads
    assert(multiset(MergeLog.snapshotAsOf(spark, dir, Seq("k"), 3L)) ==
      multiset(MergeLog.snapshot(spark, dir, Seq("k"))))
  }

  test("crash between compact's fold write and deletes cannot resurrect tombstoned keys") {
    val dir = Spill.newPath(spark)
    MergeLog.append(base, dir, 0L, Seq("k"))
    MergeLog.append(Seq((3L, "c", 0.0, true), (5L, "e", 50.0, false))
      .toDF("k", "name", "v", "dead"), dir, 1L, Seq("k"), Some("dead"))
    val before = multiset(MergeLog.snapshot(spark, dir, Seq("k")))

    // phase 1 only — the crash window: fold written, old partitions live
    MergeLog.writeFold(spark, dir, Seq("k"), 1L)
    assert(MergeLog.versions(spark, dir).sorted == Seq(0L, 1L, 2L))
    assert(multiset(MergeLog.snapshot(spark, dir, Seq("k"))) == before,
      "k=3's tombstone must survive in the fold while version 0's live row exists")

    // partial phase 2 (only version 1 deleted) — still identical
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/__v=1"), true)
    assert(multiset(MergeLog.snapshot(spark, dir, Seq("k"))) == before)
  }

  test("append rejects reserved __v / undeclared __dead delta columns by name") {
    val dir = Spill.newPath(spark)
    // __v collides with partition discovery — fails at the WRITER
    val withV = base.withColumn("__v", lit(7L))
    val eV = intercept[IllegalArgumentException] {
      MergeLog.append(withV, dir, 0L, Seq("k"))
    }
    assert(eV.getMessage.contains("__v"))
    // an undeclared __dead would be silently overwritten by the
    // tombstone normalization — refuse instead
    val withDead = base.withColumn("__dead", lit(true))
    val eD = intercept[IllegalArgumentException] {
      MergeLog.append(withDead, dir, 0L, Seq("k"))
    }
    assert(eD.getMessage.contains("__dead") &&
      eD.getMessage.contains("tombstone"))
    // DECLARING __dead as the tombstone column is the sanctioned spelling
    MergeLog.append(withDead.withColumn("__dead", lit(false)), dir, 0L,
      Seq("k"), tombstoneCol = Some("__dead"))
    assert(MergeLog.snapshot(spark, dir, Seq("k")).count() == 3)
  }

  test("append rejects a delta whose schema drifted from the log") {
    val dir = Spill.newPath(spark)
    MergeLog.append(base, dir, 0L, Seq("k"))
    val e = intercept[IllegalArgumentException] {
      MergeLog.append(Seq((9L, 90.0)).toDF("k", "v"), dir, 1L, Seq("k"))
    }
    assert(e.getMessage.contains("does not match merge log"))
  }

  test("snapshot/compact on an empty or missing log fail with a named error") {
    val dir = Spill.newPath(spark) + "/nonexistent"
    val e1 = intercept[IllegalArgumentException] {
      MergeLog.snapshot(spark, dir, Seq("k"))
    }
    assert(e1.getMessage.contains("empty or missing"))
    val e2 = intercept[IllegalArgumentException] {
      MergeLog.compact(spark, dir, Seq("k"))
    }
    assert(e2.getMessage.contains("empty or missing"))
  }

  test("upsertStream: micro-batches fold into a latest-per-key snapshot") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, String)] // (k, seq, payload)
    stream.addData((1L, 1L, "a1"), (2L, 1L, "b1"), (1L, 2L, "a2"))
    stream.addData((2L, 2L, "b2"), (3L, 1L, "c1"))

    val dir = Spill.newPath(spark)
    graft.streaming.StreamingIngest.upsertStream(
      stream.toDF().toDF("k", "seq", "payload"), dir, Seq("k"), "seq")

    val snap = MergeLog.snapshot(spark, dir, Seq("k"))
      .as[(Long, Long, String)].collect().toSet
    assert(snap == Set((1L, 2L, "a2"), (2L, 2L, "b2"), (3L, 1L, "c1")))
  }

  test("a caller tombstone column literally named __dead still deletes") {
    // regression: withColumn(__dead, ...) replaced the caller's column
    // and the subsequent drop removed the internal marker entirely
    val dir = Spill.newPath(spark)
    MergeLog.append(base, dir, 0L, Seq("k"))
    MergeLog.append(Seq((3L, "c", 0.0, true)).toDF("k", "name", "v", "__dead"),
      dir, 1L, Seq("k"), Some("__dead"))
    assert(MergeLog.snapshot(spark, dir, Seq("k"))
      .select("k").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("intra-version duplicate keys are rejected") {
    val dir = Spill.newPath(spark)
    val e = intercept[IllegalArgumentException] {
      MergeLog.append(Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k", "name", "v"),
        dir, 0L, Seq("k"))
    }
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("crash inside a replay's partition swap: reads refuse by name, any write recovers") {
    val dir = Spill.newPath(spark)
    MergeLog.append(base, dir, 0L, Seq("k"))
    MergeLog.append(Seq((2L, "b1", 21.0)).toDF("k", "name", "v"),
      dir, 1L, Seq("k"))
    val before = multiset(MergeLog.snapshot(spark, dir, Seq("k")))

    // the crash window a replay of version 1 can die inside: committed
    // partition renamed aside, staged not yet renamed in
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/__v=1"),
      new org.apache.hadoop.fs.Path(s"$dir/_aside_v1")))

    // reads must refuse rather than silently resolve WITHOUT version 1
    val e = intercept[IllegalArgumentException] {
      MergeLog.snapshot(spark, dir, Seq("k"))
    }
    assert(e.getMessage.contains("interrupted append swaps") &&
      e.getMessage.contains("1"), e.getMessage)

    // any append recovers the aside first — here an unrelated version
    MergeLog.append(Seq((7L, "g", 70.0)).toDF("k", "name", "v"),
      dir, 2L, Seq("k"))
    val after = multiset(MergeLog.snapshot(spark, dir, Seq("k")))
    assert(after == before + ("[7,g,70.0]" -> 1), s"got $after")

    // compact recovers too: re-create the crash state, compact, and the
    // restored version 1 row must survive into the fold
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/__v=1"),
      new org.apache.hadoop.fs.Path(s"$dir/_aside_v1")))
    MergeLog.compact(spark, dir, Seq("k"))
    assert(multiset(MergeLog.snapshot(spark, dir, Seq("k"))) == after)
  }

  test("a completed swap's leftover aside is swept, not restored") {
    val dir = Spill.newPath(spark)
    MergeLog.append(base, dir, 0L, Seq("k"))
    // crash AFTER the staged rename but before the aside delete: both
    // the committed partition and the aside exist — reads stay fine and
    // the next write deletes the stale aside
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/_aside_v0"))
    assert(multiset(MergeLog.snapshot(spark, dir, Seq("k"))) ==
      multiset(base))
    MergeLog.append(Seq((4L, "d", 40.0)).toDF("k", "name", "v"),
      dir, 1L, Seq("k"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_aside_v0")))
    assert(MergeLog.snapshot(spark, dir, Seq("k")).count() == 4)
  }
}
