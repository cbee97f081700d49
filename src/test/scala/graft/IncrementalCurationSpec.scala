package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalCurationSpec extends SparkTestBase {
  import spark.implicits._

  // A corpus where every interesting admission path is planted:
  // quality-passing docs need >= 50 words and >= 2 English stopwords.
  // text depends on the SEED only — docs sharing a seed are exact
  // duplicates (jaccard 1.0), docs with different seeds share no
  // content shingles (jaccard ~0 at the 0.9 threshold)
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

  test("incremental bootstrap+refresh equals the batch ordered run") {
    val base = corpus(
      doc(1, "alpha"), doc(2, "beta"), doc(3, "alpha"), // 3 dups 1
      doc(4, "gamma"),
      5L -> "too short to pass quality")
    val delta = corpus(
      doc(10, "alpha"), // dup of admitted base doc 1 -> dropped
      doc(11, "delta"), // fresh -> admitted
      doc(12, "delta"), // delta-internal dup of 11 -> dropped
      13L -> "also too short",
      doc(14, "gamma")) // dup of base doc 4 -> dropped

    val root = Spill.newPath(spark) + "/state"
    val boot = IncrementalCuration.bootstrap(base, pipeline, root)
    assert(ids(boot) == Set(1L, 2L, 4L))

    val snap = IncrementalCuration.refresh(delta, root, version = 1L)
    val batch = CurationPipeline("text", "doc_id", Seq(
        CurationStage.Quality(50, 100000, 2)))
      .run(base.unionByName(delta))
    val batchOrdered = Dedup.dropNearDuplicatesOrdered(
      batch, "text", "doc_id", 0.9)
    assert(ids(snap) == ids(batchOrdered))
    assert(ids(snap) == Set(1L, 2L, 4L, 11L))
  }

  test("previewRefresh reports the exact verdicts and touches NO state") {
    val base = corpus(
      doc(1, "alpha"), doc(2, "beta"), doc(4, "gamma"),
      5L -> "too short to pass quality")
    val delta = corpus(
      doc(10, "alpha"), // would be dropped against the index
      doc(11, "delta"), // fresh -> admitted
      doc(12, "delta"), // delta-internal dup of 11 -> dropped
      13L -> "also too short")
    val root = Spill.newPath(spark) + "/pvstate"
    val bootIds = ids(IncrementalCuration.bootstrap(base, pipeline, root))
    val before = MergeLog.versions(spark, s"$root/log")

    val got = IncrementalCuration.previewRefresh(delta, root)
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      10L -> "1:near_dup_drop",
      11L -> "admitted",
      12L -> "1:near_dup_drop",
      13L -> "0:quality"), s"got $got")
    // no state was written: versions unchanged, high-water unchanged,
    // and a preview-then-refresh equals a plain refresh
    assert(MergeLog.versions(spark, s"$root/log") == before)
    val snap = IncrementalCuration.refresh(delta, root, version = 1L)
    assert(ids(snap) == Set(1L, 2L, 4L, 11L),
      "the preview must not have polluted the index with delta rows")
    // the preview's admitted set IS the refresh's delta contribution
    assert(got.filter(_._2 == "admitted").keySet == ids(snap) -- bootIds)
  }

  test("a doc matching only a DROPPED entrant is still dropped (entrants are indexed)") {
    // base doc 3 is a near-dup of 1 and is dropped; delta doc 20 is a
    // near-dup of 3 (and of 1, identical text) — batch ordered-drop
    // drops 20 because SOME smaller entrant matches, so the index must
    // contain dropped entrants too
    val base = corpus(doc(1, "alpha"), doc(3, "alpha"))
    val delta = corpus(doc(20, "alpha"))
    val root = Spill.newPath(spark) + "/state"
    assert(ids(IncrementalCuration.bootstrap(base, pipeline, root)) == Set(1L))
    assert(ids(IncrementalCuration.refresh(delta, root, 1L)) == Set(1L))
  }

  test("second refresh is judged against the first refresh's entrants") {
    val base = corpus(doc(1, "alpha"))
    val root = Spill.newPath(spark) + "/state"
    IncrementalCuration.bootstrap(base, pipeline, root)
    IncrementalCuration.refresh(corpus(doc(10, "beta")), root, 1L)
    // 20 duplicates refresh-1's doc 10, 21 is fresh
    val snap = IncrementalCuration.refresh(
      corpus(doc(20, "beta"), doc(21, "zeta")), root, 2L)
    assert(ids(snap) == Set(1L, 10L, 21L))
    // and the log's history replays: as of version 1 there was no 21
    assert(ids(MergeLog.snapshotAsOf(spark, s"$root/log", Seq("doc_id"), 1L))
      == Set(1L, 10L))
  }

  test("store-reusing ordered drop equals the recomputing operator on real documents") {
    // NearDupIndex.orderedLosers (candidates from the persisted band
    // store, verification from the persisted shingle store) must drop
    // exactly what Dedup.dropNearDuplicatesOrdered drops when it
    // recomputes everything — on the fixture corpus plus planted
    // copies, where natural near-dups exercise nontrivial clusters
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val planted = docs.where($"doc_id" % 10 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val all = docs.unionByName(planted)
    val path = Spill.newPath(spark) + "/olidx"
    NearDupIndex.build(all, path, "text", "doc_id")
    val viaStore = all.join(
        NearDupIndex.orderedLosers(spark, path, 0.8)
          .select($"id".as("doc_id")),
        Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    val recomputed = ids(
      Dedup.dropNearDuplicatesOrdered(all, "text", "doc_id", 0.8))
    assert(viaStore == recomputed)
    assert(viaStore.size < all.count(), "planted copies must drop")
  }

  test("replaying a refresh (crash recovery) reproduces the same snapshot") {
    val base = corpus(doc(1, "alpha"), doc(2, "beta"))
    val delta = corpus(doc(10, "alpha"), doc(11, "gamma"))
    val root = Spill.newPath(spark) + "/state"
    IncrementalCuration.bootstrap(base, pipeline, root)
    val first = ids(IncrementalCuration.refresh(delta, root, 1L))
    // the replay validates against the PRE-refresh high-water mark and
    // overwrites its own log/meta versions; duplicate index rows from
    // the re-append cannot change any decision
    val replay = ids(IncrementalCuration.refresh(delta, root, 1L))
    assert(replay == first && first == Set(1L, 2L, 11L))
    // and a subsequent refresh still judges against refresh-1 entrants
    val next = ids(IncrementalCuration.refresh(
      corpus(doc(20, "gamma"), doc(21, "delta")), root, 2L))
    assert(next == Set(1L, 2L, 11L, 21L))
  }

  test("replay with delta-INTERNAL near-dup pairs keeps the admitted sibling") {
    // the r11 review's counterexample: delta docs 10 and 11 duplicate
    // each other; the first run admits 10 and appends BOTH entrants'
    // rows to the index. A replay must not drop 10 against its stored
    // sibling 11 — the cross match is strictly ordered (stored id <
    // delta id), not merely self-excluding
    val root = Spill.newPath(spark) + "/state"
    IncrementalCuration.bootstrap(corpus(doc(1, "alpha")), pipeline, root)
    val delta = corpus(doc(10, "xray"), doc(11, "xray"))
    val first = ids(IncrementalCuration.refresh(delta, root, 1L))
    assert(first == Set(1L, 10L))
    val replay = ids(IncrementalCuration.refresh(delta, root, 1L))
    assert(replay == first,
      s"replay dropped the admitted sibling: $replay vs $first")
  }

  test("a DIFFERENT delta claiming an already-written version is refused") {
    // fresh-checkpoint-against-a-used-state-dir tripwire: version 1
    // exists; re-presenting it with other data must fail loudly, not
    // silently rewrite history
    val root = Spill.newPath(spark) + "/state"
    IncrementalCuration.bootstrap(corpus(doc(1, "alpha")), pipeline, root)
    IncrementalCuration.refresh(corpus(doc(10, "beta")), root, 1L)
    val e = intercept[IllegalArgumentException] {
      IncrementalCuration.refresh(corpus(doc(20, "gamma")), root, 1L)
    }
    assert(e.getMessage.contains("already"))
  }

  test("non-monotone delta ids are refused by name") {
    val root = Spill.newPath(spark) + "/state"
    IncrementalCuration.bootstrap(corpus(doc(5, "alpha")), pipeline, root)
    val e = intercept[IllegalArgumentException] {
      IncrementalCuration.refresh(corpus(doc(3, "beta")), root, 1L)
    }
    assert(e.getMessage.contains("monotone"))
  }

  test("corpus-global stages are refused at bootstrap by name") {
    val bad = CurationPipeline("text", "doc_id", Seq(
      CurationStage.Quality(), CurationStage.TopFraction(0.5)))
    val e = intercept[IllegalArgumentException] {
      IncrementalCuration.bootstrap(corpus(doc(1, "a")), bad,
        Spill.newPath(spark) + "/state")
    }
    assert(e.getMessage.contains("TopFraction"))
  }

  test("refresh runs under the PERSISTED config (config pinning)") {
    val root = Spill.newPath(spark) + "/state"
    IncrementalCuration.bootstrap(corpus(doc(1, "alpha")), pipeline, root)
    // refresh takes no pipeline argument at all — the state dir's
    // pipeline.json governs; a fresh-session read-back must round-trip
    val stored = CurationPipeline.fromJson(
      CurationPipeline.toJson(pipeline))
    assert(stored == pipeline)
    val snap = IncrementalCuration.refresh(corpus(doc(10, "alpha")), root, 1L)
    assert(ids(snap) == Set(1L)) // dup dropped under the stored threshold
  }

  test("per-doc post stages after the near-dup stage apply to admitted docs only") {
    val p = CurationPipeline("text", "doc_id", Seq(
      CurationStage.NearDupDrop(0.9, ordered = true), CurationStage.PiiRedact))
    val base = corpus(
      1L -> "contact me at alice@example.com for the details",
      2L -> "contact me at alice@example.com for the details")
    val root = Spill.newPath(spark) + "/state"
    val boot = IncrementalCuration.bootstrap(base, p, root)
    val texts = boot.select("text").as[String].collect()
    assert(texts.length == 1 && !texts.head.contains("alice@example.com"),
      s"post-stage redaction missing: ${texts.toSeq}")
  }

  test("forget drops the doc from the snapshot and future admission") {
    val base = corpus(doc(1, "alpha"), doc(2, "beta"), doc(4, "gamma"))
    val root = Spill.newPath(spark) + "/fstate"
    assert(ids(IncrementalCuration.bootstrap(base, pipeline, root))
      == Set(1L, 2L, 4L))
    IncrementalCuration.forget(spark, Seq(1L), root, version = 1L)
    assert(ids(IncrementalCuration.snapshot(spark, root)) == Set(2L, 4L))
    val delta = corpus(
      doc(10, "alpha"), // twin of the FORGOTTEN doc -> must admit
      doc(11, "beta"),  // twin of a live doc -> must still drop
      doc(12, "alpha")) // second twin -> drops against admitted 10
    val snap = IncrementalCuration.refresh(delta, root, version = 2L)
    assert(ids(snap) == Set(2L, 4L, 10L), s"got ${ids(snap)}")
  }

  test("forget replay is idempotent") {
    val root = Spill.newPath(spark) + "/frstate"
    IncrementalCuration.bootstrap(
      corpus(doc(1, "alpha"), doc(2, "beta")), pipeline, root)
    IncrementalCuration.forget(spark, Seq(1L), root, version = 1L)
    IncrementalCuration.forget(spark, Seq(1L), root, version = 1L)
    assert(ids(IncrementalCuration.snapshot(spark, root)) == Set(2L))
    // the replay reused its marker-pinned slot: exactly ONE forget
    // slot exists, and the replay did not bump the refresh offset twice
    assert(IncrementalCuration.versionOffset(spark, root) == 1L)
    // forgets live in their own sequence: a forget version NUMERICALLY
    // equal to an already-written refresh version is fine — it
    // allocates its own slot above everything used
    IncrementalCuration.refresh(corpus(doc(10, "delta"))
      .toDF("doc_id", "text"), root, version = 2L)
    IncrementalCuration.forget(spark, Seq(2L), root, version = 2L)
    assert(ids(IncrementalCuration.snapshot(spark, root)) == Set(10L))
  }

  test("a crashed forget (marker only) neither wedges refreshes nor leaks its slot") {
    val root = Spill.newPath(spark) + "/cfstate"
    IncrementalCuration.bootstrap(corpus(doc(1, "alpha")), pipeline, root)
    // simulate a forget that died between its slot marker and its data
    // write (the bump -> marker -> data order): offset bumped, marker
    // file exists claiming slot 1, forget dir holds NO __v= partitions
    import org.apache.hadoop.fs.Path
    val fdir = s"$root/forget"
    val fs = new Path(fdir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(fdir))
    val off = fs.create(new Path(s"$root/version_offset"), true)
    off.write("1".getBytes("UTF-8")); off.close()
    val out = fs.create(new Path(s"$fdir/_slot_of_1"), true)
    out.write("1".getBytes("UTF-8")); out.close()
    // refreshes must keep working (forgottenBefore tolerates the
    // data-less dir instead of failing parquet schema inference)...
    val snap = IncrementalCuration.refresh(
      corpus(doc(10, "beta")), root, version = 1L)
    assert(ids(snap) == Set(1L, 10L))
    // ...and a DIFFERENT forget must not be handed the crashed one's
    // marker-claimed slot (its replay would overwrite that work-list)
    IncrementalCuration.forget(spark, Seq(10L), root, version = 2L)
    val slotOf = { v: Long =>
      val in = fs.open(new Path(s"$fdir/_slot_of_$v"))
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
    assert(slotOf(2L) != slotOf(1L),
      s"forget 2 reused crashed forget 1's claimed slot ${slotOf(1L)}")
    // the crashed forget replays to completion on its own slot
    IncrementalCuration.forget(spark, Seq(1L), root, version = 1L)
    assert(ids(IncrementalCuration.snapshot(spark, root)).isEmpty)
  }

  test("purgeForgotten erases index and log content, preserving behavior") {
    val base = corpus(doc(1, "alpha"), doc(2, "beta"), doc(4, "gamma"))
    val root = Spill.newPath(spark) + "/pgstate"
    IncrementalCuration.bootstrap(base, pipeline, root)
    IncrementalCuration.forget(spark, Seq(1L), root, version = 1L)
    val snap2 = IncrementalCuration.refresh(
      corpus(doc(10, "alpha")), root, version = 2L)
    assert(ids(snap2) == Set(2L, 4L, 10L))

    IncrementalCuration.purgeForgotten(spark, root)
    // physical erasure: no band/shingle row for id 1 anywhere on disk,
    // and the log's only trace of doc 1 is a contentless tombstone
    assert(spark.read.parquet(s"$root/neardup/bands")
      .where(col("id") === 1L).isEmpty)
    assert(spark.read.parquet(s"$root/neardup/shingles")
      .where(col("id") === 1L).isEmpty)
    val logRows = spark.read.option("basePath", s"$root/log")
      .parquet(s"$root/log").where(col("doc_id") === 1L)
      .select("text", "__dead").collect()
    assert(logRows.forall(r => r.isNullAt(0) && r.getBoolean(1)),
      s"forgotten content survived the purge: ${logRows.toSeq}")

    // the snapshot is unchanged and admission still works — and the
    // caller's NATURAL next sequential version (3, continuing 1, 2)
    // keeps working: the purge bumped the lineage's version offset, so
    // version 3 resolves past the compaction fold instead of wedging
    // on it (the pre-fix failure mode for a batchId-sequenced stream)
    assert(ids(IncrementalCuration.snapshot(spark, root)) == Set(2L, 4L, 10L))
    val fold = MergeLog.versions(spark, s"$root/log").max
    val snap3 = IncrementalCuration.refresh(
      corpus(doc(20, "alpha")), root, version = 3L)
    assert(ids(snap3) == Set(2L, 4L, 10L),
      "post-purge admission must still drop a twin of admitted doc 10")
    assert(MergeLog.versions(spark, s"$root/log").max > fold,
      "the continued refresh must land ABOVE the fold, not on it")
  }

  test("purge does not wedge a batchId-sequenced lineage (offset survives further purges)") {
    // the StreamingCuration contract: versions are batchId+1, strictly
    // sequential, with no way to consult MergeLog.nextVersion — a purge
    // mid-lineage must be transparent to the sequence
    val root = Spill.newPath(spark) + "/seqstate"
    IncrementalCuration.bootstrap(corpus(doc(1, "alpha")), pipeline, root)
    IncrementalCuration.refresh(corpus(doc(10, "beta")), root, version = 1L)
    IncrementalCuration.forget(spark, Seq(1L), root, version = 2L)
    IncrementalCuration.purgeForgotten(spark, root)
    // sequence continues: 3, 4 — and a second purge mid-sequence
    IncrementalCuration.refresh(corpus(doc(20, "gamma")), root, version = 3L)
    IncrementalCuration.forget(spark, Seq(10L), root, version = 4L)
    IncrementalCuration.purgeForgotten(spark, root)
    val snap = IncrementalCuration.refresh(
      corpus(doc(30, "delta")), root, version = 5L)
    assert(ids(snap) == Set(20L, 30L))
    // replaying the last version (crash recovery) still works post-purge
    val replay = IncrementalCuration.refresh(
      corpus(doc(30, "delta")), root, version = 5L)
    assert(ids(replay) == Set(20L, 30L))
  }

  test("an interrupted purge swap is finished by the next reader") {
    val base = corpus(doc(1, "alpha"), doc(2, "beta"))
    val root = Spill.newPath(spark) + "/crstate"
    IncrementalCuration.bootstrap(base, pipeline, root)
    val idx = s"$root/neardup"
    // construct the crash state by hand: complete purged side dirs +
    // the ready marker, live dirs still holding the old rows
    import org.apache.hadoop.fs.Path
    val fs = new Path(idx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(s"$idx/bands").where(col("id") =!= 1L)
      .write.parquet(s"$idx/bands__purged")
    spark.read.parquet(s"$idx/shingles").where(col("id") =!= 1L)
      .write.parquet(s"$idx/shingles__purged")
    fs.create(new Path(s"$idx/__purge_ready"), false).close()
    // any read path (here: a preview) must finish the swap first
    IncrementalCuration.previewRefresh(corpus(doc(10, "gamma")), root)
    assert(!fs.exists(new Path(s"$idx/__purge_ready")))
    assert(!fs.exists(new Path(s"$idx/bands__purged")))
    assert(spark.read.parquet(s"$idx/bands").where(col("id") === 1L).isEmpty)
    assert(spark.read.parquet(s"$idx/shingles").where(col("id") === 1L).isEmpty)
  }
}
