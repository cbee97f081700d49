package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Extension operators (SURVEY §2.11): dedup, similarity, text. */
class LlmOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("exact dedup keeps one canonical row per duplicated text") {
    val dup = docs.select("doc_id", "text")
      .unionByName(docs.select(($"doc_id" + 1000000).as("doc_id"), $"text"))
    val kept = Dedup.dropExactDuplicates(dup, "text", "doc_id")
    assert(kept.count() == docs.count())       // one survivor per text
    assert(kept.where($"doc_id" >= 1000000).count() == 0) // min id wins
    val groups = Dedup.exactGroups(dup, "text", "doc_id")
    assert(groups.where($"n_dups" =!= 2).count() == 0)
  }

  test("incremental dedup: delta copies rejected, fresh docs admitted") {
    val reference = docs.select("doc_id", "text")
    val copies = reference.where($"doc_id" % 10 === 0)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
    val fresh = reference.where($"doc_id" % 10 === 1)
      .select(($"doc_id" + 3000000L).as("doc_id"),
        translate($"text", "aeiou", "bcdfg").as("text"))
    val delta = copies.unionByName(fresh)
    val admitted = Dedup.dropNearDuplicatesAgainst(delta, reference,
      "text", "doc_id", threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    // every verbatim copy is a near-dup of its source -> rejected;
    // every rewritten doc shares no shingle with the reference -> admitted
    assert(copies.select("doc_id").as[Long].collect().forall(!admitted.contains(_)))
    assert(fresh.select("doc_id").as[Long].collect().forall(admitted.contains))
    // and the pair finder reports each copy matching its own source
    val pairs = Dedup.nearDuplicatesAgainst(delta, reference,
      "text", "doc_id", 0.9)
    val selfPairs = pairs.where($"id_delta" - 2000000L === $"id_ref")
    assert(selfPairs.count() == copies.count())
    assert(selfPairs.where($"jaccard" =!= 1.0).count() == 0)
  }

  test("near-dup index: query equals the batch operator; admission loop works") {
    val reference = docs.select("doc_id", "text")
    val delta = reference.where($"doc_id" % 10 === 0)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"text")
      .unionByName(reference.where($"doc_id" % 10 === 1)
        .select(($"doc_id" + 3000000L).as("doc_id"),
          translate($"text", "aeiou", "bcdfg").as("text")))
    val path = Spill.newPath(spark) + "/ndidx"
    NearDupIndex.build(reference, path, "text", "doc_id")
    // identical pipelines on identical inputs (same signature
    // expression, same shingle hashing, deterministic parquet
    // round-trip) — the index must reproduce the batch operator's
    // pairs EXACTLY, jaccard included
    val viaIndex = NearDupIndex.query(spark, path, delta, "text", "doc_id", 0.9)
    val batch = Dedup.nearDuplicatesAgainst(delta, reference, "text", "doc_id", 0.9)
    assert(viaIndex.exceptAll(batch).isEmpty && batch.exceptAll(viaIndex).isEmpty)
    assert(viaIndex.count() > 0)
    // admission loop: append the admitted docs, then re-submitting the
    // SAME admitted docs under new ids must now match their indexed
    // selves (jaccard 1.0)
    val admittedIds = delta.join(
      viaIndex.select($"id_delta".as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti").select("doc_id").as[Long].collect().toSet
    val admitted = delta.where($"doc_id".isin(admittedIds.toSeq: _*))
    NearDupIndex.append(admitted, path, "text", "doc_id")
    val resub = admitted.select(($"doc_id" + 5000000L).as("doc_id"), $"text")
    val rematch = NearDupIndex.query(spark, path, resub, "text", "doc_id", 0.9)
      .where($"id_delta" - 5000000L === $"id_ref")
    assert(rematch.count() == admitted.count(),
      "every re-submitted admitted doc must match its indexed self")
  }

  test("int8Centroids: exact sums are partitioning-invariant; mismatched dims fail") {
    val vecs = (0L until 500L)
      .map(i => (i % 7, Seq.fill(16)(((i * 31 + 17) % 255 - 127).toInt)))
      .toDF("grp", "q8")
    val a = Similarity.int8Centroids(vecs, "grp", "q8")
      .select($"grp", $"sum_q8", $"n").as[(Long, Seq[Long], Long)]
      .collect().toSet
    val b = Similarity.int8Centroids(vecs.repartition(13), "grp", "q8")
      .select($"grp", $"sum_q8", $"n").as[(Long, Seq[Long], Long)]
      .collect().toSet
    assert(a == b, "integer sums must not depend on partial-agg order")
    assert(a.size == 7 && a.forall(_._2.length == 16))
    // independent reference fold for one group
    val g0 = (0L until 500L).filter(_ % 7 == 0)
      .map(i => Seq.fill(16)(((i * 31 + 17) % 255 - 127).toLong))
    val expected = g0.reduce((x, y) => x.zip(y).map { case (p, q) => p + q })
    assert(a.find(_._1 == 0L).get._2 == expected)
    val bad = Seq((1L, Seq(1, 2, 3)), (1L, Seq(1, 2))).toDF("grp", "q8")
    intercept[org.apache.spark.SparkException] {
      Similarity.int8Centroids(bad, "grp", "q8").collect()
    }
  }

  test("paragraph boilerplate removal: excise, threshold, order, all-boiler drop") {
    val rows = Seq(
      // "ad" appears in 3 of 4 docs (freq 3 >= 3) -> boilerplate;
      // "promo" in 2 (freq 2 < 3) -> kept
      (1L, "ad\n\nalpha text\n\npromo"),
      (2L, "beta one\n\nad\n\nbeta two"),
      // within-doc repeat counts ONCE toward doc frequency
      (3L, "ad\n\nad\n\ngamma text\n\npromo"),
      // every paragraph boilerplate -> the document drops entirely
      (4L, "ad")
    ).toDF("doc_id", "text")
    val out = Dedup.dropRepeatedParagraphs(rows, "text", "doc_id", minDocFreq = 3)
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "alpha text\n\npromo",
      2L -> "beta one\n\nbeta two",
      3L -> "gamma text\n\npromo"))
  }

  test("minhash LSH finds planted near-duplicates") {
    val planted = docs.where($"doc_id" % 50 === 0)
      .withColumn("doc_id", $"doc_id" + 1000000L)
    val corpus = docs.select("doc_id", "text")
      .unionByName(planted.select("doc_id", "text"))
    val pairs = Dedup.minhashNearDuplicates(corpus, "text", "doc_id", 0.9)
      .where($"id_b" - $"id_a" === 1000000L).collect()
    val expected = docs.where($"doc_id" % 50 === 0).count()
    assert(pairs.length == expected, s"found ${pairs.length}, want $expected")
    assert(pairs.forall(_.getAs[Double]("jaccard") == 1.0))
  }

  /** Run `body` under both connectedComponents paths: the driver-side
    * union-find fast path (default) and the distributed label
    * propagation (forced by zeroing the local threshold).
    */
  private def bothCcPaths(body: => Unit): Unit = {
    body
    spark.conf.set("spark.graft.cc.localThreshold", "0")
    try body finally spark.conf.unset("spark.graft.cc.localThreshold")
  }

  test("connectedComponents: chains, triangles, isolated pairs") {
    bothCcPaths {
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),       // 4-chain
          (10L, 11L), (11L, 12L), (10L, 12L),             // triangle
          (20L, 21L))                                     // isolated pair
        .toDF("id_a", "id_b")
      val comp = Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comp == Map(
        1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L,
        20L -> 20L, 21L -> 20L))
      // ids only in id_b still get labels (edges are symmetrized)
      assert(comp.contains(4L) && comp.contains(21L))
    }
  }

  test("keep-best drop: highest score survives per cluster, ties break to min id") {
    bothCcPaths {
      val docs = Seq(
        (1L, 5L), (2L, 9L), (3L, 9L),  // cluster {1,2,3}: 2 and 3 tie at 9
        (10L, 1L), (11L, 7L),          // cluster {10,11}: 11 wins
        (20L, 0L))                     // unpaired: survives regardless
        .toDF("doc_id", "quality")
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
      val kept = Dedup.dropDuplicatesByPairsKeepBest(
        docs, pairs, "doc_id", "quality")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(2L, 11L, 20L), s"got $kept")
      // contrast: the min-id policy keeps 1 and 10
      val minId = Dedup.dropDuplicatesByPairs(docs, pairs, "doc_id")
        .select("doc_id").as[Long].collect().toSet
      assert(minId == Set(1L, 10L, 20L), s"got $minId")
    }
  }

  test("connectedComponents matches an in-memory union-find on random graphs") {
    bothCcPaths {
      val rnd = new scala.util.Random(23)
      for (round <- 1 to 3) {
        val n = 60
        val edges = Seq.fill(50)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
          .filter { case (a, b) => a != b }
          .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
          .distinct
        // reference union-find: the larger root always attaches under the
        // smaller, so each tree's final root IS the component minimum
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(v => v -> find(v.toInt).toLong).toMap
        val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"round $round: $got vs $want")
      }
    }
  }

  test("dropNearDuplicates keeps exactly the canonical doc per cluster") {
    val planted = docs.where($"doc_id" % 50 === 0)
      .withColumn("doc_id", $"doc_id" + 1000000L)
    val corpus = docs.select("doc_id", "text")
      .unionByName(planted.select("doc_id", "text"))
    val kept = Dedup.dropNearDuplicates(corpus, "text", "doc_id", 0.9)
    // every planted copy (higher id than its original) is dropped
    assert(kept.where($"doc_id" >= 1000000L).count() == 0)
    // exactly the non-canonical cluster members are gone (the corpus
    // also has natural near-dup clusters — those lose members too)
    val comp = Dedup.connectedComponents(
      Dedup.minhashNearDuplicates(corpus, "text", "doc_id", 0.9))
    assert(kept.count() ==
      corpus.count() - comp.where($"member" =!= $"canonical").count())
    // and one representative per cluster survives
    assert(comp.select($"canonical".as("doc_id")).distinct()
      .join(kept, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("dropDuplicatesByPairs composes with simhash pairs") {
    val planted = docs.where($"doc_id" % 50 === 0)
      .withColumn("doc_id", $"doc_id" + 1000000L)
    val corpus = docs.select("doc_id", "text")
      .unionByName(planted.select("doc_id", "text"))
    val pairs = Dedup.simhashNearDuplicates(corpus, "text", "doc_id", maxHamming = 0)
    val kept = Dedup.dropDuplicatesByPairs(corpus, pairs, "doc_id")
    // every planted copy (higher id than its original) is dropped and
    // the kept set is exactly corpus minus non-canonical members
    assert(kept.where($"doc_id" >= 1000000L).count() == 0)
    val comp = Dedup.connectedComponents(pairs)
    assert(kept.count() ==
      corpus.count() - comp.where($"member" =!= $"canonical").count())
  }

  test("simhash of identical docs is identical; hamming is 0") {
    val sig = docs.limit(20).select($"doc_id",
      Dedup.simhash64($"text").as("s1"),
      Dedup.simhash64(concat($"text", lit(""))).as("s2"))
    assert(sig.where(Dedup.hamming64($"s1", $"s2") =!= 0).count() == 0)
  }

  test("brute-force top-k: self is rank 1 with score 1") {
    val queries = emb.where($"vec_id" % 200 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val top = Similarity.bruteForceTopK(emb, queries, 5)
    val self = top.where($"rank" === 1)
    assert(self.where($"q_id" =!= $"vec_id").count() == 0)
    assert(self.where(abs($"score" - 1.0) > 1e-9).count() == 0)
  }

  test("int8-scored top-k with float rescore: recall >= 0.95, rescored scores exact") {
    val queries = emb.where($"vec_id" % 200 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select($"q_id", $"vec_id", $"score").as[(Long, Long, Double)].collect()
    val got = Similarity.bruteForceTopKInt8(emb, queries, 10, rescoreFactor = 40)
      .select($"q_id", $"vec_id", $"score").as[(Long, Long, Double)].collect()
    val exactSet = exact.map(r => (r._1, r._2)).toSet
    val gotSet = got.map(r => (r._1, r._2)).toSet
    val recall = (exactSet & gotSet).size.toDouble / exactSet.size
    assert(recall >= 0.95, s"recall@10 $recall below the 0.95 gate")
    // surviving pairs carry the EXACT float score (rescoring is the
    // same kernel as the baseline — bit-identical, not approximate)
    val exactScore = exact.map(r => (r._1, r._2) -> r._3).toMap
    got.filter(r => exactSet.contains((r._1, r._2))).foreach { r =>
      assert(exactScore((r._1, r._2)) == r._3,
        s"rescored score must be bit-identical for (${r._1}, ${r._2})")
    }
    // a degenerate pool (rescoreFactor covering the whole corpus) is
    // exactly the baseline
    val full = Similarity.bruteForceTopKInt8(emb, queries, 10,
      rescoreFactor = 1000)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    assert(full == exactSet, "pool ⊇ corpus ⇒ identical to exact baseline")
  }

  test("fused quantize-pack is value-identical to quantizeInt8 + pack") {
    // the fused codegen'd loop must reproduce the HOF quantizer exactly
    // (same IEEE ops in the same order) — the int8 scan path's
    // correctness rests on this equivalence
    val viaHof = Similarity.quantizeInt8(emb, "embedding")
      .select($"vec_id",
        graft.functions.DotProductExpr.packInt8($"embedding_q8").as("p"))
    val fused = emb.select($"vec_id",
      graft.functions.DotProductExpr.quantizePackInt8($"embedding").as("p"))
    val mismatches = viaHof.alias("a").join(fused.alias("b"), "vec_id")
      .where(col("a.p") =!= col("b.p")).count()
    assert(mismatches == 0, s"$mismatches packed vectors differ")
  }

  test("SWAR packed dot equals the array<int> integer dot, all input forms") {
    import graft.functions.DotProductExpr.{dot, int8PackedDot, int8PackedLongs, quantizePackInt8}
    // reference: dotII over the quantizeInt8 array<int> vectors of two
    // distinct documents' embeddings; SWAR: the packed-lane kernel over
    // each of its three accepted input forms — binary, array<int>, raw
    // float (fused). Dim 64 exercises the exact-multiple-of-8 path; the
    // sliced dim-61 variant exercises tail zero-padding.
    val q = Similarity.quantizeInt8(emb, "embedding")
      .select($"vec_id", $"embedding", $"embedding_q8",
        quantizePackInt8($"embedding").as("b8"),
        slice($"embedding_q8", 1, 61).as("q61"))
    val pairs = q.alias("a").join(q.alias("b"),
      col("a.vec_id") + 1 === col("b.vec_id"))
    val bad = pairs.select(
      dot(col("a.embedding_q8"), col("b.embedding_q8")).as("ref"),
      dot(col("a.q61"), col("b.q61")).as("ref61"),
      int8PackedDot(int8PackedLongs(col("a.b8")),
        int8PackedLongs(col("b.b8"))).as("viaB8"),
      int8PackedDot(int8PackedLongs(col("a.embedding_q8")),
        int8PackedLongs(col("b.embedding_q8"))).as("viaQ8"),
      int8PackedDot(int8PackedLongs(col("a.embedding")),
        int8PackedLongs(col("b.embedding"))).as("viaF"),
      int8PackedDot(int8PackedLongs(col("a.q61")),
        int8PackedLongs(col("b.q61"))).as("tail61"))
      .where(col("viaB8") =!= col("ref") || col("viaQ8") =!= col("ref") ||
        col("viaF") =!= col("ref") || col("tail61") =!= col("ref61"))
      .count()
    assert(bad == 0, s"$bad SWAR dots diverge from the integer reference")
  }

  test("IVF top-k achieves reasonable recall vs brute force") {
    val queries = emb.where($"vec_id" % 200 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, queries, 5, nCells = 8, nProbe = 4,
      kmeansIters = 1)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall") // nProbe=half the cells
  }

  test("persisted IVF index: build+query equals ivfTopK; scan prunes to probed cells") {
    val queries = emb.where($"vec_id" % 200 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val path = Spill.newPath(spark) + "/ivfidx"
    IvfIndex.build(emb, path, nCells = 8, kmeansIters = 2)
    val viaIndex = IvfIndex.query(spark, path, queries, 5, nProbe = 4)
    val direct = Similarity.ivfTopK(emb, queries, 5, nCells = 8, nProbe = 4,
      kmeansIters = 2)
    // both paths are deterministic compositions of the SAME kernels on
    // the same values (the parquet round-trip preserves floats/doubles
    // bit-exactly, dots are sequential folds, ties break by id), so the
    // outputs must be identical — not merely similar. This is a safe
    // exact float compare: nothing here depends on partial-agg order.
    assert(viaIndex.exceptAll(direct).isEmpty && direct.exceptAll(viaIndex).isEmpty)
    assert(viaIndex.count() == direct.count() && direct.count() > 0)
    // the vectors scan must carry the probed cells as a PARTITION
    // filter (pruned directories), not a post-scan predicate
    val plan = viaIndex.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(l => l.contains("cell_id") && !l.contains("PartitionFilters: []")),
      s"vectors scan is not partition-pruned:\n$plan")
  }

  test("IVF index append: delta routes through frozen centroids exactly") {
    val queries = emb.where($"vec_id" % 200 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val half1 = emb.where($"vec_id" % 2 === 0)
    val half2 = emb.where($"vec_id" % 2 =!= 0)
    val path = Spill.newPath(spark) + "/ivfappend"
    IvfIndex.build(half1, path, nCells = 8, kmeansIters = 2)
    IvfIndex.append(half2, path)
    // probing ALL cells is exact search: every indexed vector gets
    // scored with the same cosine kernel as the brute-force baseline,
    // so if the appended delta landed intact (and nothing duplicated
    // or dropped), the outputs must be IDENTICAL — a lost or mangled
    // appended vector would change some query's top-5
    val allCells = IvfIndex.query(spark, path, queries, 5, nProbe = 8)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
    assert(allCells.exceptAll(exact).isEmpty && exact.exceptAll(allCells).isEmpty)
    assert(allCells.count() > 0)
    // and a real (pruned) probe still returns k rows per query
    val pruned = IvfIndex.query(spark, path, queries, 5, nProbe = 3)
    assert(pruned.groupBy("q_id").count().where($"count" =!= 5).count() == 0)
  }

  test("IVF Lloyd iterations stop at convergence: large cap equals its own rerun") {
    val queries = emb.where($"vec_id" % 200 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    // kmeansIters is a cap: once centroids stop moving the loop exits,
    // so a generous cap must be deterministic (and not loop 50 times —
    // this would take minutes without the stop)
    def run() = Similarity.ivfTopK(emb, queries, 5, nCells = 8, nProbe = 4,
      kmeansIters = 50, kmeansTol = 1e-4)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val a = run()
    assert(a == run() && a.nonEmpty)
  }

  test("language id classifies planted stopword-bearing texts") {
    // (the synthetic corpus is English-ish word soup for every lang
    // label, so plant real samples)
    val samples = Seq(
      ("the cat sat on the mat and the dog is in a house", "en"),
      ("el perro y la casa de un hombre que es grande", "es"),
      ("le chat est dans la maison et un chien", "fr"),
      ("der hund und die katze ist ein tier zu haus", "de"),
      ("我 有 一 个 梦想 和 不 同 的 是 在 了", "zh"),
      ("xyzzy plugh quux", "und")).toDF("text", "want")
    val got = samples.select($"want", TextAnalysis.languageId($"text").as("pred"))
    assert(got.where($"want" =!= $"pred").count() == 0)
  }

  test("text stats are sane") {
    val st = TextAnalysis.analyze(docs.limit(50), "text")
    assert(st.where($"n_words" <= 0).count() == 0)
    assert(st.where($"quality" < 0 || $"quality" > 1).count() == 0)
    assert(st.where(length($"fingerprint") =!= 32).count() == 0)
    assert(st.where($"approx_tokens" < $"n_words").count() == 0)
  }

  test("hot-bucket guard bounds a degenerate duplicated document") {
    // 4000 copies of ONE text: without the cap the band self-join emits
    // ~bands * 4000^2 = 256M candidate pairs; with cap c it is bounded
    // by bands * c^2. The planted distinct near-dup pairs must survive.
    val boiler = spark.range(4000)
      .select(($"id" + 5000000L).as("doc_id"),
        lit("the same boilerplate footer text repeated on every page of the site")
          .as("text"))
    val normal = docs.limit(50).select("doc_id", "text")
    val planted = normal.where($"doc_id" % 10 === 0)
      .withColumn("doc_id", $"doc_id" + 1000000L)
    val corpus = normal.unionByName(planted).unionByName(boiler)
    spark.conf.set("spark.graft.lsh.maxBucket", "100")
    try {
      val pairs = Dedup.minhashNearDuplicates(corpus, "text", "doc_id", 0.9)
      // bounded: boilerplate contributes at most C(100,2) pairs
      val boilerPairs = pairs.where($"id_a" >= 5000000L).count()
      assert(boilerPairs <= 100L * 99 / 2, s"boiler pairs $boilerPairs")
      // recall kept for normal docs (ids below the cap threshold)
      val found = pairs.where($"id_b" - $"id_a" === 1000000L).count()
      assert(found == planted.count(), s"planted recall $found")

      val sPairs = Dedup.simhashNearDuplicates(corpus, "text", "doc_id")
      assert(sPairs.where($"id_a" >= 5000000L).count() <= 100L * 99 / 2)
    } finally spark.conf.set("spark.graft.lsh.maxBucket", "1000")
  }

  test("embedding hot-bucket guard bounds a degenerate constant vector") {
    val constVec = array((0 until 64).map(i => lit(0.5f)): _*)
    val boiler = spark.range(1000)
      .select(($"id" + 5000000L).as("vec_id"), constVec.as("embedding"))
    val corpus = emb.limit(100).select("vec_id", "embedding").unionByName(boiler)
    spark.conf.set("spark.graft.lsh.maxBucket", "50")
    try {
      val pairs = Similarity.embeddingNearDuplicates(corpus, 0.999, dim = 64)
      val boilerPairs = pairs.where($"id_a" >= 5000000L).count()
      assert(boilerPairs <= 50L * 49 / 2, s"boiler pairs $boilerPairs")
    } finally spark.conf.set("spark.graft.lsh.maxBucket", "1000")
  }

  test("semDedup keeps one min-id survivor per semantic component") {
    val base = emb.limit(100).select("vec_id", "embedding")
    val corpus = base
      .unionByName(base.where($"vec_id" % 10 === 0)
        .withColumn("vec_id", $"vec_id" + 1000000L))
      .unionByName(base.where($"vec_id" % 20 === 0)
        .withColumn("vec_id", $"vec_id" + 2000000L))
    val kept = Similarity.semDedup(corpus, threshold = 0.9, dim = 64)
      .select("vec_id").as[Long].collect().toSet
    // every original survives (it IS the min of its component);
    // every planted copy drops — including the 3-member components
    assert(kept == base.select("vec_id").as[Long].collect().toSet,
      s"survivors: ${kept.size}")
  }

  test("dot-product expression matches the interpreted HOF fold bit for bit") {
    val hof = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0d), (acc, v) => acc + v)
    val pairs = emb.limit(200).select($"vec_id", $"embedding")
      .crossJoin(emb.limit(3).select($"embedding".as("other")))
    val diff = pairs.select(
      Similarity.dot($"embedding", $"other").as("native"),
      hof($"embedding", $"other").as("interp"))
      .where($"native" =!= $"interp")
    assert(diff.count() == 0)
  }

  test("top-k aggregator matches the window formulation row for row") {
    val queries = emb.where($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val top = Similarity.bruteForceTopK(emb, queries, 7)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q_id").orderBy($"score".desc, $"vec_id".asc)
    val scored = emb.join(broadcast(queries))
      .select($"q_id", $"vec_id",
        (Similarity.dot($"embedding", $"q_vec") /
          (Similarity.l2Norm($"embedding") * Similarity.l2Norm($"q_vec"))).as("score"))
      .withColumn("rank", row_number().over(w)).where($"rank" <= 7)
    assert(top.count() == scored.count())
    assert(top.join(scored, Seq("q_id", "vec_id", "rank"), "left_anti").count() == 0)
  }

  test("randomProject matches an independent Scala fold; deterministic; JL-sane") {
    val dim = 16; val outDim = 8
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i =>
      i -> Array.fill(dim)(rnd.nextFloat() * 2f - 1f).toSeq).toMap
    val df = vecs.toSeq.map { case (i, v) => (i, v) }.toDF("vec_id", "embedding")

    val got = Similarity.randomProject(df, "embedding", "vec_id", dim, outDim)
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // independent fold over the same md5 sign matrix
    val mat = Similarity.signProjectionMatrix(dim, outDim, "jl")
    for ((id, v) <- vecs; j <- 0 until outDim) {
      val want = v.zip(mat(j)).map { case (x, s) => x.toDouble * s }.sum
      assert(math.abs(got(id)(j) - want) < 1e-5, s"vec $id dim $j")
    }
    // partitioning-invariant
    val got13 = Similarity.randomProject(
        df.repartition(13), "embedding", "vec_id", dim, outDim)
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(got == got13)
    // JL sanity: projected squared norms concentrate around outDim/inDim
    // × input (±1 rows have norm² = inDim per row, E[‖Px‖²] = outDim·‖x‖²)
    val ratios = vecs.map { case (id, v) =>
      val in = v.map(x => x.toDouble * x).sum
      got(id).map(p => p * p).sum / (outDim * in)
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 2.0, s"JL norm-ratio mean off: $mean")
  }

  test("dimStats: exact integer sufficient stats, partition-invariant, matches local fold") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 200).map(_ =>
      Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    val df = vecs.map(v => Tuple1(v)).toDF("embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Similarity.dimStats(d, "embedding")
        .select("dim", "n", "sum_q", "sumsq_q")
        .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = run(df)
    assert(run(df.repartition(7)) == got, "integer sums are order-free")
    // local reference on the same 1e-4 grid
    val want = (0 until 8).map { d =>
      val qs = vecs.map(v => math.floor(v(d).toDouble * 10000 + 0.5).toLong)
      (d, qs.size.toLong, qs.sum, qs.map(q => q * q).sum)
    }
    assert(got == want)
    val stds = graft.operators.Similarity.dimStats(df, "embedding")
      .select("std").as[Double].collect()
    // uniform[-1,1] has std ~ 0.577
    assert(stds.forall(s => s > 0.45 && s < 0.7), stds.mkString(","))
  }
}
