package graft

import graft.operators.{CurationPipeline, CurationStage}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Declarative curation-pipeline config: generator-based JSON
  * round-trip (the [[ConfigPropertySpec]] posture — configs are data)
  * and the runner's composition semantics over a constructed corpus.
  */
class CurationPipelineSpec extends SparkTestBase {
  import CurationStage._
  import spark.implicits._

  private val genStage: Gen[CurationStage] = Gen.oneOf(
    for {
      a <- Gen.chooseNum(1, 500); b <- Gen.chooseNum(1000, 200000)
      c <- Gen.chooseNum(0, 5)
    } yield Quality(a, b, c),
    for {
      n <- Gen.chooseNum(1, 5); f <- Gen.chooseNum(1, 99)
    } yield Repetition(n, f / 100.0),
    for {
      t <- Gen.chooseNum(50, 99); o <- Gen.oneOf(true, false)
    } yield NearDupDrop(t / 100.0, o),
    Gen.const(PiiRedact),
    for {
      k <- Gen.chooseNum(2, 9); w <- Gen.chooseNum(2, 9)
      f <- Gen.chooseNum(0, 99)
    } yield Decontaminate(k, w, f / 100.0),
    for {
      mdf <- Gen.chooseNum(2L, 1000L)
      sep <- Gen.oneOf("\n\n", "\n", "|")
    } yield ParagraphDedup(mdf, sep),
    for {
      nd <- Gen.chooseNum(1, 4)
      ds <- Gen.listOfN(nd, Gen.oneOf("bad.example.com", "assets.net",
        "spam.io", "tracker.org"))
    } yield DomainBlock(ds.distinct),
    for {
      num <- Gen.chooseNum(1L, 9L); den <- Gen.chooseNum(10L, 9999L)
      salt <- Gen.oneOf("", "w", "epoch2")
    } yield SampleWeighted(num, den, salt),
    for {
      g <- Gen.chooseNum(1, 4); mc <- Gen.chooseNum(1L, 5L)
      num <- Gen.chooseNum(0L, 4L); den <- Gen.chooseNum(1L, 8L)
      ke <- Gen.oneOf(true, false)
    } yield LmCoverage(g, mc, num, den, ke),
    for {
      f <- Gen.chooseNum(1, 100); by <- Gen.oneOf("tokens", "quality")
    } yield TopFraction(f / 100.0, by),
    for {
      f <- Gen.chooseNum(1, 100); salt <- Gen.oneOf("", "epoch2")
    } yield Sample(f / 100.0, salt),
    for {
      nd <- Gen.chooseNum(1, 4); salt <- Gen.oneOf("", "epoch2")
      ps <- Gen.listOfN(nd, Gen.chooseNum(1L, 9L))
    } yield Mix("lang", ps.zipWithIndex.map { case (p, i) => s"d$i" -> p }, salt))

  private val genSplit: Gen[CurationStage] = for {
    n <- Gen.chooseNum(2, 4)
    salt <- Gen.oneOf("", "epoch2", "s3")
  } yield {
    val fracs = Seq.fill(n)(1.0 / n)
    Split(fracs.zipWithIndex.map { case (f, i) => s"part$i" -> f }, salt)
  }

  private val genTerminal: Gen[CurationStage] = Gen.oneOf(genSplit,
    Gen.chooseNum(1000L, 10000000L).map(PackTokens(_)),
    for {
      n <- Gen.chooseNum(1, 64); salt <- Gen.oneOf("", "epoch2")
    } yield Shuffle(n, salt),
    for {
      ct <- Gen.chooseNum(16, 512); ot <- Gen.chooseNum(0, 15)
    } yield Chunk(ct, ot))

  private val genPipeline: Gen[CurationPipeline] = for {
    mid <- Gen.listOfN(3, genStage).map(_.take(3))
    nMid <- Gen.chooseNum(0, 3)
    terminal <- Gen.option(genTerminal)
  } yield CurationPipeline("text", "doc_id",
    mid.take(math.max(nMid, if (terminal.isEmpty) 1 else 0)) ++ terminal.toSeq)

  test("JSON round-trip is the identity for generated pipelines (property)") {
    val prop = Prop.forAll(genPipeline) { p =>
      val back = CurationPipeline.fromJson(CurationPipeline.toJson(p))
      if (back != p) System.err.println(s"=== original ===\n$p\n=== reparsed ===\n$back")
      back == p
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("Split anywhere but last is rejected") {
    intercept[IllegalArgumentException] {
      CurationPipeline("text", "doc_id", Seq(
        Split(Seq("a" -> 0.5, "b" -> 0.5)), NearDupDrop(0.8)))
    }
    intercept[IllegalArgumentException] {
      CurationPipeline("text", "doc_id", Seq(
        PackTokens(1000), NearDupDrop(0.8)))
    }
    intercept[IllegalArgumentException] {
      CurationPipeline("text", "doc_id", Nil)
    }
  }

  test("runner: paragraph dedup, sample, and pack stages compose") {
    val corpus = (0L until 40L)
      .map(i => (i, s"shared banner line\n\ndocument body number $i"))
      .toDF("doc_id", "text")
    val out = CurationPipeline("text", "doc_id", Seq(
      ParagraphDedup(minDocFreq = 30), Sample(0.5), PackTokens(budget = 20)))
      .run(corpus)
      .as[(Long, String, Long)].collect()
    assert(out.forall(!_._2.contains("banner")), "boilerplate must be excised")
    assert(out.length > 10 && out.length < 30, s"~half kept, got ${out.length}")
    // bins are contiguous from 0 and fill in doc_id order
    val bins = out.sortBy(_._1).map(_._3)
    assert(bins.head == 0L && bins.sameElements(bins.sorted))
    assert(bins.distinct.sameElements(0L to bins.max))
  }

  test("runner: Chunk is terminal and chunks only the funnel's survivors") {
    val corpus = (0L until 20L)
      .map(i => (i, (0 until 30).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = CurationPipeline("text", "doc_id", Seq(
      Sample(0.5), Chunk(chunkTokens = 10, overlapTokens = 2)))
      .run(corpus)
    assert(out.columns.toSeq ==
      Seq("doc_id", "chunk_idx", "chunk_text", "n_tokens"))
    val perDoc = out.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    // 30 tokens at stride 8 → starts 0,8,16,24 → 4 chunks per survivor
    assert(perDoc.values.forall(_ == 4L), s"got $perDoc")
    assert(perDoc.size > 4 && perDoc.size < 16, "Sample(0.5) ran first")
    intercept[IllegalArgumentException] {
      CurationPipeline("text", "doc_id", Seq(Chunk(), Sample(0.5)))
    }
  }

  test("runner composes stages in order over a constructed corpus") {
    def wordsOf(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    val good = wordsOf("alpha", 60) + " the of and is"
    // words long enough to pass the mean-word-length rule, so the doc
    // reaches (and fails) the Repetition stage
    val chorus = (0 until 30).map(_ => "lala lala spam haha").mkString(" ") +
      " the of and is"
    val evalQuote = wordsOf("eval", 60) + " the of and is"
    val corpus = Seq(
      (1L, good), // survives everything
      (2L, wordsOf("short", 5)), // fails Quality (word count)
      (3L, chorus), // fails Repetition
      (4L, good), // near-dup of 1 → dropped (canonical min id survives)
      (5L, evalQuote), // decontaminated against the reference
      (6L, wordsOf("beta", 55) + " the of and is pii bob@example.com"))
      .toDF("doc_id", "text")
    val reference = Seq((100L, evalQuote)).toDF("ref_id", "text")
    val p = CurationPipeline("text", "doc_id", Seq(
      Quality(), Repetition(), NearDupDrop(0.8), Decontaminate(), PiiRedact))
    val out = p.run(corpus, Some((reference, "text", "ref_id")))
      .as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L, 6L), s"funnel survivors: ${out.keySet}")
    assert(out(6L).contains("<EMAIL>") && !out(6L).contains("bob@"),
      "PiiRedact must rewrite the text column in place")
    // with a Split tail the output is the (id, split) assignment
    val withSplit = CurationPipeline("text", "doc_id", Seq(
      Quality(), Split(Seq("train" -> 0.9, "test" -> 0.1))))
    val assigned = withSplit.run(corpus).as[(Long, String)].collect().toMap
    assert(assigned.keySet == Set(1L, 3L, 4L, 5L, 6L),
      "Quality-only survivors all get split assignments")
    assert(assigned.values.forall(Set("train", "test")),
      s"splits named by config: ${assigned.values.toSet}")
  }

  test("audit attributes each doc to the first dropping stage; kept set equals run's") {
    def wordsOf(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    val good = wordsOf("alpha", 60) + " the of and is"
    val chorus = (0 until 30).map(_ => "lala lala spam haha").mkString(" ") +
      " the of and is"
    val evalQuote = wordsOf("eval", 60) + " the of and is"
    val corpus = Seq(
      (1L, good),
      (2L, wordsOf("short", 5)),
      (3L, chorus),
      (4L, good),
      (5L, evalQuote),
      (6L, wordsOf("beta", 55) + " the of and is pii bob@example.com"))
      .toDF("doc_id", "text")
    val reference = Seq((100L, evalQuote)).toDF("ref_id", "text")
    val p = CurationPipeline("text", "doc_id", Seq(
      Quality(), Repetition(), NearDupDrop(0.8), Decontaminate(), PiiRedact))
    val ref = Some((reference, "text", "ref_id"))
    val audit = p.audit(corpus, ref).as[(Long, String)].collect().toMap
    assert(audit == Map(
      1L -> "kept",
      2L -> "0:quality",
      3L -> "1:repetition",
      4L -> "2:near_dup_drop",
      5L -> "3:decontaminate",
      6L -> "kept"), s"got $audit")
    // the audit is a partition of the input: every doc exactly once,
    // and its kept set is precisely run()'s output ids
    assert(audit.size == 6)
    val ran = p.run(corpus, ref).select("doc_id").as[Long].collect().toSet
    assert(audit.filter(_._2 == "kept").keySet == ran)
  }

  test("optimized reorders only commuting filters, never crosses fences, preserves results") {
    def wordsOf(p: String, i: Long, n: Int) =
      (0 until n).map(j => s"$p${i}_$j").mkString(" ")
    val corpus = (0L until 60L)
      .map(i => (i, wordsOf("tok", i, 60) + " the of and is"))
      .toDF("doc_id", "text")
    val authored = CurationPipeline("text", "doc_id", Seq(
      Repetition(), Quality(), Sample(0.5), // commuting run (pessimal order)
      PiiRedact, // fence: rewrites text
      DomainBlock(Seq("x.example.com")), Sample(0.9, "b"))) // second run
    val opt = authored.optimized(corpus)
    // permutation WITHIN each run; the fence holds its position
    assert(opt.stages.length == authored.stages.length)
    assert(opt.stages(3) == PiiRedact, s"fence moved: ${opt.stages}")
    assert(opt.stages.take(3).toSet ==
      Set[CurationStage](Repetition(), Quality(), Sample(0.5)))
    assert(opt.stages.drop(4).toSet ==
      Set[CurationStage](DomainBlock(Seq("x.example.com")), Sample(0.9, "b")))
    // Sample(0.5) MUST rank ahead of Repetition: its rank divides by
    // (1 − 0.5) while the nothing-dropping Repetition divides by the
    // 1e-9 floor — a selectivity gap, deterministic regardless of the
    // wall-clock noise in the tiny probe timings (Quality-vs-Repetition
    // order IS timing-decided here, so it is deliberately not pinned)
    assert(opt.stages.indexOf(Sample(0.5)) <
      opt.stages.indexOf(Repetition()), s"got ${opt.stages}")
    // result-identical
    val a = authored.run(corpus).orderBy("doc_id").collect().toSeq
    val b = opt.run(corpus).orderBy("doc_id").collect().toSeq
    assert(a == b)
    // a pipeline with no commuting pairs comes back unchanged
    val single = CurationPipeline("text", "doc_id",
      Seq(Quality(), PiiRedact, Sample(0.5)))
    assert(single.optimized(corpus).stages == single.stages)
    // reference-dependent stages are IN the commuting set: a
    // Decontaminate run reorders with the other filters and the
    // result still equals the authored order's
    val evalQuote = (0 until 60).map(j => s"eval$j").mkString(" ")
    val withRef = CurationPipeline("text", "doc_id", Seq(
      Decontaminate(), Quality(), Sample(0.5, "r")))
    val refCorpus = corpus.unionByName(Seq((999L, evalQuote)).toDF("doc_id", "text"))
    val ref = Some((Seq((1L, evalQuote)).toDF("ref_id", "text"), "text", "ref_id"))
    val optRef = withRef.optimized(refCorpus, ref)
    assert(optRef.stages.toSet == withRef.stages.toSet)
    assert(optRef.run(refCorpus, ref).orderBy("doc_id").collect().toSeq ==
      withRef.run(refCorpus, ref).orderBy("doc_id").collect().toSeq)
  }

  test("runner: Mix threads its domain column through reprojecting stages; Shuffle is terminal") {
    // 300 en / 100 zh, every doc carrying the same boilerplate banner;
    // Mix comes AFTER ParagraphDedup (which reprojects to (id, text)),
    // so the runner must thread `lang` through it
    val corpus = ((0L until 300L).map(i =>
        (i, s"site banner\n\nenglish body number $i", "en")) ++
      (1000L until 1100L).map(i =>
        (i, s"site banner\n\nchinese body number $i", "zh")))
      .toDF("doc_id", "text", "lang")
    val p = CurationPipeline("text", "doc_id", Seq(
      ParagraphDedup(minDocFreq = 300),
      Mix("lang", Seq("en" -> 1L, "zh" -> 1L)),
      Shuffle(nShards = 4)))
    val out = p.run(corpus).collect()
    assert(out.forall(!_.getAs[String]("text").contains("banner")))
    // zh (100 docs) binds a 1:1 mixture: ~100 en survive alongside 100 zh
    val byLang = out.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    assert(byLang("zh") == 100 && math.abs(byLang("en") - 100) < 40,
      s"mixture off: ${byLang.toMap}")
    // shard/pos assignment covers every surviving row exactly once
    assert(out.map(r => (r.getAs[Long]("shard_id"), r.getAs[Long]("pos")))
      .distinct.length == out.length)
    intercept[IllegalArgumentException] {
      CurationPipeline("text", "doc_id", Seq(Shuffle(4), Sample(0.5)))
    }
    intercept[IllegalArgumentException] {
      p.run(corpus.drop("lang"))
    }
  }

  test("a Decontaminate stage without a reference is rejected at run time") {
    val p = CurationPipeline("text", "doc_id", Seq(Decontaminate()))
    intercept[IllegalArgumentException] {
      p.run(Seq((1L, "a b c")).toDF("doc_id", "text"))
    }
    intercept[IllegalArgumentException] {
      CurationPipeline("text", "doc_id", Seq(LmCoverage()))
        .run(Seq((1L, "a b c")).toDF("doc_id", "text"))
    }
  }

  test("runner: TopFraction keeps the best-scored half by token count") {
    // 4 docs with strictly increasing token counts: top-half by
    // "tokens" must keep exactly the two longest
    val corpus = Seq(
      (1L, "one two"),
      (2L, "one two three four"),
      (3L, "one two three four five six"),
      (4L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val p = CurationPipeline("text", "doc_id",
      Seq(TopFraction(0.5, by = "tokens")))
    val kept = p.run(corpus).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L), s"kept: $kept")
    assert(p.run(corpus).columns.toSeq == Seq("doc_id", "text"),
      "the score scratch column must not leak")
    val json = CurationPipeline.toJson(p)
    assert(CurationPipeline.fromJson(json) == p)
    intercept[IllegalArgumentException] { TopFraction(0.5, by = "nope") }
  }

  test("runner: DomainBlock and LmCoverage stages compose with a reference") {
    val corpus = Seq(
      (1L, "the quick brown fox and the lazy dog run through the field"),
      (2L, "spam offer at https://deals.spam.io/buy now"),
      (3L, "zz qq xx vv kk jj pp ww")   // gibberish: no LM bigrams
    ).toDF("doc_id", "text")
    val reference = Seq(
      (100L, "the quick brown fox and the lazy dog"),
      (101L, "the quick brown fox and the lazy dog run through"),
      (102L, "run through the field")
    ).toDF("doc_id", "text")
    val p = CurationPipeline("text", "doc_id", Seq(
      DomainBlock(Seq("spam.io")),
      LmCoverage(n = 2, minCount = 2, minNum = 1, minDen = 2)))
    val kept = p.run(corpus, Some((reference, "text", "doc_id")))
      .select("doc_id").as[Long].collect().toSet
    // doc 2 drops on the blocked domain; doc 3 drops on LM coverage
    assert(kept == Set(1L), s"kept: $kept")
    // the config round-trips with both new stages
    val json = CurationPipeline.toJson(p)
    assert(CurationPipeline.fromJson(json) == p)
  }
}
