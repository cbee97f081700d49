package graft

import graft.operators.{Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Deterministic hash splitting/sampling and PII redaction. */
class SamplingPiiSpec extends SparkTestBase {
  import spark.implicits._

  test("splitByHash: total, deterministic, partitioning-invariant") {
    val df = (0L until 2000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.splitByHash(df, "id", splits)
      .as[(Long, String)].collect().toMap
    val b = Sampling.splitByHash(df.repartition(13), "id", splits)
      .as[(Long, String)].collect().toMap
    assert(a == b, "assignment must not depend on partitioning")
    assert(a.size == 2000, "every row gets exactly one split")
    val byName = a.values.groupBy(identity).view.mapValues(_.size).toMap
    // md5 buckets are uniform: 80/10/10 ± a few percent at n=2000
    assert(math.abs(byName("train") - 1600) < 120, s"train skew: $byName")
    assert(math.abs(byName("val") - 200) < 70, s"val skew: $byName")
    assert(math.abs(byName("test") - 200) < 70, s"test skew: $byName")
  }

  test("splitByHash: a different salt is an independent re-split") {
    val df = (0L until 2000L).toDF("id")
    val splits = Seq("a" -> 0.5, "b" -> 0.5)
    val s1 = Sampling.splitByHash(df, "id", splits).as[(Long, String)].collect().toMap
    val s2 = Sampling.splitByHash(df, "id", splits, salt = "epoch2")
      .as[(Long, String)].collect().toMap
    val moved = (0L until 2000L).count(i => s1(i) != s2(i))
    assert(moved > 700 && moved < 1300,
      s"independent re-split should move ~half the keys, moved $moved")
  }

  test("sampleByHashStratified: per-stratum fractions, nesting, null default") {
    val df = (0L until 6000L).toDF("id")
      .withColumn("grp", when($"id" % 3 === 0, lit("a"))
        .when($"id" % 3 === 1, lit("b")).otherwise(lit(null: String)))
    val out = Sampling.sampleByHashStratified(df, "id", "grp",
      Seq("a" -> 0.2, "b" -> 1.0), defaultFraction = 0.5)
      .as[(Long, Option[String])].collect()
    val byGrp = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byGrp(Some("b")) == 2000, "fraction 1.0 keeps the whole stratum")
    assert(math.abs(byGrp(Some("a")) - 400) < 90, s"stratum a skew: $byGrp")
    assert(math.abs(byGrp(None) - 1000) < 140, s"null->default skew: $byGrp")
    // nesting: the same stratum at a smaller fraction is a SUBSET —
    // the stratum column only moves the threshold on one shared grid
    val smaller = Sampling.sampleByHashStratified(df, "id", "grp",
      Seq("a" -> 0.05, "b" -> 1.0), defaultFraction = 0.5)
      .where($"grp" === "a").as[(Long, Option[String])].collect().map(_._1).toSet
    val kept = out.filter(_._2.contains("a")).map(_._1).toSet
    assert(smaller.subsetOf(kept), "smaller fraction must nest inside larger")
  }

  test("topFractionByScore reproduces the rank-over-total-order contract") {
    // deterministic pseudo-random integer scores with heavy ties
    val df = (0L until 3000L).toDF("id")
      .withColumn("score", (($"id" * 2654435761L) % 37).cast("long"))
    val rows = df.as[(Long, Long)].collect()
    for (frac <- Seq(0.0, 0.1, 0.25, 0.5, 1.0)) {
      val quota = math.ceil(frac * rows.length).toLong
      val want = rows.sortBy { case (id, s) => (-s, id) }
        .take(quota.toInt).map(_._1).toSet
      val got = Sampling.topFractionByScore(df, "id", "score", frac)
        .select("id").as[Long].collect().toSet
      assert(got == want, s"frac $frac: ${got.size} vs ${want.size}")
    }
  }

  test("topFractionByScore: null scores never survive; degenerate one-class grid") {
    val df = (0L until 100L).toDF("id")
      .withColumn("score",
        when($"id" < 10, lit(null).cast("long")).otherwise(lit(7L)))
    // quota is ceil(frac * non-null rows); boundary take is id-ordered
    val got = Sampling.topFractionByScore(df, "id", "score", 0.5)
      .select("id").as[Long].collect().toSet
    assert(got == (10L until 55L).toSet, s"got ${got.toSeq.sorted}")
    // cardinality guard trips on an unbounded score column
    val wide = (0L until 100L).toDF("id").withColumn("score", $"id")
    intercept[IllegalArgumentException] {
      Sampling.topFractionByScore(wide, "id", "score", 0.5,
        maxDistinctScores = 10)
    }
  }

  test("resampleToMixture: achieved mixture, binding domain kept whole, off-mix dropped") {
    // 4000 en / 1000 zh / 500 other; target 2:1 en:zh. zh is scarce
    // relative to its share (1000 vs en's 4000/2=2000-equivalent), so
    // zh binds: n_max = 3000, zh kept whole, en downsampled to ~2000.
    val df = ((0L until 4000L).map(i => (i, "en")) ++
        (10000L until 11000L).map(i => (i, "zh")) ++
        (20000L until 20500L).map(i => (i, "xx")))
      .toDF("id", "lang")
    val out = Sampling.resampleToMixture(df, "id", "lang",
      Seq("en" -> 2L, "zh" -> 1L))
    val byLang = out.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(!byLang.contains("xx"), "domains outside the mixture must drop")
    assert(byLang("zh") == 1000L, "the binding domain must be kept whole")
    assert(math.abs(byLang("en") - 2000L) < 120,
      s"en must downsample to ~2x zh: $byLang")
    // deterministic + partitioning-invariant
    val again = Sampling.resampleToMixture(df.repartition(7), "id", "lang",
      Seq("en" -> 2L, "zh" -> 1L))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("resampleToMixture refuses a sub-grid domain threshold by name") {
    // en over-represented beyond the 1/10000 grid for its tiny target
    // share: threshold floors to 0 and the filter would delete the
    // domain ENTIRELY while the caller asked for a positive share
    val df = ((0L until 2000L).map(i => (i, "en")) ++ Seq((9000L, "zh")))
      .toDF("id", "lang")
    val e = intercept[IllegalArgumentException] {
      Sampling.resampleToMixture(df, "id", "lang",
        Seq("en" -> 1L, "zh" -> 9999L))
    }
    assert(e.getMessage.contains("en") &&
      e.getMessage.contains("sampling grid"), e.getMessage)
  }

  test("shuffleShards: permutation is total, balanced, salt-independent, invariant") {
    val df = (0L until 4000L).toDF("id")
    val a = Sampling.shuffleShards(df, "id", 8)
      .as[(Long, Long, Long)].collect()
    // total: every row exactly once; pos is 1..count(shard) per shard
    assert(a.length == 4000 && a.map(_._1).distinct.length == 4000)
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions not contiguous")
      assert(math.abs(rows.length - 500) < 120, s"shard $shard skew: ${rows.length}")
    }
    // partitioning-invariant
    val b = Sampling.shuffleShards(df.repartition(11), "id", 8)
      .as[(Long, Long, Long)].collect()
    assert(a.toSet == b.toSet)
    // a different salt is a genuinely different permutation
    val c = Sampling.shuffleShards(df, "id", 8, salt = "epoch2")
      .as[(Long, Long, Long)].collect()
    assert(a.toSet != c.toSet)
  }

  test("packByTokenBudget: equals the global-window reference, partitioning-invariant") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 3000L).toDF("id")
      .withColumn("tok", ($"id" * 37) % 100 + 1)
    val got = Sampling.packByTokenBudget(df, "id", "tok", budget = 1000,
      nBuckets = 16).select($"id", $"bin_id").as[(Long, Long)].collect().toMap
    // reference: the single-task global-window formulation the
    // distributed two-phase prefix sum must reproduce exactly
    val wRef = Window.orderBy($"id").rowsBetween(Window.unboundedPreceding, -1)
    val ref = df.withColumn("bin",
      floor((coalesce(sum($"tok").over(wRef), lit(0L))).cast("double") / 1000.0)
        .cast("long"))
      .select($"id", $"bin").as[(Long, Long)].collect().toMap
    assert(got == ref, "distributed prefix sum diverges from global window")
    assert(got.values.max > 50, "test should span many bins")
    val got13 = Sampling.packByTokenBudget(df.repartition(13), "id", "tok",
      budget = 1000, nBuckets = 16)
      .select($"id", $"bin_id").as[(Long, Long)].collect().toMap
    assert(got13 == got, "bin assignment must not depend on partitioning")
  }

  test("sampleByHash: subset semantics and fraction accuracy") {
    val df = (0L until 5000L).toDF("id")
    val tenPct = Sampling.sampleByHash(df, "id", 0.1).as[Long].collect().toSet
    val thirtyPct = Sampling.sampleByHash(df, "id", 0.3).as[Long].collect().toSet
    assert(tenPct.subsetOf(thirtyPct),
      "growing the fraction must only ADD keys (nested samples)")
    assert(math.abs(tenPct.size - 500) < 100, s"10% of 5000 ~ 500, got ${tenPct.size}")
  }

  test("sampleByHashWeighted: rate-proportional, pinned extremes, nested in the rate") {
    // weight classes 0, 500, 1000, 2000, 5000 at rate 1/2000:
    // p = 0, 0.25, 0.5, 1, 1 respectively
    val df = (0L until 5000L).map(i => (i, Seq(0L, 500L, 1000L, 2000L, 5000L)(
      (i % 5).toInt))).toDF("id", "w")
    val kept = Sampling.sampleByHashWeighted(df, "id", "w", 1L, 2000L)
      .as[(Long, Long)].collect()
    val byW = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(!byW.contains(0L), "zero weight never survives")
    assert(byW(2000L) == 1000 && byW(5000L) == 1000,
      s"weight >= den/num survives always: $byW")
    assert(math.abs(byW(500L) - 250) < 60 && math.abs(byW(1000L) - 500) < 80,
      s"rate-proportional survival: $byW")
    // deterministic and partitioning-invariant
    val re = Sampling.sampleByHashWeighted(df.repartition(13), "id", "w",
      1L, 2000L).as[(Long, Long)].collect()
    assert(kept.sorted.toSeq == re.sorted.toSeq)
    // nested: survivors at rate 1/2000 all survive at 2/2000
    val wider = Sampling.sampleByHashWeighted(df, "id", "w", 2L, 2000L)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(kept.map(_._1).forall(wider.contains))
    // null weights behave as zero
    val withNull = Seq((1L, Some(5000L)), (2L, None))
      .toDF("id", "w")
    assert(Sampling.sampleByHashWeighted(withNull, "id", "w", 1L, 2000L)
      .as[(Long, Option[Long])].collect().forall(_._2.isDefined))
    // a weight near Long.MaxValue saturates p=1 via the clamp instead
    // of overflowing the threshold product (wrap-to-positive would
    // silently DROP rows whose true p is 1); negatives never survive
    val extreme = Seq((1L, Long.MaxValue), (2L, -5L), (3L, 2000L))
      .toDF("id", "w")
    assert(Sampling.sampleByHashWeighted(extreme, "id", "w", 1L, 2000L)
      .as[(Long, Long)].collect().map(_._1).toSet == Set(1L, 3L))
  }

  test("dropBelowGroupQuantile: per-group exact cutoffs, ties kept together, nulls dropped") {
    // group a: scores 1..8 -> 25% cutoff is 2 (cum 2*4 >= 8), keep 2..8
    // group b: all-tied scores -> everything survives at any quantile
    // group c: one row -> survives
    val df = ((1L to 8L).map(i => ("a", i, i)) ++
      (20L to 25L).map(i => ("b", 5L, i)) ++ Seq(("c", 9L, 30L)))
      .toDF("g", "score", "id")
    val got = Sampling.dropBelowGroupQuantile(df, "g", "score", 1L, 4L)
      .select("g", "id").as[(String, Long)].collect().toSet
    val want = ((2L to 8L).map(("a", _)) ++ (20L to 25L).map(("b", _)) ++
      Seq(("c", 30L))).toSet
    assert(got == want, s"got $got")
    // partitioning must not change the cutoff
    val re = Sampling.dropBelowGroupQuantile(df.repartition(5), "g",
      "score", 1L, 4L).select("g", "id").as[(String, Long)].collect().toSet
    assert(re == got)
    // null scores never survive
    val withNull = df.unionByName(
      Seq(("a", Option.empty[Long], 99L)).toDF("g", "score", "id"))
    assert(!Sampling.dropBelowGroupQuantile(withNull, "g", "score", 1L, 4L)
      .select("id").as[Long].collect().contains(99L))
  }

  test("dropBelowGroupQuantile: null scores must not bend the cutoff") {
    // group a: real scores 1..8 plus FOUR null-score rows. The 25%
    // cutoff of the real scores is 2 (drop score 1). Nulls sort first
    // under the cumulative window, so counting them into the histogram
    // inflates __cum/__tot and lands the cutoff at 1 — keeping score-1
    // rows the stated quantile says to drop.
    val df = ((1L to 8L).map(i => ("a", Option(i), i)) ++
      (90L to 93L).map(i => ("a", Option.empty[Long], i)))
      .toDF("g", "score", "id")
    val kept = Sampling.dropBelowGroupQuantile(df, "g", "score", 1L, 4L)
      .select("id").as[Long].collect().toSet
    assert(kept == (2L to 8L).toSet,
      s"cutoff bent by null scores: kept $kept")
  }

  test("shardManifest: order/partition-invariant; detects loss, duplication, corruption") {
    val df = (0L until 400L).map(i => (i, i % 7, s"payload$i"))
      .toDF("id", "shard", "v")
    def m(d: org.apache.spark.sql.DataFrame) =
      Sampling.shardManifest(d, "shard", Seq("id", "v"))
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val base = m(df)
    assert(base.map(_._2).sum == 400)
    assert(m(df.repartition(13)) == base, "partitioning must not matter")
    assert(m(df.orderBy(desc("v"))) == base, "row order must not matter")
    // corruption in any signature column changes a signature
    val corrupted = df.withColumn("v",
      when(col("id") === 123L, lit("tampered")).otherwise(col("v")))
    assert(m(corrupted) != base)
    // a dropped row changes n_rows AND both signatures for its shard
    val dropped = m(df.where(col("id") =!= 42L))
    val shard42 = 42L % 7
    val (b, d) = (base.find(_._1 == shard42).get, dropped.find(_._1 == shard42).get)
    assert(d._2 == b._2 - 1 && d._3 != b._3 && d._4 != b._4)
    // an EVEN duplication cancels in the xor but not in the mod-sum —
    // the reason the manifest carries both
    val dup2 = m(df.unionByName(df.where(col("id") === 42L))
      .unionByName(df.where(col("id") === 42L)))
    val d2 = dup2.find(_._1 == shard42).get
    assert(d2._3 == b._3 && d2._4 != b._4)
  }

  test("quantizeInt8: round-trip error bounded by half a step; range [-127,127]") {
    import graft.operators.Similarity
    val df = Seq(
      (1L, Seq(0.5f, -2.0f, 1.25f, 0.0f)),
      (2L, Seq(0.001f, 0.002f, -0.003f)),
      (3L, Seq(0.0f, 0.0f))) // zero vector
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df, "embedding")
    val back = q.select(col("vec_id"), col("embedding"), col("embedding_q8"),
      Similarity.dequantizeInt8(col("embedding_q8"), col("embedding_scale"))
        .as("deq"))
      .as[(Long, Seq[Float], Seq[Int], Seq[Double])].collect()
    back.foreach { case (id, orig, q8, deq) =>
      assert(q8.forall(v => v >= -127 && v <= 127), s"vec $id out of range: $q8")
      val absmax = orig.map(math.abs(_)).max.toDouble
      val step = math.max(absmax, 1e-30) / 127
      orig.zip(deq).foreach { case (o, d) =>
        assert(math.abs(o - d) <= step / 2 + 1e-12,
          s"vec $id: $o dequantized to $d (step $step)")
      }
    }
    // zero vector stays exactly zero
    assert(back.find(_._1 == 3L).get._3.forall(_ == 0))
  }

  test("redactPii: typed placeholders, counts, and non-PII text untouched") {
    val df = Seq(
      (1L, "mail a.b-c+x@sub.example.org and peer 192.168.001.12 ssn 123-45-6789"),
      (2L, "no pii here, just v1.2 and a dash-word"),
      (3L, "two mails x@y.io z@w.co plus 10.0.0.1"),
      (4L, "call +1-555-123-4567 or +44 207 946 0958 card 4111-1111-1111-1111"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(df, "text")
      .select("doc_id", "n_email", "n_phone", "n_cc", "n_ipv4", "n_ssn",
        "text_redacted")
      .as[(Long, Int, Int, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 1, 0, 0, 1, 1,
      "mail <EMAIL> and peer <IP> ssn <SSN>")))
    assert(out(1) == ((2L, 0, 0, 0, 0, 0,
      "no pii here, just v1.2 and a dash-word")))
    assert(out(2) == ((3L, 2, 0, 0, 1, 0, "two mails <EMAIL> <EMAIL> plus <IP>")))
    assert(out(3) == ((4L, 0, 2, 1, 0, 0,
      "call <PHONE> or <PHONE> card <CC>")))
  }

  test("redactPii: counts are replacement counts, not raw-text match counts") {
    // the SSN-shaped digits live INSIDE the email, so the email pattern
    // consumes them; n_ssn must be 0 (no <SSN> placeholder exists in
    // the output) even though the raw text matches the SSN pattern
    val df = Seq((1L, "reach me at john123-45-6789@corp.example.com today"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df, "text")
      .select("n_email", "n_ssn", "text_redacted")
      .as[(Int, Int, String)].head()
    assert(r == ((1, 0, "reach me at <EMAIL> today")), r.toString)
  }

  test("splitByHashGrouped: cluster members co-locate; singletons match plain split") {
    import graft.operators.Sampling
    val ids = (1L to 200L).toDF("id")
    // clusters: {1,101,102}, {2,103}
    val groups = Seq((1L, 1L), (101L, 1L), (102L, 1L), (2L, 2L), (103L, 2L))
      .toDF("member", "canonical")
    val splits = Seq("train" -> 0.8, "test" -> 0.2)
    val got = Sampling.splitByHashGrouped(ids, "id", groups, splits)
      .as[(Long, String)].collect().toMap

    assert(got(101L) == got(1L) && got(102L) == got(1L) && got(103L) == got(2L),
      "cluster members must inherit the canonical's split")
    val plain = Sampling.splitByHash(ids, "id", splits)
      .as[(Long, String)].collect().toMap
    val clustered = Set(1L, 2L, 101L, 102L, 103L)
    assert(got.filterNot(kv => clustered(kv._1)) ==
      plain.filterNot(kv => clustered(kv._1)),
      "rows outside any cluster keep their independent assignment")
  }
}

class SamplingTemperatureSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.Sampling

  // 4000 a-rows, 1000 b-rows, 250 c-rows: sqrt weights 63.2/31.6/15.8
  private val df = ((1 to 4000).map(i => (i.toLong, "a")) ++
    (1 to 1000).map(i => (i.toLong + 10000, "b")) ++
    (1 to 250).map(i => (i.toLong + 20000, "c")))
    .toDF("id", "dom")

  test("alpha=1 keeps natural proportions (identity, no upsampling)") {
    assert(Sampling.resampleByTemperature(df, "id", "dom", 1.0).count() == 5250)
  }

  test("alpha=0.5: smallest domain intact, rates follow sqrt(nmin/n)") {
    val got = Sampling.resampleByTemperature(df, "id", "dom", 0.5)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(got("c") == 250) // rate 1
    // expected rates: sqrt(250/1000)=0.5, sqrt(250/4000)=0.25 on the
    // 10000-grid; md5 buckets are uniform so counts land within ~10%
    assert(math.abs(got("b") - 500) < 60, s"b=${got("b")}")
    assert(math.abs(got("a") - 1000) < 110, s"a=${got("a")}")
  }

  test("NULL domains are a real domain: counted, matched, and sampled") {
    val withNulls = df.unionByName(
      (1 to 250).map(i => (i.toLong + 30000, null: String)).toDF("id", "dom"))
    val got = Sampling.resampleByTemperature(withNulls, "id", "dom", 0.5)
      .groupBy("dom").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // null ties c as smallest (250): both keep rate 1
    assert(got(None) == 250L && got(Some("c")) == 250L)
  }

  test("a domain rating below the 1/10000 grid is refused by name") {
    // the zero-threshold regime needs n/nMin > 10^(4/(1-alpha)) — a
    // 100M:1 head/tail corpus at alpha=0.5 — so the guard is driven
    // through the threshold function at the counts themselves
    val e = intercept[IllegalArgumentException] {
      Sampling.temperatureThreshold(1L, 200000000L, 0.5, "head")
    }
    assert(e.getMessage.contains("sampling grid"))
    // boundary: exactly the grid resolution still passes
    assert(Sampling.temperatureThreshold(1L, 10000L, 0.5, "x") == 100L)
    assert(Sampling.temperatureThreshold(5L, 5L, 0.5, "x") == 10000L)
  }

  test("deterministic: identical result on rerun; salt changes the draw") {
    val a = Sampling.resampleByTemperature(df, "id", "dom", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.resampleByTemperature(df, "id", "dom", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
    val c = Sampling.resampleByTemperature(df, "id", "dom", 0.5, salt = "x")
      .select("id").as[Long].collect().sorted.toSeq
    assert(a != c)
  }
}

class HashNegativesSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.Sampling

  private val docs = (1L to 500L).toDF("id")

  test("k probes per anchor, self-hits dropped, negatives are real ids") {
    val neg = Sampling.hashNegatives(docs, "id", k = 3, nShards = 4)
    val per = neg.groupBy("anchor_id").count().as[(Long, Long)].collect()
    assert(per.length == 500 && per.forall(_._2 <= 3))
    // the overwhelming majority keep all 3 (self-hit odds ~ 1/500)
    assert(per.count(_._2 == 3L) >= 490)
    assert(neg.where(col("neg_id") === col("anchor_id")).count() == 0)
    val ids = docs.as[Long].collect().toSet
    assert(neg.select("neg_id").as[Long].collect().forall(ids.contains))
  }

  test("deterministic across reruns; draws spread over the corpus") {
    val a = Sampling.hashNegatives(docs, "id", 2, 4)
      .as[(Long, Int, Long)].collect().toSet
    val b = Sampling.hashNegatives(docs, "id", 2, 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b)
    // 1000 draws over 500 docs: at least half the corpus gets hit
    assert(a.map(_._3).size > 250)
  }
}
