package graft

import graft.operators.Sketches
import graft.functions.BottomKDistinctAgg

import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {

  import spark.implicits._

  test("bottom-k distinct aggregator: dedupes, caps, order-invariant") {
    val vals = Seq(5L, 3L, 9L, 3L, 1L, 7L, 5L, 2L, 8L, 1L)
    val k = 4
    val direct = vals.distinct.sorted.take(k)
    for (parts <- Seq(1, 3, 7)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(BottomKDistinctAgg(k)(col("h")).as("s"))
        .as[Seq[Long]].head()
      assert(got == direct, s"parts=$parts")
    }
  }

  test("kmv: exact when distinct count < k") {
    val df = (1 to 40).map(i => s"tok${i % 10}").toDF("t")
    val sk = Sketches.kmvSketch(df, col("t"), k = 64)
    val est = sk.select(Sketches.kmvEstimate(col("sketch"), 64)).as[Long].head()
    assert(est == 10L)
  }

  test("kmv: estimate within 4/sqrt(k) of truth; merge == direct global") {
    val n = 5000
    val df = (1 to n).map(i => (s"g${i % 3}", s"item$i")).toDF("g", "t")
    val k = 128
    val perGroup = Sketches.kmvSketch(df, col("t"), k, Seq("g"))
    assert(perGroup.count() == 3)

    val merged = Sketches.kmvMergeAll(perGroup, k)
      .as[Seq[Long]].head()
    val direct = Sketches.kmvSketch(df, col("t"), k)
      .select("sketch").as[Seq[Long]].head()
    assert(merged == direct, "bottom-k of union must equal union of bottom-ks")

    val est = Sketches.kmvMergeAll(perGroup, k)
      .select(Sketches.kmvEstimate(col("sketch"), k)).as[Long].head()
    // relative std error ~1/sqrt(k-2); 4 sigma bound
    val bound = 4.0 / math.sqrt(k - 2.0)
    assert(math.abs(est - n.toDouble) / n < bound, s"est=$est truth=$n")
  }

  test("kmv estimate arithmetic: overflow-free two-term division is exact") {
    // h chosen near the top and bottom of the space: the two-term
    // formula must match BigInt floor division exactly
    val k = 128
    for (h <- Seq(127L, 1000L, Sketches.KmvSpace - 1, Sketches.KmvSpace / 3)) {
      val sketch = (0L until (k - 1)).toSeq :+ h // ascending, k-th = h
      val got = Seq(sketch).toDF("sketch")
        .select(Sketches.kmvEstimate(col("sketch"), k)).as[Long].head()
      val want = (BigInt(k - 1) * BigInt(Sketches.KmvSpace) / BigInt(h)).toLong
      assert(got == want, s"h=$h")
    }
  }

  test("kmv overlap: exact below k, estimate within bounds above, disjoint/identical pinned") {
    val k = 128
    def sk(items: Seq[String]) = Sketches.kmvSketch(
      items.toDF("t"), col("t"), k).select("sketch")
    def overlap(a: Seq[String], b: Seq[String]) =
      sk(a).crossJoin(sk(b).withColumnRenamed("sketch", "skb"))
        .select(Sketches.kmvOverlapStats(col("sketch"), col("skb"), k).as("o"))
        .select("o.j_num", "o.k_eff", "o.union_est", "o.inter_est")
        .as[(Long, Long, Long, Long)].head()

    // small sets: union < k, so everything is EXACT
    val (jn, ke, ue, ie) = overlap(
      (1 to 60).map(i => s"x$i"), (41 to 100).map(i => s"x$i"))
    assert(ke == 100 && ue == 100 && jn == 20 && ie == 20, s"($jn,$ke,$ue,$ie)")
    // disjoint and identical extremes
    assert(overlap((1 to 50).map("a" + _), (1 to 50).map("b" + _))._1 == 0)
    val idSelf = overlap((1 to 300).map("c" + _), (1 to 300).map("c" + _))
    assert(idSelf._1 == idSelf._2, "identical sets: every union member matches both")
    // large overlapping sets: estimate within 4 sigma of truth
    val a = (1 to 4000).map("i" + _)
    val b = (2001 to 6000).map("i" + _)
    val (jn2, ke2, ue2, ie2) = overlap(a, b)
    assert(ke2 == k)
    assert(math.abs(ue2 - 6000.0) / 6000 < 4.0 / math.sqrt(k - 2.0), s"union $ue2")
    // J = 2000/6000; j_num/k binomial, sd ~ sqrt(J(1-J)/k) ~ 0.042
    assert(math.abs(jn2 / 128.0 - 1.0 / 3) < 0.17, s"jaccard ${jn2 / 128.0}")
    assert(ie2 > 500 && ie2 < 4000, s"intersection estimate $ie2")
  }

  test("hll: registers partition/order-invariant; merge == direct union; estimate in 4-sigma") {
    val n = 5000
    val p = 12
    val df = (1 to n).map(i => (s"g${i % 3}", s"item$i")).toDF("g", "t")
    val perGroup = Sketches.hllRegisters(df, col("t"), p, Seq("g"))
    // max-merge of the groups' registers == registers of the union
    val merged = Sketches.hllMergeAll(perGroup.select("bucket", "rho"))
    val direct = Sketches.hllRegisters(df, col("t"), p)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "HLL(A u B) registers must equal max-merge of HLL(A), HLL(B)")
    // registers are a pure function of the distinct set
    for (parts <- Seq(1, 7)) {
      val re = Sketches.hllRegisters(df.repartition(parts), col("t"), p)
      assert(re.exceptAll(direct).isEmpty && direct.exceptAll(re).isEmpty)
    }
    val est = Sketches.hllStats(direct, p)
      .select(Sketches.hllEstimate(p)).as[Double].head()
    val bound = 4.0 * 1.04 / math.sqrt((1L << p).toDouble) // 4 sigma
    assert(math.abs(est - n) / n < bound, s"est=$est truth=$n")
  }

  test("hll: linear counting regime is near-exact at tiny cardinality; stats are integers") {
    val p = 12
    val df = (1 to 300).map(i => s"v${i % 50}").toDF("t")
    val regs = Sketches.hllRegisters(df, col("t"), p)
    val st = Sketches.hllStats(regs, p)
    val (nr, vz, sn) = st.select(col("n_registers"), col("v_zero"),
      col("s_num")).as[(Long, Long, Long)].head()
    assert(nr + vz == (1L << p) && sn > 0)
    // 50 distinct into 4096 buckets: collisions are possible but rare;
    // linear counting is within a couple of buckets of exact
    val est = st.select(Sketches.hllEstimate(p)).as[Double].head()
    assert(math.abs(est - 50.0) <= 3.0, s"est=$est")
  }

  test("cms: estimate >= exact count, tight for heavy hitters; partition-invariant") {
    val tokens =
      Seq.fill(400)("alpha") ++ Seq.fill(150)("beta") ++
        (1 to 500).map(i => s"noise$i")
    val (depth, width) = (4, 2048)
    val probes = Seq("alpha", "beta", "absent").toDF("term")

    val ests = (for (parts <- Seq(1, 5)) yield {
      val cms = Sketches.cmsBuild(
        tokens.toDF("term").repartition(parts), col("term"), depth, width)
      Sketches.cmsEstimate(cms, probes, "term", depth, width)
        .select("term", "est_count").as[(String, Long)].collect().toMap
    }).distinct
    assert(ests.size == 1, "CMS must be partition-invariant")

    val est = ests.head
    assert(est("alpha") >= 400 && est("beta") >= 150 && est("absent") >= 0)
    // eps*N bound with eps = e/width over N=1050 occurrences: < 2 here
    assert(est("alpha") <= 400 + 3 && est("beta") <= 150 + 3 && est("absent") <= 3)
  }

  test("histogram: mergeable by bin add; quantiles within one bin of exact; clamps") {
    val (lo, hi, bins) = (0.0, 100.0, 50)
    val a = (1 to 400).map(i => (i % 100).toDouble)
    val b = Seq(-5.0, 250.0) ++ (1 to 100).map(_ => 99.0) // out-of-range clamps
    def hist(xs: Seq[Double]) =
      Sketches.histogram(xs.toDF("v"), col("v"), lo, hi, bins)
        .as[(Long, Long)].collect().toMap

    val hu = hist(a ++ b)
    val merged = (hist(a).toSeq ++ hist(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(hu == merged, "histograms must merge by adding bin counts")
    assert(hu.values.sum == a.size + b.size, "clamped values keep their count")
    assert(hu.contains(0L) && hu.contains(49L))

    val qs = Seq(0.5, 0.9)
    val got = Sketches.histogramQuantiles(
      Sketches.histogram(a.toDF("v"), col("v"), lo, hi, bins), qs, lo, hi, bins)
      .select("q", "cutoff").as[(Double, Double)].collect().toMap
    val sorted = a.sorted
    for (q <- qs) {
      val exact = sorted(math.ceil(q * a.size).toInt - 1)
      val binW = (hi - lo) / bins
      assert(math.abs(got(q) - exact) <= binW,
        s"q=$q cutoff=${got(q)} exact=$exact")
    }
  }

  test("histogramDrift: 0 for identical, 1e6 ppm for disjoint, symmetric") {
    val (lo, hi, bins) = (0.0, 100.0, 10)
    def h(xs: Seq[Double]) =
      Sketches.histogram(xs.toDF("v"), col("v"), lo, hi, bins)
    val a = (1 to 300).map(i => (i % 50).toDouble)        // bins 0..4
    val b = (1 to 200).map(i => 50.0 + (i % 50))          // bins 5..9

    val same = Sketches.histogramDrift(h(a), h(a))
      .select("tv_num", "tv_ppm").as[(Long, Long)].head()
    assert(same == ((0L, 0L)))

    val disjoint = Sketches.histogramDrift(h(a), h(b))
      .select("n_a", "n_b", "tv_ppm").as[(Long, Long, Long)].head()
    assert(disjoint == ((300L, 200L, 1000000L)))

    val ab = Sketches.histogramDrift(h(a), h(a ++ b)).as[(Long, Long, Long, Long)].head()
    val ba = Sketches.histogramDrift(h(a ++ b), h(a)).as[(Long, Long, Long, Long)].head()
    assert(ab._3 == ba._3 && ab._4 == ba._4, "TV must be symmetric")
    // a vs a∪b: mass 2/5 of the union moved out of a's support → TV = 0.4
    assert(ab._4 == 400000L, s"got ${ab._4}")
  }

  test("cms: sketches merge by elementwise add (union corpus == summed sketches)") {
    val a = Seq.fill(10)("x") ++ Seq("y", "z")
    val b = Seq.fill(5)("x") ++ Seq("w")
    val (depth, width) = (2, 64)
    val skA = Sketches.cmsBuild(a.toDF("t"), col("t"), depth, width)
      .as[Seq[Long]].head()
    val skB = Sketches.cmsBuild(b.toDF("t"), col("t"), depth, width)
      .as[Seq[Long]].head()
    val skU = Sketches.cmsBuild((a ++ b).toDF("t"), col("t"), depth, width)
      .as[Seq[Long]].head()
    assert(skA.zip(skB).map { case (u, v) => u + v } == skU)
  }
}
