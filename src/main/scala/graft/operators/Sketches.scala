package graft.operators

import graft.functions.{BottomKDistinctAgg, CountMinAgg}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable data sketches over corpus-scale streams (SURVEY.md §2.11
  * "novel sketch" extension ops): KMV and HLL distinct-count,
  * Count-Min frequency, fixed-grid histograms.
  *
  * Both are built on the repo's cross-engine md5 hash grid instead of
  * engine-private hashing (`approx_count_distinct`'s HLL buffer,
  * DataSketches binaries), which buys three properties at once:
  *
  *   1. the sketch is a pure function of the input SET — row order,
  *      partitioning, and engine all produce bit-identical sketches,
  *      so the DuckDB oracle recomputes them exactly;
  *   2. sketches are MERGEABLE (bottom-k of a union ≡ bottom-k of the
  *      union of per-part bottom-k's; CMS counters add elementwise),
  *      so per-shard/per-day sketches roll up without rescanning — the
  *      posture that matters at 100 TB where "count distinct tokens"
  *      must not shuffle every distinct token;
  *   3. estimates stay on an exact integer grid (no float harmonic
  *      means), so verdicts are hash-stable.
  *
  * Scale shape: one partial-agg pass over the corpus (map-side
  * combine), O(k) or O(depth·width) state, a one-row final shuffle.
  */
object Sketches {

  /** 56-bit hash space: 14 md5 hex digits. Wide enough that collisions
    * are negligible for billions of distinct values (n²/2^57), narrow
    * enough that the KMV estimator's integer arithmetic stays in
    * overflow-checked Long range (see [[kmvEstimate]]).
    */
  val KmvSpace: Long = 1L << 56

  /** Cross-engine 56-bit item hash — DuckDB mirror:
    * `CAST(('0x' || substr(md5(x), 1, 14)) AS UBIGINT)`.
    */
  def kmvHash(item: Column): Column =
    conv(substring(md5(item.cast("string")), 1, 14), 16, 10).cast("long")

  /** Per-group KMV sketch: `groupCols* , sketch: array<long>` — the k
    * smallest distinct [[kmvHash]] values per group, ascending. Null
    * items are excluded (SQL distinct-count semantics).
    */
  def kmvSketch(df: DataFrame, item: Column, k: Int,
      groupCols: Seq[String] = Nil): DataFrame = {
    val hashed = df.where(item.isNotNull)
      .select(groupCols.map(col) :+ kmvHash(item).as("__h"): _*)
    hashed.groupBy(groupCols.map(col): _*)
      .agg(BottomKDistinctAgg(k)(col("__h")).as("sketch"))
  }

  /** Merge per-group sketches into one global sketch WITHOUT rescanning
    * the corpus: the k smallest of the union of the groups' k smallest
    * is exactly the global bottom-k (every global bottom-k member is in
    * its own group's bottom-k). Input is `groups × k` longs — driver-
    * free, one tiny agg.
    */
  def kmvMergeAll(sketches: DataFrame, k: Int,
      sketchCol: String = "sketch"): DataFrame =
    sketches.select(explode(col(sketchCol)).as("__h"))
      .groupBy()
      .agg(BottomKDistinctAgg(k)(col("__h")).as("sketch"))

  /** Distinct-count estimate from a KMV sketch, exact integer grid.
    *
    * Fewer than k distinct values → the sketch IS the distinct set →
    * exact count. Otherwise the classic (k−1)/r_k estimator with
    * r_k = h_k / 2^56, computed as
    * `(k−1)·⌊S/h⌋ + ⌊(k−1)·(S mod h)/h⌋` — algebraically equal to
    * ⌊(k−1)·S/h⌋ but overflow-free: with k ≤ 128 every intermediate is
    * < 2^63 (h ≥ k−1 since the sketch holds k distinct non-negatives,
    * so (k−1)·⌊S/h⌋ ≤ (k−1)·S/(k−1) = S < 2^57, and
    * (k−1)·(S mod h) < 127·2^56 < 2^63). A DuckDB oracle states the
    * same two-term formula in BIGINT. Relative error ~1/√(k−2) (≈9% at
    * k=128) — raise the hash space to decimals if you need larger k.
    */
  def kmvEstimate(sketch: Column, k: Int): Column = {
    require(k >= 2 && k <= 128,
      s"kmvEstimate integer grid supports 2 <= k <= 128, got $k")
    val h = element_at(sketch, k) // sorted ascending: k-th = max
    val s = lit(KmvSpace)
    val est = lit(k - 1L) * call_function("div", s, h) +
      call_function("div", lit(k - 1L) * (s % h), h)
    when(size(sketch) < k, size(sketch).cast("long")).otherwise(est)
  }

  /** Set-overlap statistics between two [[kmvSketch]]es built on the
    * same hash grid with the same k — estimate |A ∩ B| and Jaccard
    * WITHOUT joining the corpora: the classic KMV set-op estimator
    * (bottom-k of A ∪ B is computable from the two sketches alone;
    * J ≈ |bottomK(A∪B) ∩ skA ∩ skB| / k'). At 100 TB this answers
    * "how much does corpus A overlap corpus B" from two O(k) sketch
    * rows instead of a corpus-sized join.
    *
    * Returns a struct of EXACT integers on the shared grid:
    * `j_num` (matching members), `k_eff` (union-sketch size — < k
    * means the union was counted exactly), `union_est`
    * ([[kmvEstimate]] of the union sketch), and `inter_est` =
    * j_num·union_est/k_eff computed with the same overflow-free
    * two-term division as [[kmvEstimate]] (j_num ≤ k_eff, so the
    * first term is ≤ union_est < 2^57). Jaccard itself is
    * j_num/k_eff — left to the caller's grid of choice.
    */
  def kmvOverlapStats(a: Column, b: Column, k: Int): Column = {
    require(k >= 2 && k <= 128, s"kmv overlap supports 2 <= k <= 128, got $k")
    val un = slice(array_sort(array_distinct(concat(a, b))), 1, k)
    val kEff = size(un).cast("long")
    val jNum = size(array_intersect(un, array_intersect(a, b))).cast("long")
    val uEst = kmvEstimate(un, k)
    val interEst = jNum * call_function("div", uEst, kEff) +
      call_function("div", jNum * (uEst % kEff), kEff)
    struct(jNum.as("j_num"), kEff.as("k_eff"),
      uEst.as("union_est"), interEst.as("inter_est"))
  }

  /** HLL register table over `item`'s distinct set: `groupCols*,
    * bucket: long, rho: int` — bucket = top p bits of the 56-bit
    * [[kmvHash]], rho = leading-zero count of the remaining 56−p bits
    * + 1, max-aggregated per bucket. The FULL HyperLogLog state, but
    * as ≤ 2^p ROWS on the cross-engine md5 grid rather than an
    * engine-private binary buffer: a pure function of the distinct
    * set (order/partition/engine-invariant, so the DuckDB oracle
    * recomputes it exactly), and mergeable by `max` per bucket —
    * union semantics without rescanning (per-shard/day register
    * tables roll up with [[hllMergeAll]]).
    *
    * rho via bit-length, not log2: `length(bin(w))` = ⌊log2 w⌋+1
    * exactly on both engines (binary STRING length — no float log
    * near-integer hazard), so rho = (56−p)+1 − bitlen(w), with the
    * w=0 case pinned explicitly (bin(0)='0' would mis-count).
    *
    * One partial-agg pass (map-side max combine), ≤ 2^p rows shuffle.
    * vs [[kmvSketch]]: KMV gives the exact-integer estimate grid;
    * HLL gives ~1.04/√m error in 2^p registers — the standard
    * engine-interop sketch shape. 4 ≤ p ≤ 16 keeps s_num in
    * overflow-checked range (see [[hllStats]]).
    */
  def hllRegisters(df: DataFrame, item: Column, p: Int,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(p >= 4 && p <= 16, s"hll precision out of range: $p")
    val b = 56 - p
    val h = kmvHash(item)
    val w = h.bitwiseAND(lit((1L << b) - 1))
    val rho = when(w === 0L, lit(b + 1))
      .otherwise(lit(b + 1) - length(bin(w))).cast("int")
    df.where(item.isNotNull)
      .select(groupCols.map(col) :+ shiftright(h, b).as("bucket")
        :+ rho.as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Merge per-group register tables into one global table WITHOUT
    * rescanning: HLL(A ∪ B) register = max of the groups' registers
    * (the hash of a value is the same in every group). Input is
    * ≤ groups × 2^p rows — driver-free, one tiny agg.
    */
  def hllMergeAll(registers: DataFrame): DataFrame =
    registers.groupBy(col("bucket")).agg(max(col("rho")).as("rho"))

  /** Integer sufficient statistics of a register table, per group:
    * `n_registers` (buckets hit), `v_zero` = 2^p − n_registers (empty
    * buckets), and `s_num` = Σ_buckets 2^(R − rho) with R = (56−p)+1
    * (empty buckets contribute 2^R) — the EXACT integer numerator of
    * the harmonic mean: Σ 2^(−rho) = s_num / 2^R. Bound: every bucket
    * contributes ≤ 2^R, so s_num ≤ 2^p · 2^(57−p) = 2^57 — fits a
    * long at every allowed p. `est_raw` is the uncorrected HLL
    * estimate α_m·m²·2^R/s_num — single IEEE ops over exact integers,
    * so cross-engine bit-identical (no float SUM order anywhere; the
    * sum happened in integers).
    */
  def hllStats(registers: DataFrame, p: Int,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(p >= 4 && p <= 16, s"hll precision out of range: $p")
    val m = 1L << p
    val r = (56 - p) + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_registers"),
        sum(call_function("shiftleft", lit(1L),
          (lit(r) - col("rho")).cast("int"))).as("__s_hit"))
      .withColumn("v_zero", lit(m) - col("n_registers"))
      .withColumn("s_num",
        col("__s_hit") + col("v_zero") * lit(1L << r))
      .withColumn("est_raw",
        lit(alpha * m.toDouble * m.toDouble) * lit(math.pow(2.0, r)) /
          col("s_num").cast("double"))
      .drop("__s_hit")
  }

  /** The corrected estimate from [[hllStats]] columns: linear counting
    * m·ln(m/V) when empty buckets remain and the raw estimate is in
    * the small-range regime (≤ 2.5m) — Flajolet et al.'s standard
    * correction. `ln` is a libm call (cross-engine last-ulp hazard),
    * so this column belongs in dashboards and error-bound specs, NOT
    * in hash-compared oracle output — the oracle pins `s_num`/`v_zero`
    * and `est_raw` instead.
    */
  def hllEstimate(p: Int): Column = {
    val m = (1L << p).toDouble
    when(col("v_zero") > 0L && col("est_raw") <= lit(2.5 * m),
      lit(m) * log(lit(m) / col("v_zero").cast("double")))
      .otherwise(col("est_raw"))
  }

  /** Distribution drift between two [[histogram]]s on the SAME grid,
    * as total-variation distance — the monitoring primitive ("did
    * today's feature distribution move?") that PSI serves elsewhere,
    * chosen over PSI because TV needs no logarithm: the statistic is
    * the exact INTEGER `tv_num = Σ_bins |nA·NB − nB·NA|` (TV distance
    * = tv_num / (2·NA·NB) ∈ [0,1]), so any engine reproduces it
    * bit-for-bit — no cross-engine float-summation-order hazard.
    * `tv_ppm` is the integer-division parts-per-million rendering.
    *
    * Works on ≤ nBins rows per side — runs wherever the histograms
    * live, so drift across 100 TB snapshots costs two histogram
    * passes (or none, if per-shard histograms were already merged).
    * Count bound: nA·NB must fit a long — beyond ~3·10⁹ rows per
    * side, pre-merge bins or lift to decimals.
    */
  def histogramDrift(histA: DataFrame, histB: DataFrame): DataFrame = {
    val j = histA.select(col("bin"), col("n").as("na"))
      .join(histB.select(col("bin"), col("n").as("nb")), Seq("bin"), "full_outer")
      .na.fill(0L, Seq("na", "nb"))
    val tot = j.groupBy().agg(sum("na").as("ta"), sum("nb").as("tb"))
    j.crossJoin(broadcast(tot))
      .groupBy(col("ta"), col("tb"))
      .agg(sum(abs(col("na") * col("tb") - col("nb") * col("ta"))).as("tv_num"))
      .select(col("ta").as("n_a"), col("tb").as("n_b"), col("tv_num"),
        call_function("div", col("tv_num") * lit(1000000L),
          lit(2L) * col("ta") * col("tb")).as("tv_ppm"))
  }

  /** Per-occurrence CMS cell indices: for row i in 0..depth−1, cell =
    * first-8-hex-md5(i ‖ '_' ‖ item) mod width. DuckDB mirror:
    * `CAST(('0x' || substr(md5(i || '_' || x), 1, 8)) AS UBIGINT) % width`.
    */
  def cmsCells(item: Column, depth: Int, width: Int): Column =
    transform(sequence(lit(0), lit(depth - 1)), i =>
      conv(substring(md5(concat(i.cast("string"), lit("_"),
        item.cast("string"))), 1, 8), 16, 10).cast("long") % width)

  /** Build a Count-Min sketch over `item` occurrences (with
    * multiplicity): one row, `cms: array<long>` of length depth·width,
    * row-major. Null items excluded.
    */
  def cmsBuild(df: DataFrame, item: Column, depth: Int, width: Int): DataFrame =
    df.where(item.isNotNull)
      .select(cmsCells(item, depth, width).as("__cells"))
      .groupBy()
      .agg(CountMinAgg(depth, width)(col("__cells")).as("cms"))

  /** Fixed-grid histogram sketch over `[lo, hi)` — the
    * engine-reproducible, MERGEABLE counterpart of `approx_percentile`
    * (whose GK/KLL buffer is engine-private and order-sensitive). One
    * partial-agg `groupBy(bin)`: ≤ nBins rows ever shuffle, histograms
    * from shards/days merge by adding bin counts. Bin arithmetic is a
    * single `floor((v − lo)·n / (hi − lo))` in binary64 — identical
    * operand order reproduces bit-for-bit on any IEEE engine. Values
    * outside the range clamp to the edge bins (count preserved, like
    * any production histogram).
    */
  def histogram(df: DataFrame, value: Column,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, s"bad histogram grid: [$lo,$hi) x $nBins")
    val bin = least(greatest(
      floor((value - lit(lo)) * nBins / lit(hi - lo)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    df.where(value.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** Quantile estimates from a [[histogram]]: for each q, the smallest
    * bin whose cumulative count reaches `ceil(q·N)`, reported as the
    * bin's lower edge — integer cumulative logic on the shared grid,
    * so any engine derives the identical cutoffs. ≤ nBins rows: runs
    * wherever the histogram lives.
    */
  def histogramQuantiles(hist: DataFrame, qs: Seq[Double],
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad qs: $qs")
    val spark = hist.sparkSession
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total", sum(col("n")).over(
        Window.orderBy(col("bin")).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    // the quantile rides as its exact permyriad LONG: `cum·10⁴ ≥
    // q10k·total` is all-integer, so a mathematically exact tie can
    // never be lost to a float ulp (`q * 10000 * total` in doubles
    // overshoots, e.g. 0.035·10⁴·400 = 70000.00000000001)
    val qdf = spark.createDataFrame(
      qs.map(q => (math.rint(q * 10000).toLong / 10000.0,
        math.rint(q * 10000).toLong)))
      .toDF("q", "__q10k")
    qdf.crossJoin(broadcast(cum))
      .where(col("cum") * 10000 >= col("__q10k") * col("total"))
      .groupBy(col("q"))
      .agg(min(col("bin")).as("bin"), first(col("total")).as("n_total"))
      .withColumn("cutoff",
        lit(lo) + col("bin") * lit(hi - lo) / lit(nBins.toDouble))
      .select("q", "bin", "cutoff", "n_total")
  }

  /** Point-query the sketch for each probe item: min over depth rows of
    * the probe's cell counters — an upper bound on the true occurrence
    * count (error ≤ ε·N with ε ≈ e/width, probability 1−e^−depth).
    * The one-row sketch broadcasts; probes never shuffle.
    */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame =
    probes
      .withColumn("__cells", cmsCells(col(itemCol), depth, width))
      .crossJoin(broadcast(cms))
      .withColumn("est_count",
        array_min(transform(sequence(lit(0), lit(depth - 1)), i =>
          element_at(col("cms"),
            (i.cast("long") * width + element_at(col("__cells"), i + 1) + 1L)
              .cast("int")))))
      .drop("__cells", "cms")
}
