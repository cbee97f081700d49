package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines
  * (SURVEY.md §2.11 extension surface): every assignment is a pure
  * function of the row's KEY — stable across runs, engines, partition
  * counts, and cluster sizes, which `df.sample`/`randomSplit` (RNG
  * seeded per partition) are NOT. Pure projections: zero shuffle,
  * codegen'd, linear at any corpus size.
  */
object Sampling {

  /** 0..9999 bucket from the md5 of the key (first 8 hex digits) — the
    * cross-engine-reproducible hash grid (md5 is bit-identical
    * everywhere; xxhash64 seeds differ between engines). `salt` decides
    * a NEW independent assignment for the same keys (epoch re-splits).
    */
  def hashBucket(key: Column, salt: String = ""): Column =
    // null keys hash as the empty string, so splitByHash and
    // sampleByHash agree on them (a raw null would propagate: assigned
    // to the LAST split by the when-chain but silently FILTERED by the
    // sample predicate — two different answers for the same row)
    conv(substring(md5(concat(coalesce(key.cast("string"), lit("")),
      lit(salt))), 1, 8), 16, 10).cast("long") % 10000

  /** Assign each row to a named split (train/val/test…) by hash bucket.
    * `splits` maps name -> fraction; fractions must sum to 1 (±1e-9).
    * Buckets partition [0, 10000) by cumulative fraction, so a key's
    * split never changes when OTHER splits are re-proportioned only if
    * its own cumulative interval is unchanged — document re-splits with
    * a fresh `salt` instead.
    */
  def splitByHash(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], salt: String = "",
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty with positive fractions")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val b = hashBucket(col(keyCol), salt)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(f => math.round(f * 10000).toInt)
    // the hash grid has 1/10000 resolution: a fraction that rounds to a
    // zero-width bucket interval would yield a silently EMPTY split
    require((0 +: bounds.init).zip(bounds).forall { case (lo, hi) => hi > lo },
      s"split fractions below the 1/10000 hash-grid resolution: $splits")
    val assigned = splits.map(_._1).zip(bounds).init
      .foldRight(lit(splits.last._1)) { case ((name, hi), rest) =>
        when(b < hi, lit(name)).otherwise(rest)
      }
    df.withColumn(splitCol, assigned)
  }

  /** Leakage-safe split: like [[splitByHash]], but rows that share a
    * duplicate CLUSTER split together — the train/test-contamination
    * guard (a near-duplicate of a training document landing in test
    * leaks labels/loss; hashing each doc independently guarantees it
    * happens). `groups` is `(member, canonical)` — the
    * [[Dedup.connectedComponents]] output — and the split key is the
    * cluster canonical (rows outside any cluster key on themselves),
    * so every member inherits the canonical's assignment. One
    * membership-sized left join (broadcast when small) on top of the
    * pure-projection hash split.
    */
  def splitByHashGrouped(df: DataFrame, idCol: String, groups: DataFrame,
      splits: Seq[(String, Double)], salt: String = "",
      splitCol: String = "split"): DataFrame = {
    val g = groups.select(col("member").as(idCol), col("canonical").as("__canon"))
    splitByHash(
      df.join(g, Seq(idCol), "left")
        .withColumn("__skey", coalesce(col("__canon"), col(idCol))),
      "__skey", splits, salt, splitCol)
      .drop("__canon", "__skey")
  }

  /** Keep a deterministic `fraction` of rows by key hash — the
    * reproducible corpus downsample (same keys survive at every
    * partitioning and on every engine).
    */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.where(hashBucket(col(keyCol), salt) < math.round(fraction * 10000).toInt)
  }

  /** Per-stratum deterministic downsample — the training-mix
    * primitive ("keep 25 % of en, all of the rare languages"):
    * `fractions` maps stratum value -> keep fraction; strata not
    * listed keep `defaultFraction`. Same hash grid as [[sampleByHash]]
    * (a key kept at fraction f is kept at every fraction ≥ f — nested
    * samples), same null-key discipline, and the stratum column only
    * selects the THRESHOLD, so re-proportioning one stratum never
    * reshuffles which keys survive in another. Pure projection+filter:
    * zero shuffle at any corpus size.
    */
  def sampleByHashStratified(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Seq[(String, Double)], defaultFraction: Double = 1.0,
      salt: String = ""): DataFrame = {
    require(fractions.map(_._2).forall(f => f >= 0 && f <= 1) &&
      defaultFraction >= 0 && defaultFraction <= 1,
      s"fractions out of range: $fractions / $defaultFraction")
    require(fractions.map(_._1).distinct.size == fractions.size,
      "duplicate stratum in fractions")
    def cut(f: Double): Int = math.round(f * 10000).toInt
    val threshold = fractions.foldRight(lit(cut(defaultFraction))) {
      case ((stratum, f), rest) =>
        when(col(strataCol) === lit(stratum), lit(cut(f))).otherwise(rest)
    }
    df.where(hashBucket(col(keyCol), salt) < threshold)
  }

  /** Probability-proportional-to-weight deterministic sample: each row
    * survives with p = min(1, weight·num/den) — "sample documents in
    * proportion to their token count" without a random number
    * generator. The keep decision is `hashBucket(key) <
    * min(10000, ⌊weight·num·10000/den⌋)` — ALL-INTEGER arithmetic on
    * the shared md5 grid, so the survivor set is a pure function of
    * (key, weight, num/den, salt): partitioning/engine-invariant and
    * exactly restatable by a SQL oracle (a float rate rounded at the
    * grid could straddle a half-point between engines). The rate is a
    * RATIONAL num/den by the same reasoning as
    * [[resampleToMixture]]'s integer parts.
    *
    * Monotone in the rate: a key kept at num/den survives at every
    * larger rate (nested samples, like [[sampleByHash]]); weight ≥
    * den/num pins survival, weight ≤ 0 (or null) never survives.
    * Overflow is handled by CONSTRUCTION, not a guard: any weight ≥
    * den/num + 1 already saturates p = 1, so weights clamp there
    * BEFORE the threshold product — the product is then bounded by
    * (den + num)·10000, which the `require` keeps inside a signed
    * long (a post-hoc negativity check would miss wrap-to-positive
    * overflow, and under ANSI mode would never be reached). Pure
    * projection+filter: zero shuffle at any corpus size.
    */
  def sampleByHashWeighted(df: DataFrame, keyCol: String, weightCol: String,
      num: Long, den: Long, salt: String = ""): DataFrame = {
    require(num > 0 && den > 0, s"rate must be a positive rational: $num/$den")
    require(den + num <= 900000000000000L,
      s"rate $num/$den too large for the 10000-grid threshold product")
    val cap = den / num + 1 // smallest weight certain to saturate p = 1
    val w = least(coalesce(col(weightCol).cast("long"), lit(0L)), lit(cap))
    df.where(hashBucket(col(keyCol), salt) <
      least(lit(10000L), call_function("div", w * lit(num) * lit(10000L), lit(den))))
  }

  /** Resample a corpus to a TARGET mixture (the static data-mixing
    * step of a training pipeline: "the output should be 40 % en,
    * 20 % zh, …"). Downsample-only: the achievable total is set by
    * the SCARCEST domain relative to its target share — `n_max =
    * min_d floor(count_d · S / p_d)` — and every other domain is
    * hash-downsampled to its share of that total. Rows whose domain
    * is not in `parts` are dropped.
    *
    * `parts` are INTEGER ratios (e.g. en→4, zh→2, …, summing to S),
    * not float fractions, so the per-domain keep thresholds
    * `floor(10000 · n_max · p_d / (S · count_d))` are exact integer
    * arithmetic — reproducible bit-for-bit on any engine (a float
    * rate rounded at the hash grid could straddle a half-point
    * between engines). Overflow bound: `10000 · n_max · p_d` must fit
    * a signed 64-bit long — holds to ~10^12 rows per domain at
    * two-digit parts, `require`d below.
    *
    * Cost: one tiny groupBy-count (partial-agg'd, #domains rows
    * collected) + a pure filter — no data shuffle at any corpus size.
    * The achieved mixture tracks the target within hash-grid
    * resolution (1/10000) per domain.
    */
  def resampleToMixture(df: DataFrame, keyCol: String, domainCol: String,
      parts: Seq[(String, Long)], salt: String = ""): DataFrame = {
    require(parts.nonEmpty && parts.forall(_._2 > 0),
      s"parts must be non-empty positive integer ratios: $parts")
    require(parts.map(_._1).distinct.size == parts.size,
      "duplicate domain in parts")
    val s = parts.map(_._2).sum
    val cnts = df.where(col(domainCol).isin(parts.map(_._1): _*))
      .groupBy(col(domainCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    parts.foreach { case (d, _) =>
      require(cnts.getOrElse(d, 0L) > 0, s"domain '$d' has no rows") }
    val nMax = parts.map { case (d, p) => cnts(d) * s / p }.min
    val thresholds = parts.map { case (d, p) =>
      // divide-before-multiply: `nMax * p` itself can wrap, so the
      // guard must never form the product it is guarding
      require(p <= Long.MaxValue / 10000 / nMax,
        s"threshold arithmetic would overflow for domain '$d'")
      val t = 10000L * nMax * p / (s * cnts(d))
      // threshold 0 = the domain is over-represented beyond the 1/10000
      // grid (count_d/n_max > 10⁴·p_d/S) and the filter would delete it
      // ENTIRELY while the caller asked for a positive share — the same
      // sub-grid regime resampleByTemperature refuses by name
      require(t >= 1, s"domain '$d' (${cnts(d)} rows vs achievable " +
        s"total $nMax) rates below the 1/10000 sampling grid for its " +
        s"$p/$s target share — rebalance parts or exclude the domain " +
        "explicitly")
      d -> t
    }
    val thrCol = thresholds.foldRight(lit(-1L)) { case ((d, t), rest) =>
      when(col(domainCol) === lit(d), lit(t)).otherwise(rest)
    }
    df.where(hashBucket(col(keyCol), salt) < thrCol)
  }

  /** Temperature-resampled mixture (the α-sampling recipe multilingual
    * / multi-domain pretraining mixes with): target share per domain
    * ∝ n_d^α, α ∈ (0, 1] — α = 1 keeps natural proportions, α → 0
    * approaches uniform. Sampling is WITHOUT replacement and never
    * upsamples, so the feasible scale keeps the smallest-share domain
    * intact (rate 1) and downsamples the rest toward it:
    * rate_d = (n_min/n_d)^(1−α), realized as an integer threshold on
    * the md5 grid — deterministic across runs, partitionings, and
    * engines.
    *
    * α = 0.5 thresholds are computed through `sqrt` in a fixed
    * operation order: IEEE requires sqrt (unlike pow) to be CORRECTLY
    * rounded, so both engines produce bit-identical thresholds and the
    * sample is exactly reproducible cross-engine; other α use
    * `math.pow` (within 1 ulp — same rows in practice, but the
    * boundary guarantee is sqrt-only).
    *
    * One bounded count per domain to the driver; the corpus itself is
    * only filtered, never shuffled.
    */
  def resampleByTemperature(df: DataFrame, keyCol: String,
      domainCol: String, alpha: Double, salt: String = ""): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    // domains compare as strings; NULL is its own domain (counted AND
    // matched below via isNull — a bare === would count nulls into
    // nMin, drag every rate down, then match nothing and drop them)
    val dcol = col(domainCol).cast("string")
    val cnts = df.groupBy(dcol.as("__d")).count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1))
    require(cnts.nonEmpty, "no rows to resample")
    val nMin = cnts.map(_._2).min
    val thresholds = cnts.map { case (d, n) =>
      d -> temperatureThreshold(nMin, n, alpha, d.getOrElse("NULL"))
    }
    val thrCol = thresholds.foldRight(lit(-1L)) { case ((d, t), rest) =>
      val cond = d.map(dcol === lit(_)).getOrElse(dcol.isNull)
      when(cond, lit(t)).otherwise(rest)
    }
    df.where(hashBucket(col(keyCol), salt) < thrCol)
  }

  /** The md5-grid threshold for one domain under [[resampleByTemperature]]:
    * ⌊10⁴·(nMin/n)^(1−α)⌋, through correctly-rounded sqrt at α = 0.5.
    * A threshold of 0 means the domain falls below the 1/10000 grid
    * resolution and would be deleted ENTIRELY — at a realistic
    * head/tail corpus (n/nMin > 10^(4/(1−α))) that silently loses the
    * LARGEST domains, so it is refused by name instead.
    */
  private[graft] def temperatureThreshold(nMin: Long, n: Long,
      alpha: Double, domainLabel: String): Long = {
    val t =
      if (alpha == 0.5)
        math.floor(10000.0 * math.sqrt(nMin.toDouble) /
          math.sqrt(n.toDouble)).toLong
      else
        math.floor(10000.0 * math.pow(nMin.toDouble, 1 - alpha) *
          math.pow(n.toDouble, alpha - 1)).toLong
    require(t >= 1, s"domain '$domainLabel' ($n rows vs smallest $nMin) " +
      s"rates below the 1/10000 sampling grid at alpha=$alpha — raise " +
      "alpha or exclude the domain explicitly")
    t
  }

  /** Deterministic global shuffle into training shards — the export
    * step after curate/mix/pack: every row gets `(shard_id, pos)`
    * where shard assignment and within-shard order are both derived
    * from the md5 of the key (`salt` selects an independent epoch
    * permutation). Readers stream shards in parallel and interleave —
    * the standard sharded-training-data layout; a re-run, a different
    * partitioning, or a different engine produces the identical
    * permutation.
    *
    * Within-shard order is the full md5 hex with the key as tiebreak
    * (equal digests across DISTINCT keys would otherwise make `pos`
    * ambiguous). One shuffle (hash on `shard_id`); `pos` is a per-shard
    * `row_number`, sequential per shard but parallel across shards —
    * size `nShards` so a shard's rows fit a task comfortably
    * (corpus/nShards rows each; at 100 TB that means thousands of
    * shards, which is also what the training reader wants).
    */
  def shuffleShards(df: DataFrame, keyCol: String, nShards: Int,
      salt: String = ""): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(coalesce(col(keyCol).cast("string"), lit("")), lit(salt)))
    val shard = conv(substring(h, 1, 8), 16, 10).cast("long") % nShards
    df.withColumn("shard_id", shard)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard_id")).orderBy(h, col(keyCol)))
        .cast("long"))
  }

  /** k deterministic pseudo-random NEGATIVES per anchor — the
    * contrastive-training sampler (in-batch negatives bias toward
    * whatever sharding put together; this draws uniformly from the
    * whole corpus, reproducibly). Every doc gets a dense (shard, pos)
    * address from the [[shuffleShards]] md5 permutation; anchor a's
    * j-th probe hashes (a, j) to a shard and a position within it, and
    * the probes resolve through ONE equi-join — never an all-pairs or
    * per-anchor scan. Self-hits are dropped (an anchor may thus
    * receive < k negatives, deterministically); two probes of one
    * anchor may collide on the same negative (kept — the draw is
    * with-replacement across probes). Same salt → same negatives on
    * any engine, partitioning, or rerun.
    *
    * Scale: the address table costs one per-shard md5 sort (the
    * export-shuffle discipline); shard sizes are an nShards-row
    * broadcast; probes are k rows per anchor into an equi-join.
    */
  def hashNegatives(df: DataFrame, idCol: String, k: Int, nShards: Int,
      salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val addr = shuffleShards(df.select(col(idCol)), idCol, nShards, salt)
      .select(col(idCol).as("neg_id"), col("shard_id"), col("pos"))
    val sizes = addr.groupBy("shard_id").agg(count(lit(1)).as("__n"))
    val h = md5(concat(col("anchor_id").cast("string"), lit("#"),
      col("probe").cast("string"), lit(salt)))
    val probes = df.select(col(idCol).as("anchor_id"))
      .withColumn("probe", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("shard_id",
        conv(substring(h, 1, 8), 16, 10).cast("long") % nShards)
      .join(broadcast(sizes), Seq("shard_id"))
      .withColumn("pos",
        conv(substring(h, 9, 8), 16, 10).cast("long") % col("__n") + 1)
      .drop("__n")
    probes.join(addr, Seq("shard_id", "pos"))
      .where(col("neg_id") =!= col("anchor_id"))
      .select("anchor_id", "probe", "neg_id")
  }

  /** Drop rows below their GROUP's q-quantile of an integer score —
    * adaptive per-stratum filtering ("drop each language's shortest
    * quartile": a fixed global length cutoff is wrong for every
    * language at once). The quantile is a RATIONAL qNum/qDen and the
    * cutoff is exact: the smallest score whose cumulative row count
    * satisfies `cum·qDen ≥ total·qNum` — all-integer, engine- and
    * partitioning-invariant (ties share one cumulative count under
    * the default RANGE frame on both engines). Null scores never
    * survive. Shuffle is bounded by groups × distinct scores (the
    * histogram), NOT corpus rows — the same no-global-sort posture as
    * [[topFractionByScore]], per group and lower-tailed; the per-group
    * cutoff table is tiny and joins back broadcast.
    */
  def dropBelowGroupQuantile(df: DataFrame, groupCol: String,
      scoreCol: String, qNum: Long, qDen: Long): DataFrame = {
    require(qDen > 0 && qNum >= 0 && qNum <= qDen,
      s"quantile must be a rational in [0,1]: $qNum/$qDen")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))
    // the histogram must count REAL scores only: nulls sort first under
    // the cumulative window, so leaving them in inflates __cum/__tot and
    // lands the cutoff below the stated q-quantile of actual scores (the
    // final >= cutoff predicate already drops null-score rows; this
    // keeps them from bending the cutoff too)
    val cuts = df.where(col(scoreCol).isNotNull)
      .groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum("__c").over(w))
      .withColumn("__tot", sum("__c").over(Window.partitionBy(col(groupCol))))
      .where(col("__cum") * qDen >= col("__tot") * qNum)
      .groupBy(col(groupCol)).agg(min(col(scoreCol)).as("__cutoff"))
    df.join(cuts, Seq(groupCol), "left")
      .where(col(scoreCol) >= col("__cutoff"))
      .drop("__cutoff")
  }

  /** Export-integrity manifest for sharded output: per shard, the row
    * count and two ORDER-INVARIANT content signatures over `sigCols` —
    * `sig_xor` (xor of 56-bit row hashes; cheap, but a row duplicated
    * an even number of times cancels) and `sig_sum` (sum of the hashes
    * mod 1e9+7; catches even-multiplicity duplicates, overflow-safe to
    * ~9·10⁹ rows per shard). Together they verify a copy/move/rewrite
    * of a 100 TB export without sorting anything: recompute on the
    * destination, compare ≤ nShards tiny rows. Row hash = md5 over the
    * \\u0001-joined column strings with \\u0002 standing in for null
    * (plain concat would make ("ab","c") collide with ("a","bc") and
    * null collide with empty). One partial-agg pass, map-side
    * combinable, ≤ nShards rows shuffle.
    */
  def shardManifest(df: DataFrame, shardCol: String,
      sigCols: Seq[String]): DataFrame = {
    require(sigCols.nonEmpty, "shardManifest needs signature columns")
    val joined = concat(sigCols.flatMap(c =>
      Seq(coalesce(col(c).cast("string"), lit("\u0002")), lit("\u0001")))
      .dropRight(1): _*)
    val h = conv(substring(md5(joined), 1, 14), 16, 10).cast("long")
    df.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        call_function("bit_xor", h).as("sig_xor"),
        sum(h % 1000000007L).as("sig_sum"))
  }

  /** Keep the top `fraction` of rows by an INTEGER score under the
    * total deterministic order (score desc, key asc) — the
    * quality-threshold selection step of a curation pipeline
    * (FineWeb-Edu-style "keep the top 10 % by classifier score").
    * Exactly `ceil(fraction · N)` rows survive; rows with a null
    * score never do.
    *
    * Scale posture: the textbook formulation — `rank() OVER (ORDER BY
    * score DESC)` — is a single-task global sort at 100 TB. This is a
    * two-pass histogram cutoff instead: (1) a partial-agg'd
    * `groupBy(score).count()` histogram, bounded by score cardinality
    * (`require`d ≤ `maxDistinctScores` — quality scores live on small
    * integer grids by construction), from which the driver derives
    * the cutoff score s* and the surviving tie count; (2) `score >
    * s*` is a pure zero-shuffle filter, and only the BOUNDARY CLASS
    * (`score = s*`) pays an ordered take of its first `rem` keys —
    * ~N/|grid| rows, not N. Worst case (every row the same score)
    * degenerates to an ordered take of one class; that is the
    * problem's intrinsic cost, not a plan artifact.
    */
  def topFractionByScore(df: DataFrame, keyCol: String, scoreCol: String,
      fraction: Double, maxDistinctScores: Int = 1 << 20): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    val hist = df.where(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).cast("long").as("__s"))
      .agg(count(lit(1)).as("__c"))
      .limit(maxDistinctScores + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    require(hist.length <= maxDistinctScores,
      s"more than $maxDistinctScores distinct scores in $scoreCol — " +
        "not a bounded quality grid; bucket the score first")
    val n = hist.map(_._2).sum
    val quota = math.ceil(fraction * n).toLong
    if (quota == 0) return df.where(lit(false))
    // walk the histogram best-first to the cutoff class
    var (rem, i) = (quota, 0)
    // Ordering.reverse, not sortBy(-_): negating Long.MinValue overflows
    val sorted = hist.sortBy(_._1)(Ordering[Long].reverse)
    while (sorted(i)._2 < rem) { rem -= sorted(i)._2; i += 1 }
    val (sStar, tiesAtCut) = sorted(i)
    val above = df.where(col(scoreCol).cast("long") > lit(sStar))
    if (rem == tiesAtCut) above.unionByName(
      df.where(col(scoreCol).cast("long") === lit(sStar)))
    else {
      require(rem <= Int.MaxValue,
        s"$rem boundary-class survivors exceed a single take — " +
          "refine the score grid so the cutoff class is smaller")
      above.unionByName(
        // ordered take of the boundary class only (TakeOrdered, not a
        // global sort): its first `rem` keys ascending
        df.where(col(scoreCol).cast("long") === lit(sStar))
          .orderBy(col(keyCol)).limit(rem.toInt))
    }
  }

  /** Contiguous token-budget sharding (sequence packing / shard
    * planning): rows ordered by `keyCol` are assigned to consecutive
    * bins of ~`budget` tokens — `bin_id = floor(exclusive-prefix-sum
    * (weight) / budget)` — so shard N of the training corpus holds a
    * contiguous, reproducible ~budget-token slice.
    *
    * The semantics are exactly one global-ordered window prefix sum —
    * which Spark executes as a SINGLE task (an `orderBy`-without-
    * `partitionBy` window collapses to one partition): the textbook
    * 100 TB bottleneck. This implementation is the classic two-phase
    * distributed prefix sum instead: (1) rows map to `nBuckets`
    * key-RANGE buckets (monotone in key, so bucket order = key order);
    * (2) one tiny aggregation collects per-bucket totals (bounded:
    * nBuckets rows) and the driver turns them into per-bucket
    * exclusive offsets, shipped back as a broadcast join; (3) a
    * per-BUCKET window (parallel across buckets) adds the local
    * exclusive prefix. One shuffle + one bounded collect; per-task
    * work is corpus/nBuckets.
    *
    * Contract: `keyCol` numeric with UNIQUE values (duplicate keys
    * would make the within-bucket order — and thus bins — ambiguous);
    * weights non-negative (`require`d from the same totals pass,
    * free). Dense-ish keys spread buckets evenly; pathological key
    * clustering skews bucket sizes but never correctness.
    */
  def packByTokenBudget(df: DataFrame, keyCol: String, weightCol: String,
      budget: Long, binCol: String = "bin_id",
      nBuckets: Int = 256): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val stats = df.agg(
      min(col(keyCol)).cast("double"), max(col(keyCol)).cast("double"),
      min(col(weightCol)).cast("long")).head()
    if (stats.isNullAt(0)) return df.withColumn(binCol, lit(0L))
    val (lo, hi) = (stats.getDouble(0), stats.getDouble(1))
    require(!stats.isNullAt(2), s"$weightCol has no non-null values")
    require(stats.getLong(2) >= 0, s"negative weights in $weightCol")
    val span = hi - lo + 1.0
    val bucket = least(
      floor((col(keyCol).cast("double") - lit(lo)) * nBuckets / lit(span)),
      lit((nBuckets - 1).toLong)).cast("int").as("__pb")
    val bucketed = df.withColumn("__pb", bucket)
      .withColumn("__w", col(weightCol).cast("long"))
    // bounded collect: nBuckets (bucket, total) rows -> exclusive
    // per-bucket offsets, shipped back as a tiny broadcast join
    val totals = bucketed.groupBy(col("__pb")).agg(sum(col("__w")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .init.zip(totals).map { case ((_, off), (b, _)) => (b, off) }
    import df.sparkSession.implicits._
    val offsetsDf = offsets.toSeq.toDF("__pb", "__off")
    val w = Window.partitionBy(col("__pb")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsetsDf), Seq("__pb"))
      .withColumn(binCol,
        floor((coalesce(sum(col("__w")).over(w), lit(0L)) + col("__off"))
          .cast("double") / lit(budget.toDouble)).cast("long"))
      .drop("__pb", "__w", "__off")
  }
}
