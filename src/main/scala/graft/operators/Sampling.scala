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

  /** Keep a deterministic `fraction` of rows by key hash — the
    * reproducible corpus downsample (same keys survive at every
    * partitioning and on every engine).
    */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.where(hashBucket(col(keyCol), salt) < math.round(fraction * 10000).toInt)
  }
}
