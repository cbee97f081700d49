package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary induction (the
  * Sennrich-style subword trainer a tokenization pipeline needs
  * before it can count or pack tokens with a real vocab).
  *
  * The 100 TB shape: the corpus is touched ONCE, to build the
  * word-frequency table ([[wordFreq]] — one corpus shuffle, keyed by
  * word). Every merge iteration then runs on that table alone —
  * bounded by DISTINCT-WORD cardinality, not corpus size — as (a) one
  * pair-count aggregation over the current segmentations and (b) one
  * map-side merge application; only the single argmax pair row ever
  * reaches the driver per iteration. This is the textbook trainer's
  * `get_stats`/`merge_vocab` loop re-expressed as k bounded Spark
  * jobs instead of a driver dictionary.
  *
  * Determinism: the merge choice is (count desc, left asc, right asc)
  * — ties cannot reorder merges between runs or partitionings. Merge
  * application is the greedy LEFT-TO-RIGHT fold (an "aaa" word under
  * merge (a,a) becomes ["aa","a"]), matching the reference BPE
  * semantics. The fold is a Catalyst `aggregate` lambda —
  * interpreted, but running over the bounded word table, not the
  * corpus; each iteration round-trips through [[Spill]] so k
  * iterations do not stack k nested lambda plans into one
  * Catalyst analysis.
  */
object BpeTrainer {

  /** One corpus pass: normalized word → occurrence count. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.words(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy("term")
      .agg(count(lit(1)).as("freq"))

  /** Character-level segmentation of each word (the iteration-0
    * state): term, freq, syms = one single-character symbol per
    * position.
    */
  def charSegmentation(wf: DataFrame): DataFrame =
    wf.select(col("term"), col("freq"),
      // split on the empty pattern yields one element per character
      // plus a trailing "" on some engines — filter keeps it exact
      filter(split(col("term"), ""), s => s =!= lit("")).as("syms"))

  /** Adjacent-pair counts over the current segmentations, weighted by
    * word frequency. Bounded by Σ word-lengths of the DISTINCT word
    * table.
    */
  def pairCounts(seg: DataFrame): DataFrame =
    seg.where(size(col("syms")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Greedy left-to-right application of one merge (a, b) → a+b to a
    * symbol array.
    */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** The trained artifact: the ordered merge list and the final
    * word → segmentation table (which IS the vocabulary application
    * map — tokenizing a corpus is a broadcast join against it, with
    * character fallback for unseen words).
    */
  case class Bpe(merges: Seq[(String, String)], segmentation: DataFrame)

  /** Run `numMerges` iterations from the character segmentation of
    * `wf`. Stops early when no pair occurs at least `minCount` times.
    */
  def train(wf: DataFrame, numMerges: Int, minCount: Long = 2): Bpe = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    var seg = Spill.roundTrip(charSegmentation(wf))
    val merges = Seq.newBuilder[(String, String)]
    var it = 0
    var exhausted = false
    while (it < numMerges && !exhausted) {
      // one row to the driver: the argmax pair under the
      // deterministic (count desc, pair asc) order
      val top = pairCounts(seg)
        .where(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        seg = Spill.roundTrip(
          seg.withColumn("syms", applyMerge(col("syms"), a, b)))
        it += 1
      }
    }
    Bpe(merges.result(), seg)
  }

  /** Token counts under the trained vocabulary: each corpus word joins
    * its segmentation (the map is bounded by distinct words; AQE
    * broadcasts it at realistic vocab sizes), unseen words fall back
    * to characters. Returns one row per (docId, token) occurrence
    * pair count — the serving-side contract of the trainer.
    */
  def tokenCounts(df: DataFrame, textCol: String, idCol: String,
      bpe: Bpe): DataFrame = {
    val seg = bpe.segmentation.select(col("term"), col("syms"))
    df.select(col(idCol), explode(TextAnalysis.words(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .join(seg, Seq("term"), "left_outer")
      .select(col(idCol), explode(coalesce(col("syms"),
        filter(split(col("term"), ""), s => s =!= lit("")))).as("token"))
      .groupBy(idCol, "token")
      .agg(count(lit(1)).as("cnt"))
  }
}
