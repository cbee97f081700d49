package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity guards for exported datasets and reports. A corpus that
  * ships to training or a stats report that ships to a dashboard must
  * not re-identify individuals through rare quasi-identifier
  * combinations (the classic linkage attack); PII redaction
  * ([[TextAnalysis.redactPii]]) scrubs VALUES, this scrubs
  * STRUCTURE — a (lang, source, length-bucket) cell of size 1 is a
  * fingerprint no redaction removes.
  *
  * Scale posture: both operators aggregate the quasi-identifier
  * combinations FIRST — a frame bounded by distinct-combo cardinality,
  * not corpus rows — so the corpus itself is never shuffled:
  * [[kAnonymize]] semi-joins the bounded combo table back (broadcast
  * under AQE at any realistic combo count), and
  * [[kAnonymousReport]]'s suppression pass runs entirely on the
  * already-aggregated report rows.
  */
object Privacy {

  /** Drop rows whose quasi-identifier combination occurs fewer than
    * `k` times. Exact threshold suppression: the surviving dataset is
    * k-anonymous w.r.t. `quasiCols`.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 1, s"k must be positive: $k")
    val keep = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") >= k)
      .select(quasiCols.map(c => col(c).as(s"__keep_$c")): _*)
    // null-safe equality: groupBy above (and the SQL window the oracle
    // uses) treat NULL as one combination, so the join back must too —
    // a plain equi-semi-join would silently drop every null-bearing
    // combination no matter how common
    df.join(keep,
      quasiCols.map(c => col(c) <=> col(s"__keep_$c")).reduce(_ && _),
      "left_semi")
  }

  /** Aggregate report by `byCols` with small-cell suppression: cells
    * with at least `k` rows keep their dimensions; all smaller cells
    * are rolled into ONE residual row with every dimension replaced by
    * `"*"`, so report totals still reconcile with the corpus (the
    * census-table discipline). Dimensions are cast to string to carry
    * the mask; measures are `n_rows` plus one additive `sum_<c>` per
    * `sumCols` entry (additivity is what lets the residual re-merge
    * from cell aggregates without a second corpus pass — distinct
    * counts do NOT qualify).
    *
    * `strictResidual = true` additionally drops a residual that is
    * itself smaller than `k` (secondary suppression: a tiny residual
    * tells an attacker a rare combination exists); the default keeps
    * it so totals reconcile.
    */
  def kAnonymousReport(df: DataFrame, byCols: Seq[String], k: Long,
      sumCols: Seq[String] = Nil,
      strictResidual: Boolean = false): DataFrame = {
    require(byCols.nonEmpty, "at least one report dimension")
    require(k >= 1, s"k must be positive: $k")
    val sums = sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    val per = df.groupBy(byCols.map(c => col(c).cast("string").as(c)): _*)
      .agg(count(lit(1)).as("n_rows"), sums: _*)
    val keep = per.where(col("n_rows") >= k)
    val residualSums = col("n_rows") +: sumCols.map(c => col(s"sum_$c"))
    var residual = per.where(col("n_rows") < k)
      .groupBy() // all suppressed cells → one row
      .agg(sum(residualSums.head).as("n_rows"),
        sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
      .where(col("n_rows").isNotNull) // no suppressed cells → no row
      .select(byCols.map(c => lit("*").as(c)) ++
        (col("n_rows") +: sumCols.map(c => col(s"sum_$c"))): _*)
    if (strictResidual) residual = residual.where(col("n_rows") >= k)
    keep.unionByName(residual)
  }
}
