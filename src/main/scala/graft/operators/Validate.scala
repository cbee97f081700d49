package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the deequ-shaped contract
  * gate a pipeline runs before publishing a table: each check yields
  * `(check, passed, violations)` so CI can fail on any `passed=false`
  * row with an exact defect count attached.
  *
  * Execution shape at scale: every ROW-level check (`NotNull`,
  * `InRange`, `InSet`, `MatchesRegex`, `SizeBetween`) folds into ONE
  * aggregate over a single corpus pass (conditional counts, map-side
  * combinable); `Unique` adds one groupBy per distinct key set;
  * `RefIntegrity` one broadcast-or-shuffle anti-join per reference.
  * Nothing collects row-level violations to the driver — only counts.
  */
object Validate {

  sealed trait Check { def name: String }

  /** `col` has no nulls. */
  case class NotNull(col: String) extends Check {
    def name = s"not_null($col)"
  }

  /** `[lo, hi]` inclusive; nulls don't violate (compose with NotNull). */
  case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($col,$lo,$hi)"
  }

  /** value ∈ set; nulls don't violate. Values are part of the check
    * identity (two InSet checks on one column stay distinguishable).
    */
  case class InSet(col: String, values: Seq[String]) extends Check {
    def name = s"in_set($col:${values.mkString("|")})"
  }

  /** full-match against a Java/RE2-parity regex; nulls don't violate. */
  case class MatchesRegex(col: String, pattern: String) extends Check {
    def name = s"matches_regex($col)"
  }

  /** table row count within `[lo, hi]`. */
  case class SizeBetween(lo: Long, hi: Long) extends Check {
    def name = s"size_between($lo,$hi)"
  }

  /** no duplicate (cols) tuple; violations = rows beyond the first of
    * each duplicated tuple (0 when unique).
    */
  case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** every non-null `col` value exists in `refCol` of `ref` —
    * foreign-key containment; violations = orphan ROWS. `label`
    * disambiguates several references over the same column pair.
    */
  case class RefIntegrity(col: String, ref: DataFrame, refCol: String,
      label: String = "") extends Check {
    def name = s"ref_integrity($col->$refCol" +
      (if (label.isEmpty) ")" else s",$label)")
  }

  private def rowViolation(df: DataFrame, c: Check): Option[Column] = c match {
    case NotNull(col0) => Some(col(col0).isNull)
    case InRange(col0, lo, hi) =>
      Some(col(col0).isNotNull && (col(col0) < lo || col(col0) > hi))
    case InSet(col0, vs) =>
      Some(col(col0).isNotNull && !col(col0).isin(vs: _*))
    case MatchesRegex(col0, p) =>
      Some(col(col0).isNotNull && !col(col0).rlike("^(?:" + p + ")$"))
    case _ => None
  }

  /** Run all checks; returns `(check string, passed bool, violations
    * long)` — one row per check, stable order-independent content.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val spark = df.sparkSession
    import spark.implicits._

    val rowChecks = checks.flatMap(c => rowViolation(df, c).map(c -> _))
    val sizeChecks = checks.collect { case s: SizeBetween => s }

    // single corpus pass: conditional-count aggregate per row check,
    // plus the row count when any SizeBetween needs it
    val aggs =
      rowChecks.map { case (c, v) =>
        sum(when(v, 1L).otherwise(0L)).as(c.name)
      } ++ (if (sizeChecks.nonEmpty) Seq(count(lit(1)).as("__n")) else Nil)
    val onePass: Seq[(String, Boolean, Long)] =
      if (aggs.isEmpty) Nil
      else {
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        val rowRes = rowChecks.zipWithIndex.map { case ((c, _), i) =>
          val viol = if (row.isNullAt(i)) 0L else row.getLong(i) // empty df
          (c.name, viol == 0L, viol)
        }
        val sizeRes = sizeChecks.map { s =>
          val n = row.getLong(row.length - 1)
          (s.name, n >= s.lo && n <= s.hi, if (n >= s.lo && n <= s.hi) 0L else n)
        }
        rowRes ++ sizeRes
      }

    val uniqueRes = checks.collect { case u: Unique =>
      val dups = df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("__c"))
        .where(col("__c") > 1)
        .agg(coalesce(sum(col("__c") - 1), lit(0L))).head().getLong(0)
      (u.name, dups == 0L, dups)
    }

    val refRes = checks.collect { case r: RefIntegrity =>
      val orphans = df.where(col(r.col).isNotNull)
        .join(r.ref.select(col(r.refCol).as(r.col)).distinct(),
          Seq(r.col), "left_anti")
        .count()
      (r.name, orphans == 0L, orphans)
    }

    (onePass ++ uniqueRes ++ refRes)
      .toDF("check", "passed", "violations")
  }
}
