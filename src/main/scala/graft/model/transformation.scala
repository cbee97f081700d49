package graft.model

import java.time.Duration

/** Aggregation kinds for sliding-window features
  * (reference `Aggregation` enum, feathr-rs/src/model.rs:198-216).
  */
sealed trait Aggregation
object Aggregation {
  case object NOP extends Aggregation // no aggregation (model.rs:201-202)
  case object SUM extends Aggregation
  case object COUNT extends Aggregation
  case object AVG extends Aggregation
  case object MIN extends Aggregation
  case object MAX extends Aggregation
  /** most recent value by source timestamp (model.rs:214-215) */
  case object LATEST extends Aggregation
  /** collect values into a set (model.rs:207-208) */
  case object UNION extends Aggregation
  // element-wise folds over array-valued def_expr (model.rs:209-213)
  case object ELEMENTWISE_AVG extends Aggregation
  case object ELEMENTWISE_MIN extends Aggregation
  case object ELEMENTWISE_MAX extends Aggregation
  case object ELEMENTWISE_SUM extends Aggregation

  def parse(s: String): Aggregation = s.toUpperCase match {
    case "NOP" => NOP
    case "SUM" => SUM
    case "COUNT" => COUNT
    case "AVG" => AVG
    case "MIN" => MIN
    case "MAX" => MAX
    case "LATEST" => LATEST
    case "UNION" => UNION
    case "ELEMENTWISE_AVG" => ELEMENTWISE_AVG
    case "ELEMENTWISE_MIN" => ELEMENTWISE_MIN
    case "ELEMENTWISE_MAX" => ELEMENTWISE_MAX
    case "ELEMENTWISE_SUM" => ELEMENTWISE_SUM
    case other => throw new IllegalArgumentException(s"unknown aggregation: $other")
  }
}

/** Feature transformation ADT
  * (reference `Transformation`, feathr-rs/src/model.rs:218-296).
  */
sealed trait Transformation
object Transformation {

  /** Row-level Spark SQL expression (model.rs:250-253); any plain string
    * in the DSL coerces to this (model.rs:296-307).
    */
  case class Expr(sqlExpr: String) extends Transformation

  /** Sliding-window aggregation over `(obs_ts - window, obs_ts]`
    * (model.rs:254-273; ctor model.rs:279-294).
    *
    * @param defExpr row-level measure expression over source columns
    * @param aggFunc fold applied within the window
    * @param window  lookback duration (HOCON grammar)
    * @param groupBy optional sub-key: aggregate per (key, groupBy), then
    *                collect groups into the feature value (model.rs:267-268)
    * @param filter  pre-aggregation predicate (model.rs:269-270)
    * @param limit   top-k records/groups kept per key (model.rs:271-272)
    */
  case class WindowAgg(
      defExpr: String,
      aggFunc: Aggregation,
      window: Duration,
      groupBy: Option[String] = None,
      filter: Option[String] = None,
      limit: Option[Int] = None) extends Transformation

  /** Named registered UDF transform (model.rs:274-276). */
  case class Udf(name: String) extends Transformation

  implicit def fromString(s: String): Transformation = Expr(s)

  def windowAgg(defExpr: String, agg: String, window: String): WindowAgg =
    WindowAgg(defExpr, Aggregation.parse(agg), Durations.parse(window))
}
