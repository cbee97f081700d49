package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** The reference's feature-expression language IS Spark SQL
  * (SURVEY.md §2.3; e2e examples python/test-script/feathrs_e2e.py:17-60)
  * plus a handful of Feathr extension scalars. We rewrite those to
  * Catalyst built-ins — name-for-name, so whole-stage codegen is kept —
  * instead of registering UDFs:
  *   cast_float(x)  → float(x)
  *   cast_double(x) → double(x)
  *   cast_int(x)    → int(x)
  *   isPresent(x)   → isnotnull(x)
  *   isNull... stays (Spark builtin)
  */
object FeathrExpr {
  private val renames: Seq[(String, String)] = Seq(
    "cast_float" -> "float",
    "cast_double" -> "double",
    "cast_int" -> "int",
    "isPresent" -> "isnotnull",
    "is_present" -> "isnotnull")

  /** Rewrite Feathr extension function names to Spark SQL builtins.
    * Pure name substitution at word boundaries — argument lists pass
    * through untouched, so nesting and arbitrary sub-expressions work.
    */
  def rewrite(sqlExpr: String): String =
    renames.foldLeft(sqlExpr) { case (s, (from, to)) =>
      s.replaceAll("(?i)\\b" + from + "\\b\\s*\\(", to + "(")
    }

  /** Parse a Feathr feature expression into a Catalyst Column. */
  def column(sqlExpr: String): Column = expr(rewrite(sqlExpr))
}

/** Registry for named UDF transforms
  * (reference `Transformation::Udf { name }`, feathr-rs/src/model.rs:274-276).
  * A registered function maps the source DataFrame to the feature Column,
  * letting it reference any source columns. Prefer `Expr` features —
  * these exist for the reference's named-UDF parity only.
  */
object UdfRegistry {
  private val fns = scala.collection.concurrent.TrieMap[String, DataFrame => Column]()
  def register(name: String)(fn: DataFrame => Column): Unit = fns(name) = fn
  def resolve(name: String): DataFrame => Column =
    fns.getOrElse(name, throw new NoSuchElementException(s"UDF $name not registered"))
  def registerSqlUdf[A, B](spark: SparkSession, name: String, f: A => B)(
      implicit ta: reflect.runtime.universe.TypeTag[A],
      tb: reflect.runtime.universe.TypeTag[B]): Unit =
    spark.udf.register(name, f)
}
