package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tight-loop dot-product kernels over Catalyst array data. Elements
  * are widened to double BEFORE multiplying and summed in a sequential
  * left fold — bit-identical to the higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) and to DuckDB's
  * `list_sum(list_transform(...))`, so oracle parity is preserved while
  * the evaluation moves from interpreted HOFs (CodegenFallback) into
  * whole-stage codegen.
  */
object DotProduct {
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    s
  }
  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)

  /** Integer dot over int arrays — the int8-quantized scoring kernel.
    * Accumulates in a LONG (exact: |q| ≤ 127 ⇒ each product ≤ 16129,
    * no overflow below ~5·10¹⁴ elements), converted to double once at
    * the end — integer multiply-adds are the memory-bandwidth win the
    * quantized path exists for.
    */
  def dotII(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L; var i = 0
    while (i < n) { s += a.getInt(i).toLong * b.getInt(i).toLong; i += 1 }
    s.toDouble
  }
}

/** `dot(array<float|double>, array<float|double>) -> double` as a
  * native codegen'd expression — the ANN hot path (corpus × queries
  * scoring) must not run interpreted at 100 TB.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elem(t: DataType): DataType = t match {
    case ArrayType(e, _) => e
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elem(left.dataType), elem(right.dataType)) match {
      case (FloatType | DoubleType, FloatType | DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot needs two ARRAY<FLOAT|DOUBLE> or two ARRAY<INT>, " +
          s"got ${left.dataType} / ${right.dataType}")
    }

  private lazy val method: String =
    (elem(left.dataType), elem(right.dataType)) match {
      case (FloatType, FloatType)     => "dotFF"
      case (DoubleType, DoubleType)   => "dotDD"
      case (FloatType, DoubleType)    => "dotFD"
      case (IntegerType, IntegerType) => "dotII"
      case _                          => "dotDF"
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    method match {
      case "dotFF" => DotProduct.dotFF(x, y)
      case "dotDD" => DotProduct.dotDD(x, y)
      case "dotFD" => DotProduct.dotFD(x, y)
      case "dotII" => DotProduct.dotII(x, y)
      case _       => DotProduct.dotDF(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DotProduct.$method($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object DotProductExpr {
  import org.apache.spark.sql.graft.ColumnBridge

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** sqrt(dot(a, a)) — same sequential fold as the HOF l2Norm. */
  def l2Norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dot(a, a))
}
