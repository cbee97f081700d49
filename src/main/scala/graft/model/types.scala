package graft.model

import org.apache.spark.sql.types._

/** Feature value types.
  *
  * Mirrors the reference's `ValueType` (feathr-rs/src/model.rs:12-24):
  * UNSPECIFIED, BOOL, INT32, INT64, FLOAT, DOUBLE, STRING, BYTES.
  */
sealed abstract class ValueType(val name: String) {
  def sparkType: DataType = this match {
    case ValueType.BOOL        => BooleanType
    case ValueType.INT32       => IntegerType
    case ValueType.INT64       => LongType
    case ValueType.FLOAT       => FloatType
    case ValueType.DOUBLE      => DoubleType
    case ValueType.STRING      => StringType
    case ValueType.BYTES       => BinaryType
    case ValueType.UNSPECIFIED => NullType // resolved from the expression at analysis time
  }
}
object ValueType {
  case object UNSPECIFIED extends ValueType("UNSPECIFIED")
  case object BOOL        extends ValueType("BOOLEAN")
  case object INT32       extends ValueType("INT")
  case object INT64       extends ValueType("LONG")
  case object FLOAT       extends ValueType("FLOAT")
  case object DOUBLE      extends ValueType("DOUBLE")
  case object STRING      extends ValueType("STRING")
  case object BYTES       extends ValueType("BYTES")

  val all: Seq[ValueType] =
    Seq(UNSPECIFIED, BOOL, INT32, INT64, FLOAT, DOUBLE, STRING, BYTES)
  def parse(s: String): ValueType =
    all.find(v => v.name.equalsIgnoreCase(s) || v.toString.equalsIgnoreCase(s))
      .getOrElse(throw new IllegalArgumentException(s"unknown ValueType: $s"))
}

/** DENSE | SPARSE (feathr-rs/src/model.rs:43-47). */
sealed trait TensorCategory
object TensorCategory {
  case object DENSE  extends TensorCategory
  case object SPARSE extends TensorCategory
}

/** Feature types are tensors (feathr-rs/src/model.rs:55-63):
  * scalars are 0-d dense tensors; vectors are 1-d. The reference's vector
  * constructors have a copy-paste bug (all set valType BOOL,
  * model.rs:110-143); we implement the intended value types.
  */
case class FeatureType(
    tensorCategory: TensorCategory,
    dimensionType: Seq[ValueType],
    valType: ValueType) {

  /** Spark SQL representation (SURVEY.md §1.2):
    * scalar → primitive; dense n-d → nested ArrayType; sparse →
    * struct(indices array, values array).
    */
  def sparkType: DataType = tensorCategory match {
    case TensorCategory.DENSE =>
      dimensionType.foldLeft(valType.sparkType: DataType)((t, _) => ArrayType(t))
    case TensorCategory.SPARSE =>
      StructType(Seq(
        StructField("indices", ArrayType(
          dimensionType.headOption.getOrElse(ValueType.INT32).sparkType)),
        StructField("values", ArrayType(valType.sparkType))))
  }
}

object FeatureType {
  import TensorCategory._
  private def scalar(v: ValueType) = FeatureType(DENSE, Nil, v)
  private def vector(v: ValueType) = FeatureType(DENSE, Seq(ValueType.INT32), v)

  val BOOLEAN: FeatureType = scalar(ValueType.BOOL)
  val INT32: FeatureType   = scalar(ValueType.INT32)
  val INT64: FeatureType   = scalar(ValueType.INT64)
  val FLOAT: FeatureType   = scalar(ValueType.FLOAT)
  val DOUBLE: FeatureType  = scalar(ValueType.DOUBLE)
  val STRING: FeatureType  = scalar(ValueType.STRING)
  val BYTES: FeatureType   = scalar(ValueType.BYTES)
  val UNSPECIFIED: FeatureType = scalar(ValueType.UNSPECIFIED)

  val INT32_VECTOR: FeatureType  = vector(ValueType.INT32)
  val INT64_VECTOR: FeatureType  = vector(ValueType.INT64)
  val FLOAT_VECTOR: FeatureType  = vector(ValueType.FLOAT)
  val DOUBLE_VECTOR: FeatureType = vector(ValueType.DOUBLE)
}

/** Entity key for a feature (feathr-rs/src/model.rs:145-155).
  * `DUMMY_KEY` (`NOT_NEEDED`, model.rs:158-167) marks passthrough
  * features computed directly on observation rows — no join.
  */
case class TypedKey(
    keyColumn: String,
    keyColumnType: ValueType,
    keyColumnAlias: Option[String] = None,
    fullName: Option[String] = None,
    description: Option[String] = None) {
  def alias: String = keyColumnAlias.getOrElse(keyColumn)
  def as(a: String): TypedKey = copy(keyColumnAlias = Some(a))
  def isDummy: Boolean = keyColumn == TypedKey.DUMMY_KEY.keyColumn
}
object TypedKey {
  val DUMMY_KEY: TypedKey = TypedKey(
    "NOT_NEEDED", ValueType.UNSPECIFIED, Some("NOT_NEEDED"),
    Some("NOT_NEEDED"), Some("A dummy typed key for passthrough features."))
}
