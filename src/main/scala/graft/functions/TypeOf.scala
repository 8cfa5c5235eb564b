package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB-style type names for Spark DataTypes — drives `typeof(x)`
  * (reference surface: DuckDB's typeof(), reachable via pass-through,
  * SURVEY §2-B.8 "Conversion"). The name is a property of the *plan*,
  * not the data, so the expression is foldable and costs nothing at
  * runtime.
  */
object DuckTypeNames {
  def of(dt: DataType): String = dt match {
    case BooleanType          => "BOOLEAN"
    case ByteType             => "TINYINT"
    case ShortType            => "SMALLINT"
    case IntegerType          => "INTEGER"
    case LongType             => "BIGINT"
    case FloatType            => "FLOAT"
    case DoubleType           => "DOUBLE"
    case d: DecimalType       => s"DECIMAL(${d.precision},${d.scale})"
    case StringType           => "VARCHAR"
    case BinaryType           => "BLOB"
    case DateType             => "DATE"
    case TimestampNTZType     => "TIMESTAMP"
    case TimestampType        => "TIMESTAMP WITH TIME ZONE"
    case a: ArrayType         => s"${of(a.elementType)}[]"
    case m: MapType           => s"MAP(${of(m.keyType)}, ${of(m.valueType)})"
    case s: StructType =>
      s.fields.map(f => s"${f.name} ${of(f.dataType)}").mkString("STRUCT(", ", ", ")")
    case _: DayTimeIntervalType | _: YearMonthIntervalType | CalendarIntervalType => "INTERVAL"
    case NullType             => "\"NULL\""
    case other                => other.sql
  }
}

/** `typeof(expr)` → the DuckDB name of expr's static type. Foldable, so
  * ConstantFolding replaces it with a string literal before execution —
  * the CodegenFallback never runs in practice.
  */
case class TypeOf(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  private lazy val name = UTF8String.fromString(DuckTypeNames.of(child.dataType))
  override def eval(input: InternalRow): Any = name
  override protected def withNewChildInternal(newChild: Expression): TypeOf = copy(newChild)
}
