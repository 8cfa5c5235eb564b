package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math over `ARRAY<FLOAT>` / `ARRAY<DOUBLE>` columns.
  *
  * These power the similarity-search operators (SURVEY extension
  * surface; DuckDB exposes the same as list_dot_product /
  * list_cosine_similarity). A dedicated codegen'd BinaryExpression
  * keeps the inner loop primitive (no per-element lambda invocation the
  * way `zip_with` + `aggregate` would) — at 100 TB the dot product is
  * the innermost loop of a brute-force ANN pass over billions of pairs,
  * so this is the single hottest instruction sequence in that workload.
  *
  * Accumulation is sequential left-to-right in Double, matching
  * DuckDB's list_dot_product fold order, so results are bit-identical
  * for the oracle's hash compare.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY<FLOAT|DOUBLE> args, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  protected def leftElem: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  protected def rightElem: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType

  protected def get(a: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType  => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case _          => throw new IllegalStateException(s"vector element: $dt")
  }
}

/** `vector_dot(a, b)` — Σ a_i * b_i. Null if either side is null;
  * mismatched lengths fold over the common prefix (callers validate). */
case class VectorDot(left: Expression, right: Expression) extends VectorFold {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (lt, rt) = (leftElem, rightElem)
    var s = 0.0; var i = 0
    while (i < n) { s += get(a, i, lt) * get(b, i, rt); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val getL = VectorDot.genGet(a, i, leftElem)
      val getR = VectorDot.genGet(b, i, rightElem)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += $getL * $getR;
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
}

object VectorDot {
  private[functions] def genGet(arr: String, i: String, dt: DataType): String = dt match {
    case FloatType  => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case _          => throw new IllegalStateException(s"vector element: $dt")
  }
}

/** `vector_norm(a)` as dot(a,a) is enough; cosine = dot / sqrt(n1*n2) is
  * composed at the Column level so each piece stays codegen-friendly. */
object VectorFunctions {
  import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}

  def vectorDot(a: Column, b: Column): Column =
    toColumn(VectorDot(toExpression(a), toExpression(b)))

  def cosineSimilarity(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    vectorDot(a, b) / sqrt(vectorDot(a, a) * vectorDot(b, b))
  }
}
