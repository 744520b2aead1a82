package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native kernels for float-vector math. Accumulation is a left fold in
  * index order with per-element double promotion — bit-identical to the
  * zip_with/aggregate Column formulation in VectorFunctions (and to the
  * DuckDB oracle's list_sum of casts), so the adaptive switch can never
  * change results. */
object VectorImpl {
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc = acc + a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def normF(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      acc = acc + v * v
      i += 1
    }
    math.sqrt(acc)
  }
}

private object VectorExprCheck {
  def floatArray(name: String, dts: DataType*): TypeCheckResult =
    if (dts.forall {
      case ArrayType(FloatType, _) => true
      case _ => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float> arguments, got ${dts.map(_.simpleString).mkString(", ")}")
}

/** `dot_f(a, b)` — Σ aᵢ·bᵢ in double over two equal-length
  * array<float> columns. */
case class DotF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprCheck.floatArray(prettyName, left.dataType, right.dataType)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorImpl.dotF(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorImpl.dotF($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f"
}

/** `norm_f(a)` — ‖a‖₂ in double. */
case class NormF(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprCheck.floatArray(prettyName, child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    VectorImpl.normF(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorImpl.normF($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "norm_f"
}
