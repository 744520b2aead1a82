package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, Expression, Greatest, If, IsNull, Least, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Multiset second-largest value of `child` (null until two non-null
  * inputs have been seen; two rows tied at the maximum yield that
  * maximum). The one-pass recurrence
  *
  *   m1' = max(m1, x);  m2' = max(m2, min(m1, x))
  *
  * keeps a constant two-value buffer, so the aggregate map-side
  * combines and merges like `max` — where a window (`max().over` +
  * conditional count) would shuffle every input row to its group.
  * That is the duplicate-detection primitive in record linkage
  * (ref: record_matcher duplicate_threshold, votervoice/match.py:91 and
  * national/_1034/match.py:70): a runner-up exists within `margin` of
  * the best iff `second_max >= max - margin`.
  *
  * Declarative (expression-only), so it runs inside codegen'd
  * HashAggregate with no custom buffer serialization.
  */
case class SecondMax(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def prettyName: String = "second_max"
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  private lazy val m1 = AttributeReference("m1", child.dataType)()
  private lazy val m2 = AttributeReference("m2", child.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    m1 :: m2 :: Nil

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, child.dataType),
    Literal.create(null, child.dataType))

  // Least/Greatest SKIP nulls (null only when all inputs are null);
  // the demotion term must instead be null-strict: before m1 exists,
  // min(m1, x) is "nothing demoted", not x.
  private def strictLeast(a: Expression, b: Expression): Expression =
    If(Or(IsNull(a), IsNull(b)),
      Literal.create(null, child.dataType), Least(Seq(a, b)))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    Greatest(Seq(m1, child)),
    Greatest(Seq(m2, strictLeast(m1, child))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Greatest(Seq(m1.left, m1.right)),
    // the smaller of the two partition maxima is a candidate second-max
    Greatest(Seq(m2.left, m2.right, strictLeast(m1.left, m1.right))))

  override lazy val evaluateExpression: Expression = m2

  override protected def withNewChildInternal(newChild: Expression): SecondMax =
    copy(child = newChild)
}
