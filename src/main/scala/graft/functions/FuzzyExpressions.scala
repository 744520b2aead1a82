package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the rapidfuzz scorer family —
  * `doGenCode` emits a direct static call, so the scorer participates
  * in whole-stage codegen exactly like Spark's built-in Levenshtein
  * (no UDF boxing, no serialization boundary).
  */
abstract class FuzzyScoreExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string) arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  /** Fully-qualified static method on FuzzyImpl to invoke. */
  protected def method: String

  /** Memoized scorers take the raw UTF8String operands (their memo
    * probes on bytes, so a hit allocates nothing — r19); the rest
    * decode to String at the call. */
  protected def passUtf8: Boolean = false

  protected def score(a: String, b: String): Double

  override protected def nullSafeEval(l: Any, r: Any): Any =
    if (passUtf8)
      scoreUtf8(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    else
      score(l.asInstanceOf[UTF8String].toString,
        r.asInstanceOf[UTF8String].toString)

  protected def scoreUtf8(a: UTF8String, b: UTF8String): Double =
    score(a.toString, b.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (passUtf8)
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.FuzzyImpl.$method($a, $b)")
    else
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.FuzzyImpl.$method($a.toString(), $b.toString())")
}

case class JaroWinkler(left: Expression, right: Expression)
    extends FuzzyScoreExpression {
  override protected def method: String = "jaroWinkler"
  override protected def score(a: String, b: String): Double =
    FuzzyImpl.jaroWinkler(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaro_winkler"
}

case class TokenSortRatio(left: Expression, right: Expression)
    extends FuzzyScoreExpression {
  override protected def method: String = "tokenSortRatio"
  override protected def score(a: String, b: String): Double =
    FuzzyImpl.tokenSortRatio(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "token_sort_ratio"
}

case class TokenSetRatio(left: Expression, right: Expression)
    extends FuzzyScoreExpression {
  override protected def method: String = "tokenSetRatio"
  override protected def score(a: String, b: String): Double =
    FuzzyImpl.tokenSetRatio(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "token_set_ratio"
}

case class PartialRatio(left: Expression, right: Expression)
    extends FuzzyScoreExpression {
  override protected def method: String = "partialRatio"
  override protected def score(a: String, b: String): Double =
    FuzzyImpl.partialRatio(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "partial_ratio"
}

case class PartialTokenRatio(left: Expression, right: Expression)
    extends FuzzyScoreExpression {
  // memoized: linkage re-scores identical pairs across a block;
  // raw-UTF8String entry keeps memo hits allocation-free
  override protected def method: String = "partialTokenRatioCached"
  override protected def passUtf8: Boolean = true
  override protected def score(a: String, b: String): Double =
    FuzzyImpl.partialTokenRatio(a, b)
  override protected def scoreUtf8(a: UTF8String, b: UTF8String): Double =
    FuzzyImpl.partialTokenRatioCached(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "partial_token_ratio"
}

case class WRatio(left: Expression, right: Expression)
    extends FuzzyScoreExpression {
  // memoized: linkage re-scores identical pairs across a block;
  // raw-UTF8String entry keeps memo hits allocation-free
  override protected def method: String = "wRatioCached"
  override protected def passUtf8: Boolean = true
  override protected def score(a: String, b: String): Double =
    FuzzyImpl.wRatio(a, b)
  override protected def scoreUtf8(a: UTF8String, b: UTF8String): Double =
    FuzzyImpl.wRatioCached(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "w_ratio"
}
