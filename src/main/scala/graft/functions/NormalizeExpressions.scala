package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for corpus preprocessing: NFC before any
  * content hashing or exact/near dedup (visually-identical strings
  * with different codepoint sequences — "é" precomposed vs
  * "e"+combining-acute — must hash alike), NFKC to additionally fold
  * compatibility forms (ligatures, fullwidth ASCII, superscripts)
  * the way CCNet-style web pipelines do before tokenization.
  */
object NormalizeImpl {
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    // quick-check fast path: already-normalized text (all ASCII, and
    // most real text) skips the composition pass entirely
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** `unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD')` — Unicode
  * normalization as a native codegen expression (java.text.Normalizer,
  * the JDK's conformant implementation). */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {
  require(UnicodeNormalize.Forms.contains(formName),
    s"unicode_normalize: form must be one of " +
      s"${UnicodeNormalize.Forms.mkString("/")}, got '$formName'")

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${other.simpleString}")
    }

  @transient private lazy val form: Normalizer.Form =
    Normalizer.Form.valueOf(formName)

  override protected def nullSafeEval(v: Any): Any =
    NormalizeImpl.normalize(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("nfForm", form, "java.text.Normalizer.Form")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.NormalizeImpl.normalize($v, $f)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}
