package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel behind `deflate_len`: DEFLATE-compressed byte length of a
  * string — the raw ingredient of the COMPRESSION-RATIO quality
  * signal (bytes/compressed-bytes) used by large-corpus curation
  * recipes as a fast, language-agnostic redundancy detector:
  * near-incompressible text (ratio ≈ 1) is usually binary soup or
  * high-entropy garbage, extremely compressible text (high ratio) is
  * boilerplate/template repetition — both tails get filtered, no
  * language model needed (the heuristic family surveyed in Gopher's
  * §A.1.1 repetition analysis; complements q52's exact repetition
  * counters with a single scalar).
  *
  * The Deflater is per-thread (native zlib state is not
  * thread-safe, and re-allocating per row costs more than the
  * compression); level is baked at construction. Output length is
  * deterministic for a given zlib/level, but NOT portable across
  * zlib builds — so queries built on it register rows-only, with
  * the properties (determinism, monotone-under-repetition) pinned
  * in ScalaTest.
  */
final class DeflateCodec(val level: Int) extends Serializable {
  require(level >= 1 && level <= 9, "deflate_len: level in [1,9]")

  @transient private lazy val local
      : ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial { () =>
      new java.util.zip.Deflater(level, true)
    }
  @transient private lazy val buf: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](64 * 1024))

  def len(text: UTF8String): Int = {
    val bytes = text.getBytes
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0
    val b = buf.get()
    while (!d.finished()) total += d.deflate(b)
    total
  }
}

/** `deflate_len(text, level)` — DEFLATE(level) byte length; level
  * must be a literal in [1,9]. Null text → null. */
case class DeflateLen(left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "deflate_len"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: text must be string, got ${left.dataType.simpleString}")
    else if (!right.foldable || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: level must be an integer literal")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val codec: DeflateCodec =
    new DeflateCodec(right.eval().asInstanceOf[Int])

  override protected def nullSafeEval(t: Any, l: Any): Any =
    codec.len(t.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateCodec", codec,
      classOf[DeflateCodec].getName)
    defineCodeGen(ctx, ev, (c, _) => s"$ref.len($c)")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DeflateLen = copy(left = l, right = r)
}
