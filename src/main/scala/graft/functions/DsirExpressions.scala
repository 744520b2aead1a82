package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel behind `dsir_score`: per-row DSIR importance score against
  * a PRECOMPUTED bucketed log-ratio array — the model-as-literal form
  * of [[graft.operators.Corpus.dsirWeights]]'s hashed variant. The
  * B-sized array carries lr[k] = ln p_target(k) − ln p_raw(k) for
  * EVERY bucket (including the smoothing floor for never-seen
  * buckets), so scoring needs no join at all:
  *
  *   score(D) = Σ_f lr[ xxh64(f) mod B ]
  *
  * over the same uni+bigram feature stream the batch operator
  * generates. That turns importance scoring into a STATELESS
  * projection — usable unchanged in Structured Streaming (no state
  * store, no broadcast rebuild per micro-batch) and on any batch
  * scan. Features hash with Spark's xxhash64 semantics (XXH64 over
  * UTF8 bytes, seed 42), and bigrams hash the ORIGINAL text span
  * (w1 ' ' w2 is contiguous after a single-space split) — zero
  * copies on the hot path.
  */
final class DsirCodec(val lr: Array[Double]) extends Serializable {
  require(lr.nonEmpty, "dsir_score: empty model")

  def score(text: UTF8String): Double = {
    val b = lr.length
    val bytes = text.getBytes // defensive copy only when non-contiguous
    val n = bytes.length
    var acc = 0.0
    var start = 0
    var prevStart = -1
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        // unigram = [start, i)
        acc += lr(bucket(bytes, start, i - start, b))
        // bigram = [prevStart, i) — spans the single separating space
        if (prevStart >= 0)
          acc += lr(bucket(bytes, prevStart, i - prevStart, b))
        prevStart = start
        start = i + 1
      }
      i += 1
    }
    acc
  }

  private def bucket(bytes: Array[Byte], off: Int, len: Int,
      b: Int): Int = {
    // Spark's xxhash64(string) semantics: XXH64 over the UTF8 bytes,
    // seed 42 — the same bits the batch hashed path buckets on
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off,
        len, 42L)
    (((h % b) + b) % b).toInt
  }
}

/** `dsir_score(text, lr)` — stateless DSIR importance score against a
  * literal bucketed log-ratio array (see [[DsirCodec]]). Null text →
  * null. */
case class DsirScore(left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "dsir_score"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: text must be string, got ${left.dataType.simpleString}")
    else if (!right.foldable || (right.dataType match {
      case ArrayType(DoubleType, _) => false
      case _ => true
    }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: model must be a literal array<double>")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val codec: DsirCodec = {
    val ad = right.eval().asInstanceOf[ArrayData]
    val arr = new Array[Double](ad.numElements())
    var i = 0
    while (i < arr.length) { arr(i) = ad.getDouble(i); i += 1 }
    new DsirCodec(arr)
  }

  override protected def nullSafeEval(t: Any, m: Any): Any =
    codec.score(t.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirCodec", codec,
      classOf[DsirCodec].getName)
    defineCodeGen(ctx, ev, (c, _) => s"$ref.score($c)")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DsirScore = copy(left = l, right = r)
}
