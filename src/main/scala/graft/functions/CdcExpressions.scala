package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel behind `cdc_cuts`: content-defined chunk boundaries
  * via a polynomial rolling hash (the Rabin-Karp / FastCDC family).
  * A cut is declared AFTER code-point position i (1-based, w ≤ i ≤
  * n-1) iff the hash of the w code points ending at i satisfies
  * H(i) % m == 0, where H is the standard base-31 polynomial
  * (leftmost character highest power):
  *
  *   H(i) = Σ_{j=0}^{w-1} 31^(w-1-j) · cp(i-w+1+j)
  *
  * Because the boundary decision depends ONLY on the local w-gram,
  * an insertion or deletion re-chunks just its neighbourhood — the
  * property that makes CDC chunks dedup-stable across document
  * revisions where fixed-size chunking (q80's shape) shifts every
  * downstream chunk. Anchor: the engine's whole-document snapshot
  * diff ([[graft.operators.Corpus.snapshotDiff]], q81) classifies
  * re-crawled documents by content hash; CDC chunking is the
  * sub-document grain of the same idea, consumed by q151's
  * chunk-level diff ([[graft.operators.Corpus.chunkDiff]]).
  *
  * One O(n) pass, O(w) state, zero allocation beyond the output
  * buffer: the hash rolls (multiply-add the incoming code point,
  * subtract the outgoing one at 31^(w-1)) and positions count CODE
  * POINTS (not UTF-16 chars), matching both Spark's and DuckDB's
  * code-point string semantics — the formula is replayable in ANSI
  * SQL as w explicit ord()·31^j terms, which is what keeps the
  * operator hash-exact against the oracle.
  *
  * Bounds: w ≤ 8 keeps H strictly below 2^63 for any code point
  * (31^8 · 0x10FFFF ≈ 9.5e17) — no wrap, so `% m` is engine-neutral.
  */
object CdcImpl {

  /** Cut positions [0, b1, ..., bk, n] in code points; text must be
    * non-null. Empty text yields [0, 0]. */
  def cuts(text: UTF8String, w: Int, m: Int): ArrayData = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    val out = new java.util.ArrayList[Integer](8)
    out.add(0)
    // 31^(w-1): the outgoing code point's weight
    var pow = 1L
    var j = 1
    while (j < w) { pow *= 31L; j += 1 }
    val win = new Array[Long](w)
    var h = 0L
    var cp = 0
    var i = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      i += Character.charCount(c)
      cp += 1
      val slot = (cp - 1) % w
      if (cp <= w) h = h * 31L + c
      else h = (h - win(slot) * pow) * 31L + c
      win(slot) = c
      if (cp >= w && cp <= n - 1 && h % m == 0) out.add(cp)
    }
    out.add(n)
    val arr = new Array[Int](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }
}

/** `cdc_cuts(text, window, modulus)` — content-defined chunk cut
  * positions as array<int> `[0, b1, …, n]` in code points. `window`
  * and `modulus` are literal parameters baked into the generated
  * code; average chunk length ≈ `modulus` code points.
  */
case class CdcCuts(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression {
  require(window >= 1 && window <= 8,
    s"cdc_cuts: window must be in [1, 8], got $window")
  require(modulus >= 2,
    s"cdc_cuts: modulus must be >= 2, got $modulus")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_cuts requires string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CdcImpl.cuts(input.asInstanceOf[UTF8String], window, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcImpl.cuts($c, $window, $modulus)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "cdc_cuts"
}
