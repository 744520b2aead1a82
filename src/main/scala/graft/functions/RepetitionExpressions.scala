package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Static kernel behind `repetition_counts`: one pass over the text
  * computing the five counts the repetition fractions derive from.
  * The interpreted formulation (array_sort + aggregate fold over the
  * bigram array) evaluates per-element lambda trees — measured 17.9 s
  * over sf0.1 documents vs scan-speed here.
  *
  * Internal hashing only: words and bigrams are counted via 64-bit
  * hashes in open-addressed tables (two distinct words/bigrams collide
  * with probability ~k²/2⁶⁴ per doc — negligible and deterministic),
  * so the kernel allocates two flat long arrays per row, no boxing.
  * Tokenization matches Spark's `split(text, ' ')`: split on every
  * single space, empty tokens kept.
  */
object RepetitionImpl {
  import org.apache.spark.unsafe.types.UTF8String

  /** FNV-1a 64 over the string's chars; 0 remapped (0 is the
    * empty-slot sentinel in the probe tables). */
  private def hash(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    if (h == 0L) 0x9e3779b97f4a7c15L else h
  }

  private def mix(a: Long, b: Long): Long = {
    val h = a * 0x100000001b3L ^ (java.lang.Long.rotateLeft(b, 31))
    if (h == 0L) 0x9e3779b97f4a7c15L else h
  }

  private def nextPow2(n: Int): Int =
    java.lang.Integer.highestOneBit(math.max(4, n * 2 - 1)) * 2

  def counts(text: UTF8String): InternalRow = {
    val s = text.toString
    // word boundaries + hashes in one scan (split-on-single-space,
    // empty tokens kept: "a  b" -> ["a","","b"], "" -> [""])
    var nW = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') nW += 1; i += 1 }
    val wh = new Array[Long](nW)
    var start = 0
    var w = 0
    i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        wh(w) = hash(s, start, i)
        w += 1
        start = i + 1
      }
      i += 1
    }
    // distinct words via open-addressed set
    var cap = nextPow2(nW)
    var mask = cap - 1
    var table = new Array[Long](cap)
    var nDW = 0
    i = 0
    while (i < nW) {
      val h = wh(i)
      var slot = (h ^ (h >>> 32)).toInt & mask
      while (table(slot) != 0L && table(slot) != h) slot = (slot + 1) & mask
      if (table(slot) == 0L) { table(slot) = h; nDW += 1 }
      i += 1
    }
    // bigram counts: open-addressed map, track distinct + max count
    val nB = nW - 1
    var nDB = 0
    var top = 0
    if (nB > 0) {
      cap = nextPow2(nB)
      mask = cap - 1
      table = new Array[Long](cap)
      val cnt = new Array[Int](cap)
      i = 0
      while (i < nB) {
        val h = mix(wh(i), wh(i + 1))
        var slot = (h ^ (h >>> 32)).toInt & mask
        while (table(slot) != 0L && table(slot) != h) slot = (slot + 1) & mask
        if (table(slot) == 0L) { table(slot) = h; nDB += 1 }
        cnt(slot) += 1
        if (cnt(slot) > top) top = cnt(slot)
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](nW, nDW, math.max(nB, 0), nDB, top))
  }
}

/** `repetition_counts(text)` → struct of the five repetition counters;
  * the fraction math stays in (codegen'd) Column arithmetic so rounding
  * semantics are identical to the portable formulation. */
case class RepetitionCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionCounts.schema
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_counts requires string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RepetitionImpl.counts(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionImpl.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "repetition_counts"
}

object RepetitionCounts {
  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct_words", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_distinct_bigrams", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false)))
}
