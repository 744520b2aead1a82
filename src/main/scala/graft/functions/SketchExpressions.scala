package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Mergeable RELATIVE-ERROR quantile sketch (the DDSketch recipe,
  * Masson/Rim/Lee VLDB'19): values bucket into exponential bins
  * `i = ⌈log_γ(x)⌉` with `γ = (1+α)/(1−α)`, so any quantile read back
  * from bucket midpoints is within relative error α of a true value at
  * that rank — the guarantee HLL gives distinct counts, applied to
  * percentiles.
  *
  * The pattern is the point (q127's sketch-cube, for quantiles):
  * `approx_percentile` answers one query over one scan and cannot be
  * persisted or re-aggregated, while these sketches are a FEW-KB
  * column value — the day-grain sketch table is the stored
  * pre-aggregate, and every coarser or ad-hoc grain (weeks, months,
  * arbitrary slices) merges sketches WITHOUT rescanning the event
  * corpus. Bucket-count merge is associative, commutative and
  * loss-free: union-of-daily equals direct-weekly EXACTLY (to the
  * byte — serialization sorts buckets, so equal sketches are equal
  * binaries; pinned in ApproxSpec).
  *
  * Contract: inputs are NON-NEGATIVE longs (counts, cents, token
  * lengths — the pipeline's metrics); zero gets its own exact bucket.
  * Bucket count is bounded by the DYNAMIC RANGE of the data, not its
  * volume: ~⌈ln(max/min⁺)/ln γ⌉ bins (α=0.01 over a 1..10⁹ range is
  * ~1040 bins ≈ 12 KB worst case).
  */
object DdSketchImpl {

  /** Aggregation state: exact zero count + bucket index → count. */
  final class Buf(
      var zero: Long,
      val counts: scala.collection.mutable.LongMap[Long]) {
    def isEmpty: Boolean = zero == 0 && counts.isEmpty
  }
  def emptyBuf(): Buf = new Buf(0L, scala.collection.mutable.LongMap.empty)

  def gamma(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  def bucketOf(x: Long, g: Double): Int =
    math.ceil(math.log(x.toDouble) / math.log(g)).toInt

  /** Same bucket as [[bucketOf]] with ln(γ) precomputed by the caller
    * (identical float op order — division by the SAME ln(γ) double —
    * so hoisting cannot shift a boundary). */
  def bucketOfLn(x: Long, lnG: Double): Int =
    math.ceil(math.log(x.toDouble) / lnG).toInt

  def add(buf: Buf, x: Long, g: Double): Unit =
    addLn(buf, x, math.log(g))

  /** Per-row hot path: γ is fixed for an aggregate's lifetime, so the
    * division-and-log of gamma(alpha) is hoisted to the caller. */
  def addLn(buf: Buf, x: Long, lnG: Double): Unit =
    if (x == 0) buf.zero += 1
    else {
      val i = bucketOfLn(x, lnG).toLong
      buf.counts.update(i, buf.counts.getOrElse(i, 0L) + 1L)
    }

  def mergeInto(a: Buf, b: Buf): Buf = {
    a.zero += b.zero
    b.counts.foreach { case (i, c) =>
      a.counts.update(i, a.counts.getOrElse(i, 0L) + c)
    }
    a
  }

  /** Deterministic layout: [alphaBits, zero, n, (idx, count)*] with
    * buckets in ascending index order — equal sketches are equal
    * byte arrays, which makes merge-exactness pinnable. */
  def serialize(buf: Buf, alpha: Double): Array[Byte] = {
    val ids = buf.counts.keys.toArray.sorted
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + 4 + ids.length * 12)
    bb.putDouble(alpha)
    bb.putLong(buf.zero)
    bb.putInt(ids.length)
    ids.foreach { i => bb.putInt(i.toInt); bb.putLong(buf.counts(i)) }
    bb.array()
  }

  /** Returns (alpha, buf). */
  def deserialize(bytes: Array[Byte]): (Double, Buf) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val alpha = bb.getDouble
    val buf = emptyBuf()
    buf.zero = bb.getLong
    val n = bb.getInt
    var k = 0
    while (k < n) {
      val i = bb.getInt.toLong
      val c = bb.getLong
      buf.counts.update(i, c)
      k += 1
    }
    (alpha, buf)
  }

  /** Rank-walk quantile estimate: bucket midpoint 2γ^i/(γ+1). */
  def quantile(buf: Buf, alpha: Double, q: Double): java.lang.Double = {
    val n = buf.zero + buf.counts.values.sum
    if (n == 0) return null
    val g = gamma(alpha)
    val rank = math.max(1L, math.ceil(q * n).toLong)
    if (rank <= buf.zero) return java.lang.Double.valueOf(0.0)
    var cum = buf.zero
    val ids = buf.counts.keys.toArray.sorted
    var k = 0
    while (k < ids.length) {
      cum += buf.counts(ids(k))
      if (cum >= rank)
        return java.lang.Double.valueOf(
          2.0 * math.pow(g, ids(k).toDouble) / (g + 1))
      k += 1
    }
    java.lang.Double.valueOf(
      2.0 * math.pow(g, ids.last.toDouble) / (g + 1))
  }
}

/** `dd_sketch_agg(value, alpha)` — build a serialized DDSketch of a
  * non-negative LONG column at relative accuracy `alpha` (foldable
  * double). Runs in ObjectHashAggregate with map-side partial combine:
  * the shuffle carries one bucket map per group per partition. */
case class DdSketchAgg(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DdSketchImpl.Buf]
  with BinaryLike[Expression] {

  import DdSketchImpl._

  override def prettyName: String = "dd_sketch_agg"
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  private lazy val alpha: Double = right.eval() match {
    case d: java.lang.Double => d.doubleValue()
    case other => throw new IllegalArgumentException(
      s"$prettyName: alpha must be a foldable double, got $other")
  }
  // γ is fixed for the aggregate's lifetime — hoist the per-row
  // division (gamma) and log (bucketOf's ln γ) out of update()
  private lazy val lnG: Double = math.log(gamma(alpha))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != LongType || right.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, double), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: alpha must be foldable")
    else {
      val a = right.eval().asInstanceOf[java.lang.Double]
      if (a == null || a <= 0 || a >= 1)
        TypeCheckResult.TypeCheckFailure(s"$prettyName: alpha in (0,1)")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): Buf = emptyBuf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = left.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      require(x >= 0, s"$prettyName: negative input $x")
      addLn(buf, x, lnG)
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = mergeInto(a, b)

  override def eval(buf: Buf): Any =
    if (buf.isEmpty) null else DdSketchImpl.serialize(buf, alpha)

  override def serialize(buf: Buf): Array[Byte] =
    DdSketchImpl.serialize(buf, alpha)
  override def deserialize(bytes: Array[Byte]): Buf =
    DdSketchImpl.deserialize(bytes)._2

  override def withNewMutableAggBufferOffset(n: Int): DdSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): DdSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DdSketchAgg = copy(left = l, right = r)
}

/** `dd_union_agg(sketch)` — merge serialized DDSketches (the rollup
  * aggregate: day sketches → week/month/ad-hoc grains with no corpus
  * rescan). Alpha rides inside the sketch bytes; mixing accuracies
  * fails loudly rather than silently degrading the guarantee. */
case class DdUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[(Double, DdSketchImpl.Buf)]
  with UnaryLike[Expression] {

  import DdSketchImpl._

  override def prettyName: String = "dd_union_agg"
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${child.dataType.simpleString}")

  // alpha NaN = "none seen yet"
  override def createAggregationBuffer(): (Double, Buf) =
    (Double.NaN, emptyBuf())

  override def update(buf: (Double, Buf), input: InternalRow): (Double, Buf) = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val (a, b) = DdSketchImpl.deserialize(v.asInstanceOf[Array[Byte]])
      mergeTagged(buf, (a, b))
    }
  }

  private def mergeTagged(
      x: (Double, Buf), y: (Double, Buf)): (Double, Buf) =
    if (y._1.isNaN) x
    else if (x._1.isNaN) y
    else {
      require(x._1 == y._1,
        s"$prettyName: mixed alphas ${x._1} vs ${y._1}")
      (x._1, mergeInto(x._2, y._2))
    }

  override def merge(a: (Double, Buf), b: (Double, Buf)): (Double, Buf) =
    mergeTagged(a, b)

  override def eval(buf: (Double, Buf)): Any =
    if (buf._1.isNaN || buf._2.isEmpty) null
    else DdSketchImpl.serialize(buf._2, buf._1)

  override def serialize(buf: (Double, Buf)): Array[Byte] =
    if (buf._1.isNaN) Array.emptyByteArray
    else DdSketchImpl.serialize(buf._2, buf._1)
  override def deserialize(bytes: Array[Byte]): (Double, Buf) =
    if (bytes.isEmpty) (Double.NaN, emptyBuf())
    else DdSketchImpl.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): DdUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): DdUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): DdUnionAgg =
    copy(child = c)
}

/** `dd_quantile(sketch, q)` — read a quantile estimate out of a
  * serialized DDSketch (bucket-midpoint rank walk; relative error ≤
  * the sketch's alpha). CodegenFallback is fine here: it evaluates
  * over the already-reduced sketch rows (days/weeks), never the
  * corpus. */
case class DdQuantile(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression] with CodegenFallback {

  override def prettyName: String = "dd_quantile"
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val q = right.eval(input)
    if (s == null || q == null) null
    else {
      val qd = q.asInstanceOf[Double]
      require(qd > 0 && qd <= 1, s"$prettyName: q in (0,1], got $qd")
      val (alpha, buf) =
        DdSketchImpl.deserialize(s.asInstanceOf[Array[Byte]])
      DdSketchImpl.quantile(buf, alpha, qd)
    }
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DdQuantile = copy(left = l, right = r)
}
