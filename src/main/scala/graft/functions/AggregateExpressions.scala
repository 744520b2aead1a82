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

/** Element-wise sum of an `array<float>` column as one `array<double>`
  * per group — the vector-mean primitive for distributed k-means
  * (sum / count), replacing the posexplode → (group, position) →
  * re-assemble detour, which multiplies the shuffle's row count by the
  * dimensionality and pays two extra exchanges per Lloyd's iteration.
  *
  * TypedImperativeAggregate with a primitive double[] buffer (the
  * percentile_approx pattern): updates run in ObjectHashAggregate with
  * map-side partial combine, so the shuffle carries one dim-length
  * vector per group per partition. The buffer sizes itself on first
  * input; ragged inputs fail loudly. Empty/all-null groups yield null.
  */
case class VectorSumF(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

  override def prettyName: String = "vector_sum_f"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.simpleString}")
    }

  // empty array = "no input yet" (distinguishable from any real vector,
  // which must have dim >= 1)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val acc = if (buf.isEmpty) new Array[Double](n) else buf
      require(acc.length == n,
        s"$prettyName: ragged input (dim $n vs ${acc.length})")
      var i = 0
      while (i < n) { acc(i) += arr.getFloat(i).toDouble; i += 1 }
      acc
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"$prettyName: ragged partials (${a.length} vs ${b.length})")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(n: Int): VectorSumF =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VectorSumF =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): VectorSumF =
    copy(child = newChild)
}

/** `topk_pairs(ord, payload, k)` — per-group top-k of (ord, payload)
  * long pairs by (ord DESC, payload ASC tie-break), as a bounded
  * AGGREGATE instead of a window: the skew-safe form of q12's
  * row_number() ≤ k. The window shuffles and SORTS every row of a
  * group to rank its top handful — a hot key serialises through one
  * task's sort at 100 TB — while this buffer holds k pairs per group
  * per task, map-side combines like `max`, and never sorts raw rows
  * (the same argument as [[SecondMax]], generalised to k).
  *
  * Returns array<struct<ord, payload>> best-first; deterministic for
  * distinct (ord, payload) pairs (duplicate pairs keep multiset
  * semantics). Insertion is O(k) against the current worst — built
  * for report-sized k (top-10s/100s), not top-millions; bound k at
  * the call site. Empty/all-null groups yield null.
  */
case class TopKPairs(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Long)]]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, IntegerType, StructField, StructType}
  import scala.collection.mutable.ArrayBuffer

  override def prettyName: String = "topk_pairs"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", org.apache.spark.sql.types.LongType, nullable = false),
    StructField("payload", org.apache.spark.sql.types.LongType,
      nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != org.apache.spark.sql.types.LongType ||
      second.dataType != org.apache.spark.sql.types.LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint, int)")
    else if (!third.foldable || third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be a literal int")
    else {
      val kv = third.eval().asInstanceOf[java.lang.Integer]
      if (kv == null || kv < 1)
        TypeCheckResult.TypeCheckFailure(s"$prettyName: k >= 1")
      else TypeCheckResult.TypeCheckSuccess
    }

  private lazy val k: Int = third.eval().asInstanceOf[Int]

  /** a better than b under (ord DESC, payload ASC). */
  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty

  override def update(
      buf: ArrayBuffer[(Long, Long)], input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val o = first.eval(input)
    val p = second.eval(input)
    if (o != null && p != null)
      insert(buf, (o.asInstanceOf[Long], p.asInstanceOf[Long]))
    buf
  }

  private def insert(
      buf: ArrayBuffer[(Long, Long)], x: (Long, Long)): Unit =
    if (buf.size < k) buf += x
    else {
      // locate the current worst; replace if x beats it
      var wi = 0
      var i = 1
      while (i < buf.size) {
        if (better(buf(wi), buf(i))) wi = i
        i += 1
      }
      if (better(x, buf(wi))) buf(wi) = x
    }

  override def merge(
      a: ArrayBuffer[(Long, Long)],
      b: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    b.foreach(insert(a, _))
    a
  }

  private def sorted(buf: ArrayBuffer[(Long, Long)]): Seq[(Long, Long)] =
    buf.sortWith(better).toSeq

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(sorted(buf).map { case (o, p) =>
      InternalRow(o, p)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (o, p) => bb.putLong(o); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKPairs =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKPairs =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): TopKPairs =
    copy(first = f, second = s, third = t)
}

/** [[TopKAny]]'s mutable buffer: up to k (ord, payload) pairs plus a
  * cached index of the current WORST pair, so the common update case —
  * a candidate that loses to the incumbent k-th — is one comparison
  * instead of an O(k) scan. `worst` is -1 while the buffer is not yet
  * full (inserts just append) or after deserialization (recomputed on
  * first need). */
final class TopKAnyBuffer(
    val items: scala.collection.mutable.ArrayBuffer[(Double, Any)],
    var worst: Int)

/** `topk_any(ord, payload, k)` — [[TopKPairs]] generalised to a DOUBLE
  * ordinal and an arbitrary ORDERABLE payload: per-group top-k by
  * (ord DESC, payload ASC tie-break) as a bounded aggregate. Built for
  * the ANN candidate selects (score double, neighbor id of whatever
  * type the caller indexed — long, string, …): the `row_number()`
  * window form shuffles and SORTS every scored (query, candidate)
  * pair to its query's partition before the `<= k` cut — at corpus
  * scale the probed-bucket scorings dominate that exchange — while
  * this buffer holds k pairs per group per task and map-side combines
  * like `max` (the r17 verdict's #2; same argument as [[TopKPairs]]).
  *
  * Ordering matches Spark's sort exactly where row-identity with the
  * window form needs it (AnnSpec pins both forms equal per rung):
  * NaN sorts GREATEST — first under DESC — and -0.0 == 0.0, both via
  * the `x == y` short-circuit + `java.lang.Double.compare`; payload
  * ties break by the type's interpreted sort ordering, ascending.
  * Rows with a null ord or payload are SKIPPED (the window form ranks
  * null-ord rows last under DESC, so they differ only when a group
  * has fewer than k non-null candidates — ANN scores of non-null
  * vectors are never null). Returns array<struct<ord, payload>>
  * best-first (rank = array position + 1); null for empty groups.
  */
case class TopKAny(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[TopKAnyBuffer]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
  import org.apache.spark.sql.catalyst.expressions.UnsafeRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType,
    StructField, StructType}
  import scala.collection.mutable.ArrayBuffer

  override def prettyName: String = "topk_any"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("payload", second.dataType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, <orderable>, int)")
    else if (!org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(second.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: payload type ${second.dataType.sql} is not orderable")
    else if (!third.foldable || third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be a literal int")
    else {
      val kv = third.eval().asInstanceOf[java.lang.Integer]
      if (kv == null || kv < 1)
        TypeCheckResult.TypeCheckFailure(s"$prettyName: k >= 1")
      else TypeCheckResult.TypeCheckSuccess
    }

  private lazy val k: Int = third.eval().asInstanceOf[Int]

  @transient private lazy val payloadOrdering: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(second.dataType).asInstanceOf[Ordering[Any]]

  /** Spark's double sort order: ±0.0 equal, NaN greatest (== handles
    * the zeros; Double.compare handles NaN and everything else). */
  private def cmpOrd(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** a strictly better than b under (ord DESC, payload ASC). */
  private def better(a: (Double, Any), b: (Double, Any)): Boolean = {
    val c = cmpOrd(a._1, b._1)
    c > 0 || (c == 0 && payloadOrdering.compare(a._2, b._2) < 0)
  }

  override def createAggregationBuffer(): TopKAnyBuffer =
    new TopKAnyBuffer(ArrayBuffer.empty, -1)

  private def worstIndex(items: ArrayBuffer[(Double, Any)]): Int = {
    var wi = 0
    var i = 1
    while (i < items.size) {
      if (better(items(wi), items(i))) wi = i
      i += 1
    }
    wi
  }

  private def insert(buf: TopKAnyBuffer, x: (Double, Any)): Unit = {
    val items = buf.items
    if (items.size < k) {
      items += x
      if (items.size == k) buf.worst = worstIndex(items)
    } else {
      if (buf.worst < 0) buf.worst = worstIndex(items)
      if (better(x, items(buf.worst))) {
        items(buf.worst) = x
        buf.worst = worstIndex(items)
      }
    }
  }

  override def update(buf: TopKAnyBuffer, input: InternalRow): TopKAnyBuffer = {
    val o = first.eval(input)
    val p = second.eval(input)
    if (o != null && p != null)
      insert(buf, (o.asInstanceOf[Double], InternalRow.copyValue(p)))
    buf
  }

  override def merge(a: TopKAnyBuffer, b: TopKAnyBuffer): TopKAnyBuffer = {
    b.items.foreach(insert(a, _))
    a
  }

  override def eval(buf: TopKAnyBuffer): Any =
    if (buf.items.isEmpty) null
    else new GenericArrayData(buf.items.sortWith(better).map {
      case (o, p) => InternalRow(o, p)
    }.toArray[Any])

  @transient private lazy val pairProjection: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](DoubleType, second.dataType))

  override def serialize(buf: TopKAnyBuffer): Array[Byte] = {
    val rows = buf.items.map { case (o, p) =>
      pairProjection(InternalRow(o, p)).copy()
    }
    val total = 4 + rows.map(4 + _.getSizeInBytes).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(rows.size)
    rows.foreach { r =>
      bb.putInt(r.getSizeInBytes)
      bb.put(r.getBytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAnyBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val items = ArrayBuffer.empty[(Double, Any)]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, len)
      items += ((row.getDouble(0),
        InternalRow.copyValue(row.get(1, second.dataType))))
      i += 1
    }
    new TopKAnyBuffer(items, -1)
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKAny =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKAny =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): TopKAny =
    copy(first = f, second = s, third = t)
}
