package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static kernel behind the MinHashSignature expression: one tight JVM
  * loop per row instead of interpreted higher-order-function trees.
  * Hash values are IDENTICAL to the Column-function formulation in
  * Dedup (xxhash64 seed 42 folded below 2^32, then (2i+1)x + 7919(i+1)
  * mod the largest 32-bit prime), so both paths yield the same buckets.
  */
object MinHashImpl {
  val P32 = 4294967291L

  def signature(arr: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val base = java.lang.Math.floorMod(
        XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L),
        P32)
      var j = 0
      while (j < numHashes) {
        val h = (base * (2L * j + 1L) + 7919L * (j + 1L)) % P32
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Static kernel for word-shingle construction — equivalent to the
  * Column formulation in Dedup.shingles (split on single space, n-gram
  * join with single spaces, distinct keeping first occurrence). */
object ShingleImpl {
  import org.apache.spark.unsafe.types.UTF8String

  def shingles(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** `word_shingles(text, n)` as a native expression — one loop instead
  * of the interpreted split/sequence/slice/concat_ws tree. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleImpl.shingles(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleImpl.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

/** Static kernel for stopword-occurrence counting: tokenizes on single
  * spaces and counts members of the (memoized, comma-separated) word
  * set — semantics of size(filter(split(text,' '), w.isin(stops))). */
object StopwordImpl {
  import org.apache.spark.unsafe.types.UTF8String

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[UTF8String, java.util.HashSet[UTF8String]]()

  private def set(csv: UTF8String): java.util.HashSet[UTF8String] =
    cache.computeIfAbsent(csv, { c =>
      val s = new java.util.HashSet[UTF8String]()
      c.toString.split(",").foreach(w => s.add(UTF8String.fromString(w)))
      s
    })

  def hits(text: UTF8String, stopCsv: UTF8String): Int = {
    val stops = set(stopCsv)
    var count = 0
    var start = 0
    val str = text.toString
    var i = 0
    val n = str.length
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        if (stops.contains(UTF8String.fromString(str.substring(start, i))))
          count += 1
        start = i + 1
      }
      i += 1
    }
    count
  }
}

/** `stopword_hits(text, 'w1,w2,...')` — occurrences of any listed word. */
case class StopwordHits(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"stopword_hits requires (string, string)")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    StopwordImpl.hits(
      l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StopwordImpl.hits($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "stopword_hits"
}

/** Static kernel for 64-bit SimHash — identical votes to the
  * higher-order-function formulation in Dedup.simhash64 (xxhash64 seed
  * 42 per shingle, +1/-1 vote per bit, bit set iff votes > 0). */
object SimHashImpl {
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `simhash64(shingles)` as a native expression. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

/** Static kernel for set-Jaccard over two string arrays — semantics of
  * size(array_intersect(a,b)) / size(array_union(a,b)) (operands
  * deduplicated, 0.0 when the union is empty). */
object JaccardImpl {
  /** Set Jaccard over two long arrays (hashed shingles): copy, sort
    * primitives, merge-count distinct intersection/union — no boxing,
    * no string hashing. Duplicates within an input are collapsed
    * (set semantics, matching the string form over distinct shingles).
    */
  private def isSortedAsc(xs: Array[Long]): Boolean = {
    var i = 1
    while (i < xs.length) {
      if (xs(i - 1) > xs(i)) return false
      i += 1
    }
    true
  }

  /** Non-null longs of an array column value, plus whether a null
    * element was present — `toLongArray` would silently coerce null
    * elements to 0L and diverge from array_intersect. */
  private def nonNullLongs(a: ArrayData): (Array[Long], Boolean) = {
    val n = a.numElements()
    var i = 0
    var nulls = false
    while (i < n && !nulls) { if (a.isNullAt(i)) nulls = true; i += 1 }
    if (!nulls) return (a.toLongArray(), false)
    val out = new Array[Long](n)
    var w = 0
    i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { out(w) = a.getLong(i); w += 1 }
      i += 1
    }
    (java.util.Arrays.copyOf(out, w), true)
  }

  /** |distinct(a) ∩ distinct(b)| over two long arrays — the COUNT
    * `size(array_intersect(a, b))` computes, without the boxed
    * OpenHashSet and the result-array allocation the builtin pays per
    * pair. Inputs already sorted ascending (the set builders sort once
    * per ROW; verify joins then score many PAIRS per row) skip the
    * sort via a linear check; unsorted inputs (e.g. the persisted
    * df-ordered `ord` arrays of pre-existing indexes) sort a copy, so
    * the value is order-independent either way. Null ELEMENTS follow
    * array_intersect: null intersects null (one distinct match), and
    * never matches a value. */
  def interCountLongs(a: ArrayData, b: ArrayData): Long = {
    val (xs, nullA) = nonNullLongs(a)
    val (ys, nullB) = nonNullLongs(b)
    val nullMatch = if (nullA && nullB) 1L else 0L
    if (!isSortedAsc(xs)) java.util.Arrays.sort(xs)
    if (!isSortedAsc(ys)) java.util.Arrays.sort(ys)
    var i = 0
    var j = 0
    var inter = 0L
    while (i < xs.length && j < ys.length) {
      val x = xs(i)
      val y = ys(j)
      if (x == y) {
        inter += 1
        while (i < xs.length && xs(i) == x) i += 1
        while (j < ys.length && ys(j) == x) j += 1
      } else if (x < y) i += 1
      else j += 1
    }
    inter + nullMatch
  }

  def jaccardLongs(a: ArrayData, b: ArrayData): Double = {
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var i = 0
    var j = 0
    var inter = 0
    var union = 0
    var last = 0L
    var hasLast = false
    @inline def take(v: Long, isInter: Boolean): Unit = {
      if (!hasLast || v != last) {
        union += 1
        if (isInter) inter += 1
        last = v
        hasLast = true
      }
    }
    while (i < xs.length && j < ys.length) {
      if (xs(i) == ys(j)) { take(xs(i), isInter = true); i += 1; j += 1 }
      else if (xs(i) < ys(j)) { take(xs(i), isInter = false); i += 1 }
      else { take(ys(j), isInter = false); j += 1 }
    }
    while (i < xs.length) { take(xs(i), isInter = false); i += 1 }
    while (j < ys.length) { take(ys(j), isInter = false); j += 1 }
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var inter = 0
    var j = 0
    while (j < b.numElements()) {
      val s = b.getUTF8String(j)
      if (setB.add(s) && setA.contains(s)) inter += 1
      j += 1
    }
    val union = setA.size + setB.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** `jaccard_shingles(a, b)` — one hash-set pass, no intermediate
  * arrays. */
case class JaccardShingles(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_shingles requires two array<string>, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaccardImpl.jaccard(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardImpl.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_shingles"
}

/** `inter_longs(a, b)` — |distinct(a) ∩ distinct(b)| over two
  * array<bigint> columns: the value of size(array_intersect(a, b))
  * as a primitive merge-count (see [[JaccardImpl.interCountLongs]]). */
case class InterCountLongs(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"inter_longs requires two array<bigint>, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaccardImpl.interCountLongs(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardImpl.interCountLongs($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "inter_longs"
}

/** `jaccard_longs(a, b)` — set Jaccard over two array<bigint> columns
  * of hashed shingles. */
case class JaccardLongs(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_longs requires two array<bigint>, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaccardImpl.jaccardLongs(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardImpl.jaccardLongs($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_longs"
}

/** `minhash_signature(shingles, numHashes)` as a native Catalyst
  * expression — codegen emits a direct static call, keeping the whole
  * signature computation inside the generated stage. ~20x the
  * interpreted higher-order-function formulation.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashImpl.signature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}
