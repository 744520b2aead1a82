package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernels behind the model-based lang-id hot path (`lang_features`,
  * `pool_scores`) — the two per-row loops that the portable
  * higher-order-function formulation runs INTERPRETED (a transform
  * over every char-trigram position plus K aggregate folds per row;
  * measured 69 s for the q174 bench query at sf0.1, vs ~2 s on these
  * kernels). Both are pure projections: the model weights ride into
  * generated code as reference objects, nothing shuffles.
  *
  * `lang_features` replicates [[graft.operators.LangId]]'s portable
  * featurization exactly on BMP text (LangIdSpec pins native ≡
  * portable on the mixed-script fixtures): char trigrams of the
  * lowercased first-`maxChars` prefix, stopword-occurrence tokens,
  * and bounded script-dominance markers, all xxhash64-bucketed into
  * [0, dims) with Spark's own XXH64-over-UTF8-bytes semantics.
  */
final class LangFeaturesCodec(val dims: Int, val seed: Long,
    val maxChars: Int, val stops: Array[String])
  extends Serializable {

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stops.foreach(s.add)
    s
  }

  private def bucket(s: String): Int = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // Spark's xxhash64(str, seedCol) semantics: fold each argument
    // into the running hash starting at the default seed 42 — the
    // string's UTF8 bytes first, then the long seed value
    val h1 = XXH64.hashUnsafeBytes(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, 42L)
    val h = XXH64.hashLong(seed, h1)
    (((h % dims) + dims) % dims).toInt
  }

  def features(text: UTF8String): ArrayData = {
    // Spark-semantics lowercase (UTF8String.toLowerCase — what the
    // portable lower() evaluates) and a CODE-POINT cap/window, not
    // UTF-16 units: the portable path's substring/length/transform
    // all count code points, so on non-BMP text (emoji, supplementary
    // CJK) a char-unit loop would window and trigram differently —
    // native ≡ portable must hold beyond the BMP (r14 ADVICE).
    val full = text.toLowerCase.toString
    val cpTotal = full.codePointCount(0, full.length)
    val t =
      if (cpTotal <= maxChars) full
      else full.substring(0, full.offsetByCodePoints(0, maxChars))
    // code-point start offsets: starts(j) = UTF-16 offset of point j
    val cpN = math.min(cpTotal, maxChars)
    val starts = new Array[Int](cpN + 1)
    var u = 0
    var cp = 0
    while (u < t.length) {
      starts(cp) = u
      u += Character.charCount(t.codePointAt(u))
      cp += 1
    }
    starts(cpN) = t.length
    val n = t.length
    val out = new java.util.ArrayList[Any](cpN + 16)
    // char trigrams with multiplicity over CODE POINTS (0 .. cpN-3)
    var g = 0
    while (g + 3 <= cpN) {
      out.add(Integer.valueOf(
        bucket("cg:" + t.substring(starts(g), starts(g + 3)))))
      g += 1
    }
    // stopword occurrences: single-space split, multiplicity kept
    val words = t.split(" ", -1)
    var i = 0
    while (i < words.length) {
      if (stopSet.contains(words(i)))
        out.add(Integer.valueOf(bucket("sw:" + words(i))))
      i += 1
    }
    // script share markers: (dom, has) per script in fixed order
    var latin = 0L; var cyr = 0L; var greek = 0L; var cjk = 0L
    i = 0
    while (i < n) {
      val c = t.charAt(i)
      if (c >= 'a' && c <= 'z') latin += 1
      else if (c >= 0x0400 && c <= 0x04FF) cyr += 1
      else if (c >= 0x0370 && c <= 0x03FF) greek += 1
      else if (c >= 0x4E00 && c <= 0x9FFF) cjk += 1
      i += 1
    }
    val total = (latin + cyr + greek + cjk).toDouble
    val counts = Array(("latin", latin), ("cyr", cyr), ("greek", greek),
      ("cjk", cjk))
    counts.foreach { case (name, c) =>
      if (total > 0 && c / total > 0.5)
        out.add(Integer.valueOf(bucket(s"sc:$name:dom")))
      if (total > 0 && c / total > 0.05)
        out.add(Integer.valueOf(bucket(s"sc:$name:has")))
    }
    new GenericArrayData(out.toArray)
  }
}

/** `lang_features(text, dims, seed)` — the lang-id feature-id array
  * at scan speed. dims/seed must be literals (baked into the codec). */
case class LangFeatures(first: Expression, second: Expression,
    third: Expression, maxChars: Int, stops: Array[String])
  extends TernaryExpression {
  override def prettyName: String = "lang_features"
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: text must be string, got ${first.dataType.simpleString}")
    else if (!second.foldable || second.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: dims must be an int literal")
    else if (!third.foldable || third.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: seed must be a bigint literal")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val codec = new LangFeaturesCodec(
    second.eval().asInstanceOf[Int], third.eval().asInstanceOf[Long],
    maxChars, stops)

  override protected def nullSafeEval(t: Any, d: Any, s: Any): Any =
    codec.features(t.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langFeaturesCodec", codec,
      classOf[LangFeaturesCodec].getName)
    nullSafeCodeGen(ctx, ev, (t, _, _) =>
      s"${ev.value} = $ref.features($t);")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LangFeatures =
    copy(first = f, second = s, third = t)
}

/** Dense mean-pool scorer: raw_k = bias_k + (Σ_{id} w[k·dims + id]) /
  * max(1, |ids|), all K classes in ONE pass over the id array. */
final class PoolScoresCodec(val weightsFlat: Array[Double],
    val biases: Array[Double]) extends Serializable {
  val k: Int = biases.length
  val dims: Int = if (k == 0) 0 else weightsFlat.length / k
  require(k > 0 && weightsFlat.length == k * dims,
    "pool_scores: |weights| must be a multiple of |biases|")

  def scores(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    val acc = new Array[Double](k)
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      if (id < 0 || id >= dims)
        throw new IllegalArgumentException(
          s"pool_scores: feature id $id outside [0, $dims)")
      var c = 0
      while (c < k) { acc(c) += weightsFlat(c * dims + id); c += 1 }
      i += 1
    }
    val den = math.max(1, n).toDouble
    var c = 0
    while (c < k) { acc(c) = acc(c) / den + biases(c); c += 1 }
    new GenericArrayData(acc)
  }
}

/** `pool_scores(ids, weights_flat, biases)` — K mean-pooled linear
  * scores per row; weights/biases must be literal array<double>. */
case class PoolScores(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def prettyName: String = "pool_scores"
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (!first.dataType.isInstanceOf[ArrayType] ||
      first.dataType.asInstanceOf[ArrayType].elementType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: ids must be array<int>")
    else if (!second.foldable || !isDoubleArray(second))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: weights must be a literal array<double>")
    else if (!third.foldable || !isDoubleArray(third))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: biases must be a literal array<double>")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val codec = new PoolScoresCodec(
    second.eval().asInstanceOf[ArrayData].toDoubleArray(),
    third.eval().asInstanceOf[ArrayData].toDoubleArray())

  override protected def nullSafeEval(ids: Any, w: Any, b: Any): Any =
    codec.scores(ids.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("poolScoresCodec", codec,
      classOf[PoolScoresCodec].getName)
    nullSafeCodeGen(ctx, ev, (ids, _, _) =>
      s"${ev.value} = $ref.scores($ids);")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PoolScores =
    copy(first = f, second = s, third = t)
}
