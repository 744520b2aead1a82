package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType, IntegerType, LongType, StructField, StructType}

/** Maximal-marginal-relevance selection (Carbonell & Goldstein, SIGIR
  * 1998) over one query's bounded candidate list:
  *
  *   pick argmax_{d ∉ S} λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)
  *
  * repeated k times — the standard diversification rerank a
  * training-data / RAG retrieval stack runs AFTER candidate
  * generation, so near-duplicate candidates don't crowd the final
  * top-k (the retrieval-time face of the dedup family). Runs as a
  * per-row expression over `array<struct<id, rel, vec>>` because the
  * candidate list is bounded by construction (the upstream top-N cut
  * — tens of rows), so the greedy O(k·N) scan with O(N²) cached
  * pairwise similarities is driver-free, distributed per query, and
  * never sees the corpus.
  *
  * Determinism contract (what lets q194 keep a hash-exact DuckDB
  * oracle): cosine similarities accumulate as DOUBLE over the float
  * elements in ascending index order — bit-identical to the
  * `list_sum([CAST(a[i] AS DOUBLE)*b[i] ...])` replay and to the
  * `dot_f` kernel the relevance scores come from — the sim term for
  * an empty S is 0, and every argmax tie breaks on the lowest id.
  * Input order never matters (the scan is an argmax, not a fold).
  * Null candidate entries and null ids/vecs are rejected by the
  * type check (containsNull inputs are allowed for parquet-schema
  * conservatism; an actual null element fails loudly at runtime
  * rather than silently skewing the selection).
  */
object MmrImpl {

  private def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i); i += 1 }
    s
  }

  /** Greedy MMR over (ids, rels, vecs) triples; returns the selected
    * (id, mmrScore) pairs in selection order. */
  def select(cands: ArrayData, lam: Double, k: Int,
      idOrd: Int, relOrd: Int, vecOrd: Int): ArrayData = {
    val n = cands.numElements()
    val ids = new Array[Long](n)
    val rels = new Array[Double](n)
    val vecs = new Array[ArrayData](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 3)
      require(row != null, "mmr_select: null candidate entry")
      ids(i) = row.getLong(idOrd)
      rels(i) = row.getDouble(relOrd)
      vecs(i) = row.getArray(vecOrd)
      require(vecs(i) != null, s"mmr_select: null vector for id ${ids(i)}")
      norms(i) = math.sqrt(dot(vecs(i), vecs(i)))
      i += 1
    }
    val taken = new Array[Boolean](n)
    // max sim of each remaining candidate to the selected set,
    // updated incrementally after each pick (O(N) per step).
    // Initialized to -inf, NOT 0: the canonical MMR takes the true
    // max over the selected set, and a candidate anti-similar to
    // everything selected earns a genuine diversity bonus — a 0
    // floor would silently clamp negative cosines (caught by the
    // oracle replay on the gate corpus, where opposed vectors are
    // common).
    val maxSim = new Array[Double](n)
    java.util.Arrays.fill(maxSim, Double.NegativeInfinity)
    val out = new Array[Any](math.min(k, n))
    var step = 0
    while (step < out.length) {
      var best = -1
      var bestScore = 0.0
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val score =
            if (step == 0) lam * rels(j)
            else lam * rels(j) - (1.0 - lam) * maxSim(j)
          if (best < 0 || score > bestScore ||
              (score == bestScore && ids(j) < ids(best))) {
            best = j
            bestScore = score
          }
        }
        j += 1
      }
      taken(best) = true
      out(step) = InternalRow(ids(best), bestScore)
      // fold the new pick into every remaining candidate's max-sim
      var m = 0
      while (m < n) {
        if (!taken(m)) {
          val denom = norms(m) * norms(best)
          val sim = if (denom == 0.0) 0.0 else dot(vecs(m), vecs(best)) / denom
          if (sim > maxSim(m)) maxSim(m) = sim
        }
        m += 1
      }
      step += 1
    }
    new GenericArrayData(out)
  }
}

/** `mmr_select(candidates, lambda, k)` — see [[MmrImpl]]. `candidates`
  * is `array<struct<id bigint, rel double, vec array<float>>>` (field
  * names free; positions fixed); `lambda` a literal double in [0, 1];
  * `k` a literal int >= 1. Returns `array<struct<id, mmr>>` in
  * selection order (rank = position + 1). */
case class MmrSelect(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("mmr", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = first.nullable

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(StructType(fields), _) if fields.length == 3 &&
        fields(0).dataType == LongType &&
        fields(1).dataType == DoubleType &&
        fields(2).dataType.isInstanceOf[ArrayType] &&
        fields(2).dataType.asInstanceOf[ArrayType].elementType == FloatType =>
      if (!second.foldable || second.dataType != DoubleType)
        TypeCheckResult.TypeCheckFailure(
          "mmr_select: lambda must be a literal double")
      else if (!third.foldable || third.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure(
          "mmr_select: k must be a literal int")
      else {
        val lam = second.eval().asInstanceOf[java.lang.Double]
        val kv = third.eval().asInstanceOf[java.lang.Integer]
        // NaN must be rejected explicitly: NaN < 0.0 and NaN > 1.0 are
        // both false, and a NaN lambda would poison every MMR score
        // (and interpolate as an invalid 'NaN' Java literal in codegen)
        if (lam == null || lam.isNaN || lam < 0.0 || lam > 1.0)
          TypeCheckResult.TypeCheckFailure(
            "mmr_select: lambda must be in [0, 1]")
        else if (kv == null || kv < 1)
          TypeCheckResult.TypeCheckFailure("mmr_select: k >= 1")
        else TypeCheckResult.TypeCheckSuccess
      }
    case other => TypeCheckResult.TypeCheckFailure(
      "mmr_select requires array<struct<bigint, double, array<float>>>, " +
        s"got ${other.sql}")
  }

  @transient private lazy val lam: Double =
    second.eval().asInstanceOf[Double]
  @transient private lazy val k: Int = third.eval().asInstanceOf[Int]

  override protected def nullSafeEval(c: Any, l: Any, kk: Any): Any =
    MmrImpl.select(c.asInstanceOf[ArrayData], lam, k, 0, 1, 2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, _, _) =>
      s"graft.functions.MmrImpl.select($c, $lam, $k, 0, 1, 2)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MmrSelect =
    copy(first = f, second = s, third = t)
}
