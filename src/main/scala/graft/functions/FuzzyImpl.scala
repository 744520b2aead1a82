package graft.functions

/** JVM implementations behind the fuzzy-match Catalyst expressions.
  * Pure static functions so generated code can call them directly
  * (the same pattern Spark's own Levenshtein uses with UTF8String).
  *
  * Scorers mirror the rapidfuzz family the reference relies on
  * (ref: votervoice/match.py:58-71 — WRatio default, token scorers,
  * per-column thresholds in [0,100]).
  */
object FuzzyImpl {

  /** Classic Levenshtein distance, O(min(n,m)) memory. */
  def levenshtein(a: String, b: String): Int = {
    if (a == b) return 0
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    var prev = new Array[Int](s.length + 1)
    var cur = new Array[Int](s.length + 1)
    var i = 0
    while (i <= s.length) { prev(i) = i; i += 1 }
    var j = 1
    while (j <= t.length) {
      cur(0) = j
      var k = 1
      while (k <= s.length) {
        val cost = if (s.charAt(k - 1) == t.charAt(j - 1)) 0 else 1
        cur(k) = math.min(math.min(cur(k - 1) + 1, prev(k) + 1), prev(k - 1) + cost)
        k += 1
      }
      // row swap, not arraycopy — same values, one O(n) copy less/row
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    prev(s.length)
  }

  /** rapidfuzz `ratio`: 100 * (1 - dist / max(len)). */
  def ratio(a: String, b: String): Double = {
    val m = math.max(a.length, b.length)
    if (m == 0) 100.0 else 100.0 * (1.0 - levenshtein(a, b).toDouble / m)
  }

  /** Jaro similarity in [0,1]. */
  def jaro(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val aM = new Array[Boolean](a.length)
    val bM = new Array[Boolean](b.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // mismatched-position count halved with INTEGER division — the
    // rapidfuzz convention (greedy matching can leave an odd count)
    (m / a.length + m / b.length + (m - transpositions / 2) / m) / 3.0
  }

  /** Jaro-Winkler similarity scaled to [0,100]: prefix weight 0.1, max
    * prefix 4, boost threshold 0.7 (the standard parameterisation —
    * the prefix bonus applies only when jaro > 0.7, matching common
    * implementations including DuckDB's). */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return 100.0 * j
    var prefix = 0
    val maxP = math.min(4, math.min(a.length, b.length))
    while (prefix < maxP && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    100.0 * (j + prefix * 0.1 * (1.0 - j))
  }

  // String.split recompiles a multi-char regex per call — the scorer
  // cascade splits each operand several times per pair, so precompile
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  private def sortedTokens(s: String): Array[String] =
    Ws.split(s.trim).filter(_.nonEmpty).sorted

  /** rapidfuzz token_sort_ratio: ratio over whitespace tokens sorted. */
  def tokenSortRatio(a: String, b: String): Double =
    tokenSortRatioPre(sortedTokens(a), sortedTokens(b))

  private def tokenSortRatioPre(ta: Array[String], tb: Array[String]): Double =
    ratio(ta.mkString(" "), tb.mkString(" "))

  /** rapidfuzz token_set_ratio: max ratio over (∩, ∩+restA, ∩+restB)
    * pairings of sorted token sets. */
  def tokenSetRatio(a: String, b: String): Double =
    tokenSetRatioPre(sortedTokens(a), sortedTokens(b))

  private def tokenSetRatioPre(ta: Array[String], tb: Array[String]): Double = {
    val sa = ta.toSet
    val sb = tb.toSet
    val inter = (sa & sb).toSeq.sorted.mkString(" ")
    val diffA = (sa -- sb).toSeq.sorted.mkString(" ")
    val diffB = (sb -- sa).toSeq.sorted.mkString(" ")
    val combA = if (diffA.isEmpty) inter else if (inter.isEmpty) diffA else s"$inter $diffA"
    val combB = if (diffB.isEmpty) inter else if (inter.isEmpty) diffB else s"$inter $diffB"
    math.max(ratio(inter, combA), math.max(ratio(inter, combB), ratio(combA, combB)))
  }

  /** rapidfuzz partial_ratio: best ratio of the shorter string against
    * any same-length substring of the longer. */
  def partialRatio(a: String, b: String): Double = {
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) return if (t.isEmpty) 100.0 else 0.0
    if (s.length == t.length) return ratio(s, t)
    var best = 0.0
    var i = 0
    while (i + s.length <= t.length) {
      val r = ratio(s, t.substring(i, i + s.length))
      if (r > best) best = r
      if (best == 100.0) return best
      i += 1
    }
    best
  }

  /** rapidfuzz partial_token_ratio: partial_ratio over the
    * token-sorted forms (the reference's middlename scorer, lowercased
    * at the call site — match.py:55-57). */
  def partialTokenRatio(a: String, b: String): Double =
    partialRatio(sortedTokens(a).mkString(" "), sortedTokens(b).mkString(" "))

  /** WRatio-style combined score: max of full, token-sort, token-set
    * and (length-ratio-penalised) partial scores — a documented
    * simplification of rapidfuzz's WRatio cascade. Like rapidfuzz's
    * WRatio (and unlike plain `ratio`), an EMPTY side scores 0, not
    * 100 — two blank middlename fields are "no evidence", not a
    * perfect match, so they can't carry a row over required_threshold.
    */
  def wRatio(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val full = ratio(a, b)
    // split + sort each operand ONCE for both token scorers (the
    // cascade used to re-split per scorer; values identical)
    val ta = sortedTokens(a)
    val tb = sortedTokens(b)
    val ts = tokenSortRatioPre(ta, tb) * 0.95
    val tset = tokenSetRatioPre(ta, tb) * 0.95
    // operands are non-empty here (guarded at entry)
    val lenRatio =
      math.max(a.length, b.length).toDouble / math.min(a.length, b.length)
    val partial =
      if (lenRatio > 1.5) partialRatio(a, b) * 0.9 else 0.0
    math.max(math.max(full, ts), math.max(tset, partial))
  }

  // ------------------------------------------------------------------
  // Memoized entry points for the blocked-linkage hot path
  // ------------------------------------------------------------------

  /** Open-addressed, overwrite-on-collision score memo keyed on raw
    * UTF8String operands. Blocked record linkage re-scores the same
    * argument pair constantly: categorical columns (office / party /
    * district / suffix — the reference's match schema) have tens of
    * distinct values, and name columns repeat across every roster row
    * of a block. One thread-local memo per scorer turns the 5-6
    * levenshtein+tokenise passes of a repeat WRatio call into a
    * single hash probe — the Catalyst equivalent of rapidfuzz's
    * cached/preprocessed scorers. 2^16 slots ≈ 1.5 MB per thread;
    * misses cost two hashCodes, so high-cardinality inputs degrade to
    * the uncached path, never worse.
    *
    * Keyed on UTF8String since r19 (the String-keyed memo this
    * replaces still paid two UTF8String.toString DECODE ALLOCATIONS
    * per scorer call even on a hit — ~18 per joined pair across
    * q43's 9 scorer calls); probing on the UTF8String itself makes a
    * hit allocation-free. Stored keys are CLONED — codegen hands
    * UTF8Strings that point into reused UnsafeRow buffers, so a
    * retained reference would see its bytes rewritten by the next
    * row (probe-side equality is safe: it compares bytes eagerly). */
  private final class Utf8Memo {
    val mask: Int = (1 << 16) - 1
    val ka = new Array[org.apache.spark.unsafe.types.UTF8String](1 << 16)
    val kb = new Array[org.apache.spark.unsafe.types.UTF8String](1 << 16)
    val vs = new Array[Double](1 << 16)

    @inline def getOrCompute(
        a: org.apache.spark.unsafe.types.UTF8String,
        b: org.apache.spark.unsafe.types.UTF8String,
        f: (String, String) => Double): Double = {
      val h = (a.hashCode * 31 + b.hashCode) & mask
      if (a.equals(ka(h)) && b.equals(kb(h))) vs(h)
      else {
        val v = f(a.toString, b.toString)
        ka(h) = a.clone(); kb(h) = b.clone(); vs(h) = v
        v
      }
    }
  }

  private val wMemo8: ThreadLocal[Utf8Memo] = new ThreadLocal[Utf8Memo] {
    override def initialValue(): Utf8Memo = new Utf8Memo
  }
  private val ptMemo8: ThreadLocal[Utf8Memo] = new ThreadLocal[Utf8Memo] {
    override def initialValue(): Utf8Memo = new Utf8Memo
  }

  /** Memoized [[wRatio]] over raw UTF8String operands — identical
    * values to [[wRatioCached]], allocation-free on memo hits. */
  def wRatioCached(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): Double =
    wMemo8.get().getOrCompute(a, b, wRatio)

  /** Memoized [[partialTokenRatio]] over raw UTF8String operands. */
  def partialTokenRatioCached(
      a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): Double =
    ptMemo8.get().getOrCompute(a, b, partialTokenRatio)
}
