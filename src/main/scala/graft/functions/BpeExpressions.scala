package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel behind `bpe_encode`: apply a TRAINED byte-pair-encoding
  * merge list to a word (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the encode half
  * of the tokenizer story whose train half is
  * [[graft.operators.Bpe.train]] (q126 counts the pair statistics
  * BPE training is built from; this turns a trained merge table into
  * exact tokenizations, so token budgets (q74/q98/q117) can run on
  * real tokenizer counts instead of q39's whitespace approximation).
  *
  * Semantics (deterministic, and replayable in ANSI SQL — which is
  * what keeps q154 hash-exact against the DuckDB oracle): the word
  * starts as its CODE POINT sequence; each step merges exactly ONE
  * adjacent pair — the one with the lowest merge rank, leftmost on
  * ties — and the loop stops when no adjacent pair is in the table.
  * One pair per step (rather than all occurrences of the best pair)
  * is chosen because each step is then a single bounded SQL
  * expression: a ≤ n-char word unrolls to ≤ n−1 CTE steps.
  *
  * Cost shape: the merge table is tiny and rides into generated code
  * as a reference object (broadcast-by-closure — never a join), and
  * a per-THREAD LRU memo caches whole-word encodings: corpus word
  * frequencies are Zipfian, so the loop runs roughly once per
  * distinct word per task, not once per token. No shuffle is
  * introduced at any point — encoding is a pure projection.
  */
final class BpeCodec(val pairs: Array[String]) extends Serializable {

  /** pair ("left|right") → rank; first occurrence wins. */
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pairs.length * 2)
    var i = 0
    while (i < pairs.length) {
      if (!m.containsKey(pairs(i))) m.put(pairs(i), Integer.valueOf(i))
      i += 1
    }
    m
  }

  private val CacheMax = 4096

  // Per-thread LRU: expression instances are shared across executor
  // threads in local mode, and a shared map would need locking on the
  // hottest path in the query. GenericArrayData values are immutable,
  // so handing the same instance to many rows is safe (consumers copy
  // into unsafe rows).
  @transient private lazy val cache
      : ThreadLocal[java.util.LinkedHashMap[String, ArrayData]] =
    ThreadLocal.withInitial { () =>
      new java.util.LinkedHashMap[String, ArrayData](256, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, ArrayData]): Boolean =
          size() > CacheMax
      }
    }

  def encode(w: UTF8String): ArrayData = {
    val s = w.toString
    val c = cache.get()
    val hit = c.get(s)
    if (hit != null) return hit
    val r = encodeUncached(s)
    c.put(s, r)
    r
  }

  private def encodeUncached(s: String): ArrayData = {
    val toks = new java.util.ArrayList[String](math.max(4, s.length))
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      toks.add(s.substring(i, i + n))
      i += n
    }
    var done = toks.size < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var j = 0
      val last = toks.size - 1
      while (j < last) {
        val r = ranks.get(toks.get(j) + "|" + toks.get(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestI = j
        }
        j += 1
      }
      if (bestI < 0) done = true
      else {
        toks.set(bestI, toks.get(bestI) + toks.get(bestI + 1))
        toks.remove(bestI + 1)
        done = toks.size < 2
      }
    }
    val out = new Array[Any](toks.size)
    var k = 0
    while (k < toks.size) {
      out(k) = UTF8String.fromString(toks.get(k)); k += 1
    }
    new GenericArrayData(out)
  }
}

/** Kernel behind `wordpiece_encode`: greedy longest-match-first
  * subword tokenization against a trained vocabulary (Wu et al. 2016,
  * "Google's Neural Machine Translation System" — the BERT tokenizer
  * family), the second tokenizer beside BPE. Continuation pieces
  * carry the `##` prefix; a word with no tokenization becomes the
  * single `[UNK]` token (whole-word UNK, BERT semantics).
  *
  * Semantics (deterministic and SQL-replayable, which keeps the
  * histogram query hash-exact): from position i, take the LONGEST
  * substring whose vocab form (`##`-prefixed when i > 0) is in the
  * vocabulary, emit it, and continue after it; if no prefix matches,
  * the whole word is `[UNK]`. Unlike BPE's iterative merge loop this
  * is a single left-to-right pass — O(len²) probes per word worst
  * case, all against one hash set.
  *
  * Cost shape identical to [[BpeCodec]]: vocabulary rides into
  * generated code as a reference object, per-thread LRU memoizes
  * whole-word encodings, no shuffle — encoding is a pure projection.
  */
final class WordPieceCodec(val vocab: Array[String]) extends Serializable {

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    var i = 0
    while (i < vocab.length) { s.add(vocab(i)); i += 1 }
    s
  }

  private val CacheMax = 4096
  private val Unk = UTF8String.fromString("[UNK]")

  @transient private lazy val cache
      : ThreadLocal[java.util.LinkedHashMap[String, ArrayData]] =
    ThreadLocal.withInitial { () =>
      new java.util.LinkedHashMap[String, ArrayData](256, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, ArrayData]): Boolean =
          size() > CacheMax
      }
    }

  def encode(w: UTF8String): ArrayData = {
    val s = w.toString
    val c = cache.get()
    val hit = c.get(s)
    if (hit != null) return hit
    val r = encodeUncached(s)
    c.put(s, r)
    r
  }

  private def encodeUncached(s: String): ArrayData = {
    val toks = new java.util.ArrayList[String](4)
    var i = 0
    var unk = s.isEmpty
    while (i < s.length && !unk) {
      var j = s.length
      var found: String = null
      while (j > i && found == null) {
        val sub =
          if (i > 0) "##" + s.substring(i, j) else s.substring(i, j)
        if (set.contains(sub)) found = sub else j -= 1
      }
      if (found == null) unk = true
      else { toks.add(found); i = j }
    }
    if (unk) new GenericArrayData(Array[Any](Unk))
    else {
      val out = new Array[Any](toks.size)
      var k = 0
      while (k < toks.size) {
        out(k) = UTF8String.fromString(toks.get(k)); k += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** `wordpiece_encode(word, vocab)` — tokenize one word against a
  * LITERAL vocabulary (array<string>; continuation pieces spelled
  * with their `##` prefix). Null word → null; the vocab must be
  * foldable for the same reason as [[BpeEncode]]'s merge list. */
case class WordPieceEncode(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "wordpiece_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: word must be string, got ${left.dataType.simpleString}")
    else if (!right.foldable || (right.dataType match {
      case ArrayType(StringType, _) => false
      case _ => true
    }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: vocab must be a literal array<string>")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val codec: WordPieceCodec = {
    val ad = right.eval().asInstanceOf[ArrayData]
    val arr = new Array[String](ad.numElements())
    var i = 0
    while (i < arr.length) {
      arr(i) = ad.getUTF8String(i).toString; i += 1
    }
    new WordPieceCodec(arr)
  }

  override protected def nullSafeEval(w: Any, m: Any): Any =
    codec.encode(w.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpCodec", codec,
      classOf[WordPieceCodec].getName)
    defineCodeGen(ctx, ev, (c, _) => s"$ref.encode($c)")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): WordPieceEncode =
    copy(left = l, right = r)
}

/** Kernel behind `unigram_encode`: Viterbi segmentation against a
  * unigram language model over pieces (Kudo 2018, "Subword
  * Regularization" — the SentencePiece unigram tokenizer), the third
  * tokenizer family beside BPE and WordPiece. The segmentation
  * maximizes Σ logp(piece); ties break to the SMALLEST split point
  * (earliest parent), which together with left-to-right DP order
  * makes the result deterministic and SQL-replayable — dp[j] =
  * max_i(dp[i] + logp(w[i..j])) evaluates the same IEEE additions in
  * both engines, so even exact-tie comparisons agree bit-for-bit.
  * A word whose lattice has no path (a character outside the piece
  * inventory) becomes the single `[UNK]` token.
  *
  * Cost shape identical to [[BpeCodec]]: the (piece → logp) model
  * rides into generated code as a reference object, per-thread LRU
  * memoizes whole-word encodings, no shuffle — encoding is a pure
  * projection. The DP is O(len²) map probes per uncached word.
  */
final class UnigramCodec(val pieces: Array[String],
    val logps: Array[Double]) extends Serializable {
  require(pieces.length == logps.length,
    "unigram_encode: pieces and logps must align")

  @transient private lazy val model: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      if (!m.containsKey(pieces(i)))
        m.put(pieces(i), java.lang.Double.valueOf(logps(i)))
      i += 1
    }
    m
  }

  private val CacheMax = 4096
  private val Unk = UTF8String.fromString("[UNK]")

  @transient private lazy val cache
      : ThreadLocal[java.util.LinkedHashMap[String, ArrayData]] =
    ThreadLocal.withInitial { () =>
      new java.util.LinkedHashMap[String, ArrayData](256, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, ArrayData]): Boolean =
          size() > CacheMax
      }
    }

  def encode(w: UTF8String): ArrayData = {
    val s = w.toString
    val c = cache.get()
    val hit = c.get(s)
    if (hit != null) return hit
    val r = encodeUncached(s)
    c.put(s, r)
    r
  }

  private def encodeUncached(s: String): ArrayData = {
    val n = s.length
    if (n == 0) return new GenericArrayData(Array[Any](Unk))
    val dp = new Array[Double](n + 1)
    val parent = new Array[Int](n + 1)
    val reached = new Array[Boolean](n + 1)
    reached(0) = true
    var j = 1
    while (j <= n) {
      var best = Double.NegativeInfinity
      var bi = -1
      var i = 0
      while (i < j) {
        if (reached(i)) {
          val lp = model.get(s.substring(i, j))
          if (lp != null) {
            val cand = dp(i) + lp.doubleValue()
            // strict > keeps the EARLIEST parent on exact ties —
            // the list_min tie-break the SQL oracle replays
            if (cand > best) { best = cand; bi = i }
          }
        }
        i += 1
      }
      if (bi >= 0) { dp(j) = best; parent(j) = bi; reached(j) = true }
      j += 1
    }
    if (!reached(n)) return new GenericArrayData(Array[Any](Unk))
    var cnt = 0
    var p = n
    while (p > 0) { cnt += 1; p = parent(p) }
    val out = new Array[Any](cnt)
    p = n
    var k = cnt - 1
    while (p > 0) {
      out(k) = UTF8String.fromString(s.substring(parent(p), p))
      p = parent(p); k -= 1
    }
    new GenericArrayData(out)
  }
}

/** `unigram_encode(word, pieces, logps)` — Viterbi-tokenize one word
  * against LITERAL parallel arrays (piece inventory + natural-log
  * probabilities). Null word → null; the model must be foldable for
  * the same reason as [[BpeEncode]]'s merge list. */
case class UnigramEncode(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def prettyName: String = "unigram_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: word must be string, got ${first.dataType.simpleString}")
    else if (!second.foldable || (second.dataType match {
      case ArrayType(StringType, _) => false
      case _ => true
    }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: pieces must be a literal array<string>")
    else if (!third.foldable || (third.dataType match {
      case ArrayType(org.apache.spark.sql.types.DoubleType, _) => false
      case _ => true
    }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: logps must be a literal array<double>")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val codec: UnigramCodec = {
    val pa = second.eval().asInstanceOf[ArrayData]
    val ps = new Array[String](pa.numElements())
    var i = 0
    while (i < ps.length) { ps(i) = pa.getUTF8String(i).toString; i += 1 }
    val la = third.eval().asInstanceOf[ArrayData]
    val ls = new Array[Double](la.numElements())
    i = 0
    while (i < ls.length) { ls(i) = la.getDouble(i); i += 1 }
    new UnigramCodec(ps, ls)
  }

  override protected def nullSafeEval(w: Any, p: Any, l: Any): Any =
    codec.encode(w.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugCodec", codec,
      classOf[UnigramCodec].getName)
    defineCodeGen(ctx, ev, (c, _, _) => s"$ref.encode($c)")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): UnigramEncode =
    copy(first = f, second = s, third = t)
}

/** GPT-2-style byte↔unicode alphabet (Radford et al. 2019 `bytes_to_
  * unicode`): a BIJECTION from the 256 byte values onto 256 printable
  * BMP chars, so BYTE-level BPE can reuse the whole string-token merge
  * machinery — a word becomes its UTF-8 bytes, each byte becomes one
  * alphabet char, and merges/encodes run over those chars exactly as
  * the char-level tokenizer does. Because every byte has a symbol,
  * NO input is ever out-of-alphabet (the no-UNK property byte-level
  * tokenizers exist for).
  *
  * One deliberate deviation from the GPT-2 table: byte 0x7C ('|') maps
  * into the 256+ offset range instead of to itself — '|' is this
  * engine's merge-pair separator ("left|right" rank keys, saveMerges
  * round trip), and a symbol alphabet containing it would make those
  * keys ambiguous (the same reason trainFromCounts rejects it). The
  * mapping stays a bijection, so nothing else changes. */
object ByteAlphabet {
  val byteToChar: Array[Char] = {
    // printable bytes keep their own char — EXCEPT '|' (0x7C), see doc
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255))
      .filterNot(_ == '|'.toInt).toSet
    val out = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      if (printable(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }
  val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** UTF-8 bytes of `s`, one alphabet char per byte. */
  def toSymbols(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = byteToChar(bytes(i) & 0xff); i += 1 }
    new String(out)
  }

  /** Inverse of [[toSymbols]] — for displaying byte-level tokens. */
  def fromSymbols(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      bytes(i) = charToByte.getOrElse(s.charAt(i),
        throw new IllegalArgumentException(
          s"fromSymbols: '${s.charAt(i)}' is not an alphabet symbol")
      ).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** Reference object behind `byte_symbols` — stateless, but shipped as
  * a codegen reference so generated code calls a plain method. */
final class ByteSymbolsCodec extends Serializable {
  def encode(w: UTF8String): UTF8String =
    UTF8String.fromString(ByteAlphabet.toSymbols(w.toString))
}

/** `byte_symbols(text)` — map a string to its UTF-8 byte-symbol form
  * under [[ByteAlphabet]] (one BMP char per byte). The pre-step that
  * turns the char-level `bpe_encode` kernel into a BYTE-level
  * tokenizer; printable ASCII (minus '|') maps to itself, so on plain
  * ASCII corpora the mapping is the identity — which is what keeps
  * the byte-BPE query SQL-replayable. Null → null; a pure projection
  * (codegen'd, no shuffle). */
case class ByteSymbols(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "byte_symbols"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: text must be string, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val codec = new ByteSymbolsCodec

  override protected def nullSafeEval(w: Any): Any =
    codec.encode(w.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteSymCodec", codec,
      classOf[ByteSymbolsCodec].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(
      c: Expression): ByteSymbols = copy(child = c)
}

/** `bpe_encode(word, merges)` — tokenize one word against a LITERAL
  * merge list (array<string> of "left|right" entries in rank order).
  * Null word → null; the merge list must be foldable (it is state,
  * not data — a column there would mean re-building the rank table
  * per row). */
case class BpeEncode(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "bpe_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: word must be string, got ${left.dataType.simpleString}")
    else if (!right.foldable || (right.dataType match {
      case ArrayType(StringType, _) => false
      case _ => true
    }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: merges must be a literal array<string>")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val codec: BpeCodec = {
    val ad = right.eval().asInstanceOf[ArrayData]
    val arr = new Array[String](ad.numElements())
    var i = 0
    while (i < arr.length) {
      arr(i) = ad.getUTF8String(i).toString; i += 1
    }
    new BpeCodec(arr)
  }

  override protected def nullSafeEval(w: Any, m: Any): Any =
    codec.encode(w.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec,
      classOf[BpeCodec].getName)
    defineCodeGen(ctx, ev, (c, _) => s"$ref.encode($c)")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BpeEncode = copy(left = l, right = r)
}
