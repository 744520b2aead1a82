package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernels behind `ac_count` / `ac_matches`: Aho–Corasick
  * multi-pattern search (Aho & Corasick 1975, "Efficient string
  * matching") — the blocklist/badlist screening step of a C4-style
  * curation pipeline, where a document is checked against THOUSANDS
  * of phrases. One automaton pass is O(len + matches) per document
  * regardless of pattern count; the naive contains-any alternative
  * is O(len · patterns) and becomes the scan bottleneck exactly when
  * the list gets serious.
  *
  * Semantics (deterministic and SQL-replayable at small pattern
  * counts, which keeps the registered query hash-exact):
  * - `count`: the number of (end position, pattern) match pairs —
  *   overlapping occurrences and nested patterns each count
  *   (pattern "aa" occurs twice in "aaa"; "he" and "she" both
  *   count when "she" ends).
  * - `matches`: the DISTINCT matched patterns in pattern-list order.
  *
  * The automaton is built once per expression instance (goto/fail/
  * output links over a dense per-node HashMap trie) and rides into
  * generated code as a reference object — broadcast by closure,
  * never a join. Matching is a pure projection; no shuffle.
  */
final class AcCodec(val patterns: Array[String]) extends Serializable {

  // trie arrays built lazily on first use per JVM
  @transient private lazy val automaton: (
      Array[java.util.HashMap[Character, Integer]], // goto
      Array[Int],                                   // fail
      Array[Array[Int]]                             // output pattern ids
  ) = {
    val goto = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outs = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    // build trie
    var pi = 0
    while (pi < patterns.length) {
      val p = patterns(pi)
      var node = 0
      var i = 0
      while (i < p.length) {
        val c = Character.valueOf(p.charAt(i))
        val nxt = goto(node).get(c)
        if (nxt == null) {
          goto += new java.util.HashMap[Character, Integer]()
          outs += scala.collection.mutable.ArrayBuffer.empty[Int]
          goto(node).put(c, Integer.valueOf(goto.length - 1))
          node = goto.length - 1
        } else node = nxt.intValue()
        i += 1
      }
      if (p.nonEmpty) outs(node) += pi
      pi += 1
    }
    // BFS fail links
    val fail = new Array[Int](goto.length)
    val queue = new java.util.ArrayDeque[Integer]()
    goto(0).forEach { (_, v) => queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      goto(u).forEach { (c, v) =>
        queue.add(v)
        var f = fail(u)
        while (f != 0 && goto(f).get(c) == null) f = fail(f)
        val g = goto(f).get(c)
        fail(v.intValue()) =
          if (g != null && g.intValue() != v.intValue()) g.intValue() else 0
        outs(v.intValue()) ++= outs(fail(v.intValue()))
      }
    }
    (goto.toArray, fail, outs.map(_.toArray).toArray)
  }

  private def step(node0: Int, c: Char,
      goto: Array[java.util.HashMap[Character, Integer]],
      fail: Array[Int]): Int = {
    var node = node0
    val ch = Character.valueOf(c)
    var g = goto(node).get(ch)
    while (node != 0 && g == null) {
      node = fail(node)
      g = goto(node).get(ch)
    }
    if (g == null) 0 else g.intValue()
  }

  /** (end position, pattern) match-pair count. */
  def count(text: UTF8String): Int = {
    val (goto, fail, outs) = automaton
    val s = text.toString
    var node = 0
    var n = 0
    var i = 0
    while (i < s.length) {
      node = step(node, s.charAt(i), goto, fail)
      n += outs(node).length
      i += 1
    }
    n
  }

  /** Distinct matched patterns in pattern-list order. */
  def matches(text: UTF8String): ArrayData = {
    val (goto, fail, outs) = automaton
    val s = text.toString
    val hit = new Array[Boolean](patterns.length)
    var node = 0
    var i = 0
    while (i < s.length) {
      node = step(node, s.charAt(i), goto, fail)
      val o = outs(node)
      var j = 0
      while (j < o.length) { hit(o(j)) = true; j += 1 }
      i += 1
    }
    val out = new java.util.ArrayList[Any](4)
    i = 0
    while (i < patterns.length) {
      if (hit(i)) out.add(UTF8String.fromString(patterns(i)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

private[functions] object AcExpr {
  def codec(right: Expression): AcCodec = {
    val ad = right.eval().asInstanceOf[ArrayData]
    val arr = new Array[String](ad.numElements())
    var i = 0
    while (i < arr.length) { arr(i) = ad.getUTF8String(i).toString; i += 1 }
    new AcCodec(arr)
  }
  def check(name: String, l: Expression, r: Expression): TypeCheckResult =
    if (l.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$name: text must be string, got ${l.dataType.simpleString}")
    else if (!r.foldable || (r.dataType match {
      case ArrayType(StringType, _) => false
      case _ => true
    }))
      TypeCheckResult.TypeCheckFailure(
        s"$name: patterns must be a literal array<string>")
    else TypeCheckResult.TypeCheckSuccess
}

/** `ac_count(text, patterns)` — total (end position, pattern) match
  * pairs; overlapping and nested matches count. */
case class AcCount(left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "ac_count"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    AcExpr.check(prettyName, left, right)
  private lazy val codec: AcCodec = AcExpr.codec(right)
  override protected def nullSafeEval(t: Any, p: Any): Any =
    codec.count(t.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acCodec", codec, classOf[AcCodec].getName)
    defineCodeGen(ctx, ev, (c, _) => s"$ref.count($c)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): AcCount = copy(left = l, right = r)
}

/** `ac_matches(text, patterns)` — distinct matched patterns in
  * pattern-list order (empty array when clean). */
case class AcMatches(left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "ac_matches"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    AcExpr.check(prettyName, left, right)
  private lazy val codec: AcCodec = AcExpr.codec(right)
  override protected def nullSafeEval(t: Any, p: Any): Any =
    codec.matches(t.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acCodec", codec, classOf[AcCodec].getName)
    defineCodeGen(ctx, ev, (c, _) => s"$ref.matches($c)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): AcMatches = copy(left = l, right = r)
}
