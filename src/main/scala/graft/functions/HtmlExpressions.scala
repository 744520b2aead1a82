package graft.functions

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Linear-scan HTML element extraction — the engine behind the
  * CSS-selector-style operators (ref: billtrack50_app/extract.py:25-33,
  * national/_674/ratings/extract.py:17-33, whose dominant shape is
  * `soup.find(tag, {"class"/"id": value})` followed by text pulls).
  *
  * A regexp cannot balance nested same-tag elements (a scorecard
  * container div full of inner divs closes at the FIRST `</div>` under
  * any non-greedy pattern), so matching runs as a single forward scan
  * with a depth counter — O(n) per page, no backtracking, allocation
  * only for emitted matches. Quote-aware: `>` inside quoted attribute
  * values does not terminate a tag.
  *
  * Scope (documented, test-pinned): well-formed lowercase-tag HTML like
  * the reference's scraped pages; void/self-closing elements yield empty
  * inner HTML; matching is case-insensitive on tag names, exact on
  * attribute values except `class`, which is whitespace-token contains
  * (the bs4 convention).
  */
object HtmlImpl {

  /** Parse the attributes of an opening tag span [from, to). */
  private def attrMatches(
      html: String, from: Int, to: Int,
      attrName: String, attrValue: String): Boolean = {
    if (attrName.isEmpty) return true
    var i = from
    while (i < to) {
      // skip whitespace
      while (i < to && Character.isWhitespace(html.charAt(i))) i += 1
      val nameStart = i
      while (i < to && html.charAt(i) != '=' &&
        !Character.isWhitespace(html.charAt(i)) && html.charAt(i) != '/') i += 1
      val name = html.substring(nameStart, i)
      while (i < to && Character.isWhitespace(html.charAt(i))) i += 1
      var value = ""
      if (i < to && html.charAt(i) == '=') {
        i += 1
        while (i < to && Character.isWhitespace(html.charAt(i))) i += 1
        if (i < to && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
          val q = html.charAt(i)
          val vStart = i + 1
          i += 1
          while (i < to && html.charAt(i) != q) i += 1
          value = html.substring(vStart, math.min(i, to))
          i += 1
        } else {
          val vStart = i
          while (i < to && !Character.isWhitespace(html.charAt(i))) i += 1
          value = html.substring(vStart, i)
        }
      }
      if (name.equalsIgnoreCase(attrName)) {
        if (attrName.equalsIgnoreCase("class")) {
          // bs4 convention: class matches any whitespace-separated token
          var s = 0
          while (s < value.length) {
            while (s < value.length && Character.isWhitespace(value.charAt(s))) s += 1
            val e0 = s
            while (s < value.length && !Character.isWhitespace(value.charAt(s))) s += 1
            if (s - e0 == attrValue.length &&
              value.regionMatches(false, e0, attrValue, 0, attrValue.length))
              return true
          }
          return false
        } else return value == attrValue
      }
      if (name.isEmpty) i += 1 // defensive: never stall
    }
    false
  }

  /** Raw value of attribute `name` within an opening-tag span
    * [from, to), or null when absent. */
  private def attrValueOf(
      html: String, from: Int, to: Int, name: String): String = {
    var i = from
    while (i < to) {
      while (i < to && Character.isWhitespace(html.charAt(i))) i += 1
      val nameStart = i
      while (i < to && html.charAt(i) != '=' &&
        !Character.isWhitespace(html.charAt(i)) && html.charAt(i) != '/') i += 1
      val n = html.substring(nameStart, i)
      while (i < to && Character.isWhitespace(html.charAt(i))) i += 1
      var value: String = null
      if (i < to && html.charAt(i) == '=') {
        i += 1
        while (i < to && Character.isWhitespace(html.charAt(i))) i += 1
        if (i < to && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
          val q = html.charAt(i)
          val vStart = i + 1
          i += 1
          while (i < to && html.charAt(i) != q) i += 1
          value = html.substring(vStart, math.min(i, to))
          i += 1
        } else {
          val vStart = i
          while (i < to && !Character.isWhitespace(html.charAt(i))) i += 1
          value = html.substring(vStart, i)
        }
      }
      if (n.equalsIgnoreCase(name)) return value
      if (n.isEmpty) i += 1
    }
    null
  }

  /** Attribute `wantAttr` of the FIRST `<tag attrName~=attrValue>`
    * element (bs4 `find(...)["attr"]`), null when the element or the
    * attribute is absent. Entities unescape like bs4 does for
    * attribute values (html.parser runs unescape over attrs too). */
  def firstAttr(
      html: String, tag: String, attrName: String, attrValue: String,
      wantAttr: String): String = {
    var i = 0
    while (i < html.length) {
      if (tagOpensAt(html, i, tag)) {
        val gt = tagEnd(html, i)
        if (gt < 0) return null
        if (attrMatches(html, i + 1 + tag.length, gt, attrName, attrValue)) {
          val v = attrValueOf(html, i + 1 + tag.length, gt, wantAttr)
          return if (v == null) null else unescapeEntities(v)
        }
        i = gt + 1
      } else i += 1
    }
    null
  }

  def firstAttrU(html: UTF8String, tag: String, an: String, av: String,
      want: String): UTF8String = {
    val r = firstAttr(html.toString, tag, an, av, want)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** True iff html has `<tag` starting at i (case-insensitive) followed
    * by a name boundary. */
  private def tagOpensAt(html: String, i: Int, tag: String): Boolean =
    i + 1 + tag.length <= html.length &&
      html.charAt(i) == '<' &&
      html.regionMatches(true, i + 1, tag, 0, tag.length) && {
        val c = if (i + 1 + tag.length < html.length)
          html.charAt(i + 1 + tag.length) else '>'
        c == '>' || c == '/' || Character.isWhitespace(c)
      }

  private def tagClosesAt(html: String, i: Int, tag: String): Boolean =
    i + 2 + tag.length <= html.length &&
      html.charAt(i) == '<' && html.charAt(i + 1) == '/' &&
      html.regionMatches(true, i + 2, tag, 0, tag.length) && {
        // name boundary, mirroring tagOpensAt: without it `</pre>` would
        // count as a close of `p` and truncate the inner HTML early
        val c = if (i + 2 + tag.length < html.length)
          html.charAt(i + 2 + tag.length) else '>'
        c == '>' || Character.isWhitespace(c)
      }

  /** End index (exclusive of '>') of the tag starting at `i`, skipping
    * quoted attribute values; returns -1 if unterminated. */
  private def tagEnd(html: String, i: Int): Int = {
    var j = i
    var quote: Char = 0
    while (j < html.length) {
      val c = html.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return j
      j += 1
    }
    -1
  }

  /** Inner HTML of elements `<tag ... attrName~=attrValue>` in document
    * order. Matches do not recurse into a matched element (scan resumes
    * after its close), which is what the reference's container-then-
    * children pulls need. */
  def findAll(
      html: String, tag: String, attrName: String, attrValue: String,
      firstOnly: Boolean): List[String] = {
    val out = ListBuffer.empty[String]
    var i = 0
    while (i < html.length) {
      if (tagOpensAt(html, i, tag)) {
        val gt = tagEnd(html, i)
        if (gt < 0) return out.toList // unterminated tag: stop
        if (attrMatches(html, i + 1 + tag.length, gt, attrName, attrValue)) {
          if (html.charAt(gt - 1) == '/') { // self-closing
            out += ""
            i = gt + 1
          } else {
            // balanced scan for the matching close
            var depth = 1
            var j = gt + 1
            var innerEnd = -1
            while (depth > 0 && j < html.length) {
              if (tagClosesAt(html, j, tag)) {
                depth -= 1
                if (depth == 0) innerEnd = j
                j = math.max(tagEnd(html, j), j) + 1
              } else if (tagOpensAt(html, j, tag)) {
                val e = tagEnd(html, j)
                if (e > 0 && html.charAt(e - 1) != '/') depth += 1
                j = math.max(e, j) + 1
              } else j += 1
            }
            if (innerEnd < 0) { // unclosed: take rest, stop scanning
              out += html.substring(gt + 1)
              i = html.length
            } else {
              out += html.substring(gt + 1, innerEnd)
              i = j
            }
          }
          if (firstOnly) return out.toList
        } else i = gt + 1
      } else i += 1
    }
    out.toList
  }

  private val Entities = List(
    "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<",
    "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'")

  /** Single left-to-right entity unescape: each source '&' is consumed
    * by at most one entity, so "&amp;lt;" yields the literal "&lt;"
    * (bs4 parity) instead of the double-unescaped "<" that sequential
    * whole-string replaces produce. */
  private def unescapeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        var matched = false
        val it = Entities.iterator
        while (!matched && it.hasNext) {
          val (from, to) = it.next()
          if (s.regionMatches(i, from, 0, from.length)) {
            sb.append(to)
            i += from.length
            matched = true
          }
        }
        if (!matched) { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** bs4 `get_text(strip=True)`-style text: tags stripped, entities
    * unescaped, whitespace collapsed, trimmed. */
  def text(html: String): String = {
    val sb = new java.lang.StringBuilder(html.length)
    var i = 0
    var inTag = false
    var quote: Char = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (inTag) {
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') inTag = false
      } else if (c == '<') inTag = true
      else sb.append(c)
      i += 1
    }
    unescapeEntities(sb.toString).replaceAll("\\s+", " ").trim
  }

  // UTF8String entry points for generated code
  def firstU(html: UTF8String, tag: String, an: String, av: String): UTF8String =
    findAll(html.toString, tag, an, av, firstOnly = true) match {
      case h :: _ => UTF8String.fromString(h)
      case Nil => null
    }

  def allU(html: UTF8String, tag: String, an: String, av: String): GenericArrayData =
    new GenericArrayData(
      findAll(html.toString, tag, an, av, firstOnly = false)
        .map(UTF8String.fromString).toArray[Any])

  def textU(html: UTF8String): UTF8String =
    UTF8String.fromString(text(html.toString))
}

private object HtmlExprCheck {
  def string(name: String, dt: DataType): TypeCheckResult =
    if (dt == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires a string argument, got ${dt.simpleString}")

  /** Escape a Scala string into a Java source literal for codegen. */
  def lit(s: String): String =
    "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case c => c.toString
    } + "\""
}

/** `html_element(html, tag, attrName, attrValue)` — inner HTML of the
  * first matching element, null when absent (bs4 `find`). Selector
  * params are foldable and baked into generated code. */
case class HtmlElement(child: Expression, tag: String,
    attrName: String, attrValue: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    HtmlExprCheck.string(prettyName, child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    HtmlImpl.firstU(input.asInstanceOf[UTF8String], tag, attrName, attrValue)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      import HtmlExprCheck.lit
      s"""
         |${ev.value} = graft.functions.HtmlImpl.firstU(
         |  $c, ${lit(tag)}, ${lit(attrName)}, ${lit(attrValue)});
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "html_element"
}

/** `html_elements(html, tag, attrName, attrValue)` — inner HTML of ALL
  * matching elements as array<string> (bs4 `find_all`; empty array when
  * none). */
case class HtmlElements(child: Expression, tag: String,
    attrName: String, attrValue: String) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    HtmlExprCheck.string(prettyName, child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    HtmlImpl.allU(input.asInstanceOf[UTF8String], tag, attrName, attrValue)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      import HtmlExprCheck.lit
      s"graft.functions.HtmlImpl.allU($c, ${lit(tag)}, ${lit(attrName)}, ${lit(attrValue)})"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "html_elements"
}

/** `html_attr(html, tag, attrName, attrValue, wantAttr)` — attribute
  * value of the first matching element (bs4 `find(...)["attr"]`), null
  * when the element or attribute is absent. */
case class HtmlAttr(child: Expression, tag: String,
    attrName: String, attrValue: String, wantAttr: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    HtmlExprCheck.string(prettyName, child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    HtmlImpl.firstAttrU(input.asInstanceOf[UTF8String],
      tag, attrName, attrValue, wantAttr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      import HtmlExprCheck.lit
      s"""
         |${ev.value} = graft.functions.HtmlImpl.firstAttrU(
         |  $c, ${lit(tag)}, ${lit(attrName)}, ${lit(attrValue)}, ${lit(wantAttr)});
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "html_attr"
}

/** `html_text(html)` — tags stripped, entities unescaped, whitespace
  * collapsed (bs4 `get_text(strip=True)`). */
case class HtmlText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    HtmlExprCheck.string(prettyName, child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    HtmlImpl.textU(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlImpl.textU($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "html_text"
}
