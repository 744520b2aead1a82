package graft

import org.apache.spark.sql.functions._
import graft.functions.HtmlImpl
import graft.operators.CssExtract

/** Pins CssExtract to the reference extractors' behavior on sample
  * pages (billtrack50_app/extract.py:25-42 `extract_candidate`,
  * national/_674/ratings/extract.py:17-33 `extract_candidate`). */
class CssExtractSpec extends SparkSpec {
  import spark.implicits._

  // --- the billtrack50 scorecard shape, with a NESTED div inside the
  // container (a non-greedy regex would close the container at the
  // first </div> and lose every <p> after it)
  private val bt50Page =
    """<html><body><div class="outer">
      |<div class="bt50-scorecard-container" data-legislatorid="L42">
      |  <div class="legislator-sub-head">Sen. Jane Q. Doe &amp; Co <em>(R-TX-07)</em></div>
      |  <p class="legislator-detail-score"><strong>2023</strong><span> 87% </span></p>
      |  <p class="legislator-detail-score"><strong>Lifetime</strong><span>91%</span></p>
      |  <p class="unrelated"><strong>ignore</strong><span>me</span></p>
      |</div>
      |<div class="bt50-scorecard-container"><div class="legislator-sub-head">SECOND</div></div>
      |</body></html>""".stripMargin

  test("bt50 scorecard: container is balanced, info + scores match bs4") {
    val out = Seq(bt50Page).toDF("html")
      .select(CssExtract.bt50Scorecard(col("html")).as("r"))
      .select(col("r.info"), col("r.scores"))
      .head
    assert(out.getString(0) == "Sen. Jane Q. Doe & Co (R-TX-07)")
    val scores = out.getMap[String, String](1)
    assert(scores == Map("2023" -> "87%", "Lifetime" -> "91%"))
  }

  test("rep scorecard: div#rep -> span.eyebrow + strong/em zip") {
    val page =
      """<div id="page"><div id="rep"><div class="detail">
        |<span class="eyebrow">Rep. John Smith (D-CA-12)</span><span class="other">x</span>
        |</div><div class="score">
        |<strong>2024</strong><em>95</em><strong>Career</strong><em>88</em>
        |</div></div></div>""".stripMargin
    val out = Seq(page).toDF("html")
      .select(CssExtract.repScorecard(col("html")).as("r"))
      .select(col("r.info"), col("r.scores"))
      .head
    assert(out.getString(0) == "Rep. John Smith (D-CA-12)")
    assert(out.getMap[String, String](1) == Map("2024" -> "95", "Career" -> "88"))
  }

  test("endorsement label-run walk mirrors extract_list") {
    // hslf endorsements shape: one <p> of strong/br runs under a state h3
    val page =
      """<h3>Texas</h3><div class="endorsements-list"><p>
        |<strong>U.S. Senate</strong><br>Jane Doe (D)<br>Bob Lee (I)
        |<strong>U.S. House</strong> ignored preamble<br>John Smith (R)<br>
        |<strong>Governor</strong><br></p></div>""".stripMargin.replace("\n", "")
    val out = Seq(page).toDF("html")
      .select(explode(CssExtract.endorsements(col("html"))).as("e"))
      .select("e.office", "e.info", "e.state")
      .as[(String, String, String)].collect().toSeq
    // "ignored preamble" sits between </strong> and the first <br> —
    // the reference's next-sibling-of-br walk skips it; Governor has no
    // lines and emits nothing
    assert(out == Seq(
      ("U.S. Senate", "Jane Doe (D)", "Texas"),
      ("U.S. Senate", "Bob Lee (I)", "Texas"),
      ("U.S. House", "John Smith (R)", "Texas")))
  }

  test("card extraction pulls hrefs, parses id segments, reads texts") {
    val page =
      """<div id="legislators-container"><div class="legislator-list">
        |<div class="card"><a href="/legislators/smith42/">go</a>
        |  <div class="name">John Smith</div>
        |  <div class="party"><span class="value">R</span></div>
        |  <div class="info">TX-07</div></div>
        |<div class="card"><a href="/legislators/doe7">go</a>
        |  <div class="name">Jane Doe</div>
        |  <div class="party"><span class="value">D</span></div>
        |  <div class="info">CA-12</div></div>
        |</div></div>""".stripMargin
    val out = Seq(page).toDF("html")
      .select(explode(CssExtract.cards(col("html"))).as("c"))
      .select("c.url", "c.sig_candidate_id", "c.name", "c.party", "c.card_info")
      .as[(String, String, String, String, String)].collect().toSeq
    assert(out == Seq(
      ("/legislators/smith42/", "smith42", "John Smith", "R", "TX-07"),
      ("/legislators/doe7", "doe7", "Jane Doe", "D", "CA-12")))
  }

  test("html_attr: absent element or attribute yields null") {
    import graft.functions.HtmlImpl
    val h = """<a class="x" href="/p">t</a><a class="y">no href</a>"""
    assert(HtmlImpl.firstAttr(h, "a", "class", "x", "href") == "/p")
    assert(HtmlImpl.firstAttr(h, "a", "class", "y", "href") == null)
    assert(HtmlImpl.firstAttr(h, "a", "class", "z", "href") == null)
  }

  test("class attribute matches whitespace-separated tokens (bs4 rule)") {
    val h = """<div class="a bt50-scorecard-container b">X</div>"""
    assert(HtmlImpl.findAll(h, "div", "class", "bt50-scorecard-container",
      firstOnly = true) == List("X"))
    assert(HtmlImpl.findAll(h, "div", "class", "bt50", firstOnly = true).isEmpty)
  }

  test("'>' inside a quoted attribute value does not end the tag") {
    val h = """<div class="c" title="a>b">inner</div>"""
    assert(HtmlImpl.findAll(h, "div", "class", "c", firstOnly = true) ==
      List("inner"))
  }

  test("missing element yields null (bs4 find -> None)") {
    val out = Seq("<div class='x'>y</div>").toDF("html")
      .select(CssExtract.element(col("html"), "div", "class", "absent"))
      .head
    assert(out.isNullAt(0))
  }

  test("html_text strips tags, unescapes entities, collapses whitespace") {
    assert(HtmlImpl.text("  <b>A&amp;B</b>\n &nbsp; <i>c</i>  ") == "A&B c")
  }

  test("closing tag needs a name boundary: </pre> is not a close of p") {
    // without the boundary check, </pre> prefix-matches </p, depth goes
    // negative mid-element, and the inner HTML truncates at the <pre>
    val h = "<p class=\"s\">foo<pre>x</pre>bar</p><param name=\"n\"></param>"
    assert(HtmlImpl.findAll(h, "p", "class", "s", firstOnly = true) ==
      List("foo<pre>x</pre>bar"))
    // whitespace before '>' still closes: </p > is a valid close of p
    assert(HtmlImpl.findAll("<p class=\"s\">a</p >", "p", "class", "s",
      firstOnly = true) == List("a"))
  }

  test("entity unescape is single-pass: &amp;lt; stays the literal &lt;") {
    // bs4's get_text consumes each source '&' once — sequential
    // whole-string replaces would double-unescape to '<'
    assert(HtmlImpl.text("<b>&amp;lt;</b>") == "&lt;")
    assert(HtmlImpl.text("&amp;amp;") == "&amp;")
    assert(HtmlImpl.text("a &notanentity b") == "a &notanentity b")
  }

  test("sql selector args must be non-null literals (clear error)") {
    Seq(("<div class='x'>y</div>", "div")).toDF("html", "t")
      .createOrReplaceTempView("css_arg_check")
    val colErr = intercept[Exception] {
      spark.sql("SELECT html_element(html, t, 'class', 'x') FROM css_arg_check")
        .collect()
    }
    assert(colErr.getMessage.contains("must be a literal"))
    val nullErr = intercept[Exception] {
      spark.sql("SELECT html_element(html, CAST(NULL AS STRING), 'class', 'x') " +
        "FROM css_arg_check").collect()
    }
    assert(nullErr.getMessage.contains("non-null"))
  }

  test("self-closing and nested same-tag elements") {
    val h = "<div class=\"o\">a<div>b<div>c</div>d</div>e</div><div class=\"o\">2</div>"
    assert(HtmlImpl.findAll(h, "div", "class", "o", firstOnly = false) ==
      List("a<div>b<div>c</div>d</div>e", "2"))
    assert(HtmlImpl.findAll("<br/><div class=\"z\">q</div>", "br", "", "",
      firstOnly = false) == List(""))
  }

  test("div-grid table: dynamic header zip, sort-attribute key cell") {
    // the LCV members-of-congress shape (national/_1012/extract.py:22-47)
    val page =
      """<html><body><div id="moc-list-table">
        |<span class="sortHeader">Name</span>
        |<span class="sortHeader">Party</span>
        |<span class="sortHeader">Score</span>
        |<div id="moc-list-table-data">
        |<div class="tableRow"><span sort="Doe, Jane">Jane Doe</span><span>D</span><span>95%</span></div>
        |<div class="tableRow"><span sort="Roe, Rich &amp; Co">Rich Roe</span><span>R</span><span>12%</span></div>
        |</div></div></body></html>""".stripMargin
    val out = Seq(page).toDF("html")
      .select(explode(CssExtract.divTable(col("html"),
        containerId = "moc-list-table", headerCls = "sortHeader",
        rowCls = "tableRow", cellTag = "span", keyAttr = "sort")).as("m"))
      .select(element_at(col("m"), "Name"), element_at(col("m"), "Party"),
        element_at(col("m"), "Score"))
      .as[(String, String, String)].collect().toSeq
    // the key comes from the sort ATTRIBUTE (entity-unescaped, like bs4
    // row[0]["sort"]), never the display text; the rest from cell text
    assert(out === Seq(
      ("Doe, Jane", "D", "95%"),
      ("Roe, Rich & Co", "R", "12%")))
  }

  test("mainContent keeps long low-link-density blocks, drops boilerplate") {
    val body = "This is the actual article body with plenty of real text."
    val page =
      s"""<html><body>
         |<p><a href="/a">Home</a> <a href="/b">About</a> <a href="/c">More</a></p>
         |<p>$body</p>
         |<p>ok</p>
         |<p>Another genuine paragraph with a single <a href="/r">reference</a> inside a lot of surrounding prose text.</p>
         |<p>See <a href="/x">more offers</a> and <a href="/y">archived deals</a> here.</p>
         |</body></html>""".stripMargin
    val out = Seq(page).toDF("html")
      .select(CssExtract.mainContent(col("html")).as("t"),
        CssExtract.mainContentBlocks(col("html")).as("blocks"))
      .as[(String, Seq[String])].head()
    // nav (short AND density 13/15), "ok" (short) and the
    // related-links block (density 25/40) drop; the body and the
    // prose-with-one-link block (density 9/103) survive, in document
    // order
    assert(out._2.size === 2)
    assert(out._2.head === body)
    assert(out._2(1).startsWith("Another genuine paragraph"))
    assert(out._1 === out._2.mkString("\n"))
    // a page of pure boilerplate yields an empty main text
    val empty = Seq("""<p><a href="/a">Only links here at all</a></p>""")
      .toDF("html")
      .select(CssExtract.mainContent(col("html")).as("t"))
      .as[String].head()
    assert(empty === "")
    // density boundary is inclusive: exactly 33 link chars of 100
    // (= 0.33) survives, 34 does not
    def densityPage(link: Int) =
      "<p>" + "x" * (100 - link) + "<a>" + "y" * link + "</a></p>"
    val sizes = Seq(densityPage(33), densityPage(34)).toDF("html")
      .select(size(CssExtract.mainContentBlocks(col("html"))).as("n"))
      .as[Int].collect().toSeq
    assert(sizes === Seq(1, 0))
  }
}
