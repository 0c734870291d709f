package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Html, HtmlFixtures}

/** [[graft.ops.Html]] — hand-built expectations (independent of the frozen
  * soup fixture, which is generated through the same parser): a full page
  * with every pathology and its exact expected extraction, then one case
  * per parser behavior, then the wrapDocument generative contract the
  * `text_html_extract` oracle replays in SQL. */
class HtmlSpec extends AnyFunSuite {

  test("hand-built page extracts exactly the prose blocks") {
    val page =
      """<!DOCTYPE html>
        |<html><head><title>My Test Page</title>
        |<script>var x = 1 < 2; var s = "</p>bait";</script>
        |<style>p > a { color: blue; }</style>
        |</head>
        |<body>
        |<!-- <p>ghost</p> -->
        |<nav><a href="/">Home</a> <a href="/about">About us</a></nav>
        |<h1>Deep dive into stream processing</h1>
        |<P CLASS="lead">This opening paragraph has enough characters to be kept as main content.</P>
        |<p>Numbers like 1 < 2 and entities like &amp; and &#8212; survive, with a <a href="/x">small link</a> inside a long paragraph of prose text.</p>
        |<div data-q="a>b">Attribute traps such as quoted > do not end the tag; this block is long enough to keep.</div>
        |<p>short one</p>
        |<ul><li><a href="/r1">Related one</a></li><li><a href="/r2">Related two</a></li></ul>
        |<footer><a href="/t">Terms</a> <a href="/p">Privacy</a> &#169; 2026 Corp</footer>
        |</body></html>""".stripMargin
    val expected = Seq(
      "Deep dive into stream processing",
      "This opening paragraph has enough characters to be kept as main content.",
      "Numbers like 1 < 2 and entities like & and — survive, with a " +
        "small link inside a long paragraph of prose text.",
      "Attribute traps such as quoted > do not end the tag; this block " +
        "is long enough to keep.").mkString("\n")
    assert(Html.extract(page) == expected)
    val bs = Html.blocks(page)
    // title, nav, h1, lead P, trap p, trap div, short p, 2 li, footer
    assert(bs.size == 10)
    assert(bs.count(_.keep) == 4)
    // the footer is EXACTLY MinChars long ("Terms Privacy © 2026 Corp" =
    // 25) so only the density rule drops it — both rules carry weight
    val footer = bs.last
    assert(footer.text == "Terms Privacy © 2026 Corp")
    assert(footer.text.length == Html.MinChars)
    assert(footer.linkBp > Html.MaxLinkBp && !footer.keep)
    // nav is pure-link: density 100%
    assert(bs(1).text == "Home About us" && bs(1).linkBp == 10000)
  }

  test("script/style are skipped wholesale, including </p> bait and uppercase") {
    val h = "<p>before</p><SCRIPT>var s = \"</p><p>ghost\";</SCRIPT>" +
      "<p>after paragraph text long enough to keep</p>" +
      "<style>p { x: 1 } /* </p> */</style>"
    val bs = Html.blocks(h)
    assert(bs.map(_.text) == Vector(
      "before", "after paragraph text long enough to keep"))
  }

  test("self-close marker on script/style still opens the raw-text mode") {
    // HTML5: the solidus on <script src="x" /> is ignored — the element
    // opens and everything to </script> is raw text, so the JS body must
    // NOT leak into extracted blocks (XHTML-style markup is common in
    // real crawls). Same for <style/>.
    val h = "<p>before paragraph text long enough to keep</p>" +
      "<script src=\"x.js\" />var leaked = \"this is not content\";</script>" +
      "<style />p { color: red } .leak { z: 1 }</style>" +
      "<p>after paragraph text long enough to keep</p>"
    assert(Html.blocks(h).map(_.text) == Vector(
      "before paragraph text long enough to keep",
      "after paragraph text long enough to keep"))
  }

  test("unclosed <p> flushes at the next block tag") {
    val bs = Html.blocks(
      "<p>first paragraph never closed but long enough to keep" +
        "<p>second paragraph also long enough to be kept fine</p>")
    assert(bs.map(_.keep) == Vector(true, true))
    assert(bs(0).text.startsWith("first") && bs(1).text.startsWith("second"))
  }

  test("<br> splits a block; nbsp runs collapse; whitespace normalizes") {
    assert(Html.blocks("<p>alpha  beta<br>gamma\n\tdelta</p>")
      .map(_.text) == Vector("alpha beta", "gamma delta"))
    assert(Html.blocks("<p>a&nbsp;&nbsp;b</p>").head.text == "a b")
    assert(Html.blocks("<p>  padded  text  </p>").head.text == "padded text")
  }

  test("comments hide fake tags; doctype and PIs are ignored") {
    val bs = Html.blocks(
      "<?xml version=\"1.0\"?><!DOCTYPE html><!-- <p>ghost</p> -->" +
        "<p>real paragraph long enough to keep around</p>")
    assert(bs.map(_.text) == Vector("real paragraph long enough to keep around"))
  }

  test("entity decoding: named, decimal, hex, unknown falls back to literal") {
    val t = Html.blocks("<p>&amp; &lt; &gt; &quot; &apos; &#65; &#x42; &bogus; &</p>")
      .head.text
    assert(t == "& < > \" ' A B &bogus; &")
  }

  test("link density boundary sits exactly at MaxLinkBp") {
    def page(plain: Int, link: Int): String =
      s"<p>${"x" * plain} <a>${"y" * link}</a></p>"
    assert(Html.blocks(page(70, 30)).head.linkBp == 3000)
    assert(Html.blocks(page(70, 30)).head.keep)
    assert(Html.blocks(page(69, 31)).head.linkBp == 3100)
    assert(!Html.blocks(page(69, 31)).head.keep)
  }

  test("min length boundary sits exactly at MinChars") {
    assert(Html.blocks(s"<p>${"a" * 25}</p>").head.keep)
    assert(!Html.blocks(s"<p>${"a" * 24}</p>").head.keep)
  }

  test("unquoted attribute values ending in '/' are not self-closing (HTML5)") {
    // real crawls write <a href=/about/> unquoted: the '/' is part of the
    // VALUE, so the anchor must OPEN and its text must count as link chars
    // — a self-close misparse here keeps link-dense nav as main content
    val nav = "<nav><a href=/>Home</a> <a href=/about/>About us</a> " +
      "<a href=/contact/>Contact page</a></nav>"
    val b = Html.blocks(nav).head
    assert(b.text == "Home About us Contact page")
    assert(b.linkBp == 10000 && !b.keep)
    // genuinely self-closed forms still work
    assert(Html.blocks("<p>alpha beta<br/>gamma delta</p>").map(_.text)
      == Vector("alpha beta", "gamma delta"))
    // a '/' inside a QUOTED value before '>' is not self-closing either,
    // and a true <a/> self-close opens no link context
    assert(Html.blocks(s"<p>${"x" * 30} <a/>${"y" * 30}</p>").head.linkBp == 0)
    assert(Html.blocks(s"""<p>${"x" * 30} <a href="/y/">${"y" * 10}</a></p>""")
      .head.linkNonWs == 10)
  }

  test("stray < in prose and trailing < are literal text") {
    assert(Html.blocks("<p>1 < 2 and x <3 end<</p>").head.text
      == "1 < 2 and x <3 end<")
  }

  test("wrapDocument honors the generative contract the SQL oracle replays") {
    // 25 four-char tokens: two full 10-token chunks (49 chars, kept) and
    // a 5-token tail (24 chars — one below MinChars, dropped)
    val text = Seq.fill(25)("word").mkString(" ")
    val (nBlocks, nKept, nChars, main) =
      graft.catalog.HtmlQueries.extractStats(Html.wrapDocument(text))
    val chunk = Seq.fill(10)("word").mkString(" ")
    assert(main == s"$chunk\n$chunk")
    assert(nBlocks == 6 + 3) // title, nav, 3 aside li, footer + 3 chunks
    assert(nKept == 2)
    assert(nChars == 2 * 49 + 1)
    // specials survive the escape → parse roundtrip
    val tricky = "alpha & beta < gamma > delta epsilon zeta eta"
    assert(Html.extract(Html.wrapDocument(tricky)).contains(tricky))
    // empty text: chrome only, nothing kept
    assert(graft.catalog.HtmlQueries.extractStats(Html.wrapDocument(""))
      == ((6, 0, 0, "")))
  }

  test("crawl cascade strips cross-doc hot chunks and verdicts correctly") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val boiler = "shared boilerplate chunk appearing on many pages"
    def uniq(i: Int) = s"unique prose chunk number $i with enough characters"
    // pages 0-3: the shared chunk (df=5 >= 3, stripped everywhere) + two
    // unique prose chunks each; page 4: the shared chunk + a too-short one
    // — after the strip it has NOTHING left and must be verdict-dropped
    val pages = ((0 until 4).map(i =>
      (i.toLong, s"<p>$boiler</p><p>${uniq(i)}</p><p>${uniq(i + 10)}</p>")) :+
      (4L, s"<p>$boiler</p><p>tiny</p>"))
      .toDF("doc_id", "page")
    val out = graft.catalog.HtmlQueries.crawlFrom(pages)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5)))
      .toMap
    for (i <- 0L until 4L) {
      val (nBlocks, nKept, nAfter, md5v, keep) = out(i)
      assert(nBlocks == 3 && nKept == 3 && nAfter == 2 && keep == 1L)
      assert(md5v == java.security.MessageDigest.getInstance("MD5")
        .digest(s"${uniq(i.toInt)}\n${uniq(i.toInt + 10)}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    }
    val (b4, k4, a4, m4, keep4) = out(4L)
    assert(b4 == 2 && k4 == 1 && a4 == 0 && keep4 == 0L)
    assert(m4 == "d41d8cd98f00b204e9800998ecf8427e") // md5("")
  }

  test("soup corpus: every page keeps some prose and drops all chrome links") {
    for ((id, html) <- HtmlFixtures.corpus) {
      val bs = Html.blocks(html)
      val kept = bs.filter(_.keep)
      assert(kept.nonEmpty, s"page $id extracted nothing")
      // chrome traps must never leak into kept text
      val main = kept.map(_.text).mkString("\n")
      assert(!main.contains("ghost"), s"page $id leaked comment/script bait")
      assert(!main.contains("document.write"), s"page $id leaked script")
      assert(!main.contains("margin: 0"), s"page $id leaked style")
      assert(!main.contains("Privacy"), s"page $id kept the footer")
      // determinism: regeneration is bit-identical
      assert(html == HtmlFixtures.makePage(id.toInt))
    }
  }
}
