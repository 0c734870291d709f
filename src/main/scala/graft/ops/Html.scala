package graft.ops

/** HTML main-content extraction — the crawl front-end of the training-data
  * pipeline (SURVEY.md §2 pipeline extensions; the step upstream of
  * `text_boilerplate_strip`'s corpus-level line dedup). Text-density block
  * segmentation in the jusText/trafilatura shape, with integer-only
  * heuristics so the keep decision is exactly reproducible in SQL:
  *
  *   1. one linear pass tokenizes the markup (comments, doctype/PI,
  *      raw-text `script`/`style` skipped wholesale, quoted attribute
  *      values honored so `>` inside a quote never ends a tag);
  *   2. text between BLOCK-level tag boundaries accumulates into blocks
  *      with whitespace collapsed and the common entities decoded; inline
  *      tags (`b`, `em`, `span`, …) flow through; `<a>`/`</a>` tracks link
  *      depth so each non-whitespace char is counted as link or plain;
  *   3. a block is KEPT iff its normalized text is ≥ [[Html.MinChars]]
  *      chars AND its link density ≤ [[Html.MaxLinkBp]] basis points
  *      (10000·linkChars/nonWsChars) — nav/footer/sidebar chrome is
  *      link-dense or short, article prose is neither.
  *
  * Per-row JVM kernel (no shuffle, no state): at 100 TB the extraction is
  * scan-bound and embarrassingly parallel — one projection over the raw
  * crawl table, markup never leaves the executor.
  *
  * The parser is deliberately tolerant, not validating: unclosed tags,
  * uppercase tag names, stray `<` in prose ("1 < 2"), attributes
  * containing `>`, and `</p>` bait inside script strings all take the
  * lenient path a real crawl demands (see HtmlSpec for each case).
  */
object Html {

  /** Minimum normalized text length for a block to be main content. */
  val MinChars = 25

  /** Maximum link density (basis points of non-whitespace chars inside
    * `<a>`) for a block to be main content. */
  val MaxLinkBp = 3000

  /** Tags that end the current text block on open OR close. Everything
    * else (`b`, `i`, `em`, `strong`, `span`, `a`, `code`, …) is inline. */
  val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "thead", "tbody", "tr", "td", "th", "article", "section",
    "header", "footer", "nav", "aside", "blockquote", "pre", "br", "hr",
    "body", "html", "head", "title", "form", "main", "figure",
    "figcaption", "dl", "dt", "dd", "address", "fieldset", "noscript")

  /** One segmented text block: `text` is whitespace-normalized (runs
    * collapsed to single spaces, ends trimmed), `nonWs`/`linkNonWs` count
    * non-whitespace chars (total / inside `<a>`), `linkBp` is the integer
    * link density in basis points, `keep` the main-content verdict. */
  final case class Block(
      idx: Int, text: String, nonWs: Int, linkNonWs: Int,
      linkBp: Int, keep: Boolean)

  /** Decode one `&…;` entity at `s(i)` (named amp/lt/gt/quot/apos/nbsp or
    * numeric dec/hex, body ≤ 10 chars); anything unrecognized falls back
    * to a literal `&`. Returns (replacement, chars consumed). */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 11) ("&", 1)
    else {
      val body = s.substring(i + 1, semi)
      val rep = body match {
        case "amp" => "&"
        case "lt" => "<"
        case "gt" => ">"
        case "quot" => "\""
        case "apos" => "'"
        case "nbsp" => " "
        case b if b.length > 1 && (b.charAt(0) == '#') =>
          try {
            val cp =
              if (b.length > 2 && (b.charAt(1) == 'x' || b.charAt(1) == 'X'))
                Integer.parseInt(b.substring(2), 16)
              else Integer.parseInt(b.substring(1))
            if (cp >= 0 && cp <= 0xffff) String.valueOf(cp.toChar) else null
          } catch { case _: NumberFormatException => null }
        case _ => null
      }
      if (rep == null) ("&", 1) else (rep, semi - i + 1)
    }
  }

  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    var i = math.max(from, 0)
    val n = s.length - target.length
    while (i <= n) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  /** Segment `html` into text blocks (step 1+2 of the header algorithm).
    * Empty blocks (adjacent boundaries) are not emitted. Null-safe. */
  def blocks(html: String): Vector[Block] = {
    if (html == null) return Vector.empty
    val out = Vector.newBuilder[Block]
    val sb = new StringBuilder
    var nonWs = 0
    var linkNonWs = 0
    var pendingSpace = false
    var aDepth = 0
    var blockIdx = 0

    def appendChar(c: Char): Unit =
      if (c.isWhitespace || c == '\u00a0') pendingSpace = true
      else {
        if (pendingSpace && sb.nonEmpty) sb.append(' ')
        pendingSpace = false
        sb.append(c)
        nonWs += 1
        if (aDepth > 0) linkNonWs += 1
      }

    def flush(): Unit = {
      if (sb.nonEmpty) {
        val t = sb.toString
        val bp = if (nonWs == 0) 0 else (10000L * linkNonWs / nonWs).toInt
        out += Block(blockIdx, t, nonWs, linkNonWs, bp,
          t.length >= MinChars && bp <= MaxLinkBp)
        blockIdx += 1
      }
      sb.clear(); nonWs = 0; linkNonWs = 0; pendingSpace = false
    }

    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val d = html.charAt(i + 1)
        if (d == '!') {
          if (html.startsWith("<!--", i)) { // comment (may contain fake tags)
            val e = html.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else { // <!DOCTYPE …>
            val e = html.indexOf('>', i)
            i = if (e < 0) n else e + 1
          }
        } else if (d == '?') { // processing instruction
          val e = html.indexOf('>', i)
          i = if (e < 0) n else e + 1
        } else if (d == '/' || d.isLetter) {
          val closing = d == '/'
          var j = i + (if (closing) 2 else 1)
          val t0 = j
          while (j < n && html.charAt(j).isLetterOrDigit) j += 1
          val name = html.substring(t0, j).toLowerCase
          if (name.isEmpty) { appendChar('<'); i += 1 } // "</>" / "< x": stray
          else {
            // to tag end; a quoted attribute value may contain '>', and a
            // '/' inside an UNQUOTED value (<a href=/about/>) is part of
            // the value — not a self-close marker (HTML5 tokenizer rules)
            var q: Char = 0
            var expectValue = false
            var inUnquoted = false
            while (j < n && (q != 0 || html.charAt(j) != '>')) {
              val cj = html.charAt(j)
              if (q != 0) { if (cj == q) q = 0 }
              else if (expectValue && !cj.isWhitespace) {
                if (cj == '"' || cj == '\'') q = cj else inUnquoted = true
                expectValue = false
              }
              else if (cj == '=' && !inUnquoted) expectValue = true
              else if (cj.isWhitespace) inUnquoted = false
              else if ((cj == '"' || cj == '\'') && !inUnquoted) q = cj
              j += 1
            }
            val selfClose =
              j > t0 && j < n && html.charAt(j - 1) == '/' && !inUnquoted
            i = if (j < n) j + 1 else n
            if (!closing && (name == "script" || name == "style")) {
              // raw-text element: nothing inside is markup or content —
              // "</p>" bait in a JS string must not end a block. selfClose
              // is deliberately IGNORED here: per the HTML5 tokenizer a
              // solidus on a raw-text start tag (`<script src="x" />`,
              // XHTML style, common in crawls) still opens the element,
              // so the scan runs to the matching close tag — honoring the
              // marker would leak the script body into extracted text.
              val close = "</" + name
              val e = indexOfIgnoreCase(html, close, i)
              if (e < 0) i = n
              else {
                var k = e + close.length
                while (k < n && html.charAt(k) != '>') k += 1
                i = if (k < n) k + 1 else n
              }
              flush()
            } else if (name == "a") {
              if (closing) aDepth = math.max(0, aDepth - 1)
              else if (!selfClose) aDepth += 1
            } else if (BlockTags(name)) flush()
            // other inline tags: text flows through
          }
        } else { appendChar('<'); i += 1 } // "1 < 2" in prose
      } else if (c == '&') {
        val (rep, adv) = decodeEntity(html, i)
        var k = 0
        while (k < rep.length) { appendChar(rep.charAt(k)); k += 1 }
        i += adv
      } else { appendChar(c); i += 1 }
    }
    flush()
    out.result()
  }

  /** Step 3: kept blocks' text joined by newlines — the document's main
    * content as the downstream pipeline (quality scoring, dedup,
    * tokenization) consumes it. */
  def extract(html: String): String =
    blocks(html).iterator.filter(_.keep).map(_.text).mkString("\n")

  /** (block count, kept block texts) — the per-page parse result BOTH the
    * batch crawl cascade and the streaming front-end consume; one shared
    * kernel so the two gates (which share one oracle) cannot silently
    * diverge on the keep rule. */
  def parseStats(html: String): (Int, Seq[String]) = {
    val bs = blocks(html)
    (bs.size, bs.filter(_.keep).map(_.text))
  }

  /** Minimal escape so arbitrary text survives the markup roundtrip
    * (decode ∘ escape = identity on the three specials). */
  def escapeText(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Deterministic page synthesis for the SF-coupled gate
    * (`text_html_extract`): the document's 10-token chunks each become a
    * `<p>` inside a chrome of title/nav/aside/footer boilerplate plus a
    * script carrying tag-soup traps (`1 < 2`, a `"</p>"` string). Every
    * chrome block is dropped by construction — title/nav/li by length,
    * the footer specifically by link DENSITY (33 chars ≥ MinChars but
    * 4285 bp > MaxLinkBp) — so the expected extraction is exactly the
    * ≥ 25-char chunks, and the DuckDB oracle replays this generative
    * contract in pure SQL (chunking + length filter) with no frozen
    * fixture: block count = 6 chrome blocks + nonempty chunks. Chunking
    * splits on single spaces to match the oracle's `string_split`.
    *
    * SINGLE-SPACE INVARIANT: the contract only holds for text whose
    * tokens are separated by exactly one space with no tabs/newlines and
    * no leading/trailing space — the parser collapses whitespace runs and
    * trims block edges, while the oracle's `string_split`/`len` see the
    * raw string, so any other whitespace would make the two sides diverge.
    * Enforced here so a future fixture regeneration fails with a clear
    * message instead of a bare md5 mismatch (both SFs verified clean). */
  def wrapDocument(text: String): String = {
    require(text == null || (!text.contains("  ") &&
        !text.exists(c => c == '\t' || c == '\n' || c == '\r') &&
        !text.startsWith(" ") && !text.endsWith(" ")),
      "wrapDocument generative contract requires single-space-separated " +
        "tokens (no whitespace runs/tabs/newlines/edge spaces); got: " +
        text.take(80))
    val toks = if (text == null) Array("") else text.split(" ", -1)
    val paras = toks.grouped(10)
      .map(g => s"<p>${escapeText(g.mkString(" "))}</p>").mkString
    PageHead + paras + PageTail
  }

  /** [[wrapDocument]]'s fixed chrome, split at the `<article>` paragraph
    * insertion point and exposed so the `q_source_warc` oracle can
    * reconstruct the page generatively in SQL (the strings interpolate
    * into a single-quoted SQL literal — they must never contain `'`). */
  val PageHead: String =
    "<!DOCTYPE html><html><head><title>Synthetic Page</title>" +
      "<script type=\"text/javascript\">var n = 1 < 2; var bait = \"</p>\";</script>" +
      "<style>.nav a { color: #00f; }</style></head><body>" +
      "<!-- chrome below must be dropped by length or link density -->" +
      "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
      "<a href=\"/contact\">Contact</a></nav><article>"
  val PageTail: String =
    "</article><aside><ul><li><a href=\"/r1\">Related article one</a></li>" +
      "<li><a href=\"/r2\">Related article two</a></li>" +
      "<li><a href=\"/r3\">More related</a></li></ul></aside>" +
      "<footer><a href=\"/terms\">Terms</a> <a href=\"/privacy\">Privacy</a>" +
      " &#169; 2026 Example Corp</footer></body></html>"
}
