package graft.ops

/** Deterministic adversarial HTML pages for the `text_html_extract_soup`
  * gate — the markup analogue of [[graft.embed.MultimodalFixtures]]: no
  * HTML ships in /root/testdata, so the tag-soup surface is exercised on
  * generated pages whose expected extraction is frozen once by
  * `graft.tools.GenOracleFixtures` (through the same [[Html.extract]] the
  * catalog entry runs) and staleness-gated in FixtureOracleSpec. Each page
  * mixes real prose with crawl pathologies: nav/sidebar/footer chrome,
  * scripts holding `</p>` bait and unquoted `<`, comments wrapping fake
  * tags, uppercase tags, unclosed `<p>`, attributes containing `>`, nbsp
  * runs, entities, stray `<` in prose, and `<br>` splits. Pages are
  * bit-reproducible (LCG-seeded) — do not "simplify" the generator
  * without regenerating the frozen fixture. */
object HtmlFixtures {

  /** Same multiplier/increment as java.util.SplittableRandom's mix —
    * public constants; any fixed LCG works, determinism is the point. */
  private final class Lcg(seed0: Long) {
    private var s: Long = seed0 * 0x9e3779b97f4a7c15L + 1
    def next(n: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % n).toInt + n) % n
    }
  }

  private val vocab = Vector(
    "data", "value", "table", "stream", "merge", "index", "shard", "token",
    "model", "batch", "quorum", "vector", "filter", "facet", "layer",
    "weight", "corpus", "sample", "window", "bucket", "digest", "anchor",
    "margin", "signal", "cursor", "ledger", "pivot", "prism", "raster",
    "tensor", "column", "kernel", "region", "schema", "buffer", "offset")

  private def words(rng: Lcg, k: Int): String =
    (0 until k).map(_ => vocab(rng.next(vocab.size))).mkString(" ")

  /** Page `idx`: deterministic tag soup. Structure varies with idx so the
    * 24-page corpus covers every pathology; content varies with the LCG. */
  def makePage(idx: Int): String = {
    val rng = new Lcg(idx.toLong * 1000003L + 17)
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html>\n<HTML><head>\n")
    sb.append(s"<title>Page $idx — ${words(rng, 2)}</title>\n")
    sb.append("<script>\nvar a = 1 < 2; var bait = \"</p><p>ghost\";\n")
    sb.append("if (a < 3 && a > 0) { document.write('<div>js</div>'); }\n")
    sb.append("</script>\n")
    sb.append("<style>\np { margin: 0; } /* a < b */\n.nav > li { color: red; }\n</style>\n")
    sb.append("</head>\n<body>\n")
    sb.append("<!-- navigation chrome: <p>ghost paragraph inside comment</p> -->\n")
    sb.append("<nav><ul>")
    for (k <- 0 until 4 + idx % 3)
      sb.append(s"""<li><a href="/s/$k">${words(rng, 1 + rng.next(2))}</a></li>""")
    sb.append("</ul></nav>\n")
    sb.append(s"<header><h1>${words(rng, 2 + rng.next(3))}</h1></header>\n")
    sb.append("<article>\n")
    val nParas = 3 + idx % 4
    for (p <- 0 until nParas) {
      val tagOpen =
        if (idx % 3 == 0 && p == 0) "<P CLASS=\"lead\">" // uppercase tag+attr
        else if (idx % 5 == 0 && p == 1) "<div data-x=\"a>b\"><p>" // '>' in quote
        else "<p>"
      sb.append(tagOpen)
      sb.append(words(rng, 14 + rng.next(20)))
      if (p == 0) // inline link inside prose: low density, block must be KEPT
        sb.append(s""" <a href="/ref">${words(rng, 2)}</a> ${words(rng, 6)}""")
      if (p == 1 && idx % 2 == 0) // stray '<' and entities in prose
        sb.append(s" because ${1 + rng.next(5)} < ${6 + rng.next(5)} &amp; ${words(rng, 4)} &#8212; ${words(rng, 3)}")
      if (p == 2 && idx % 4 == 1) // nbsp run collapses to one space
        sb.append(s" tail&nbsp;&nbsp;&nbsp;${words(rng, 5)}")
      if (p == nParas - 1 && idx % 4 == 2) // <br> splits the block
        sb.append(s"<br>${words(rng, 8 + rng.next(6))}")
      if (idx % 4 == 3 && p == 0) () // unclosed <p>: next <p> flushes
      else sb.append("</p>")
      sb.append("\n")
    }
    sb.append(s"<p>${words(rng, 1 + rng.next(2))}</p>\n") // short teaser: dropped
    sb.append("</article>\n")
    sb.append("<aside><div class=\"related\">")
    for (k <- 0 until 3)
      sb.append(s"""<a href="/r/$k">${words(rng, 2)}</a> · """)
    sb.append("</div></aside>\n")
    sb.append("<footer><a href=\"/terms\">Terms</a> <a href=\"/privacy\">Privacy</a>")
    sb.append(s" &#169; 2026 ${words(rng, 1)} corp</footer>\n")
    sb.append("</body></HTML>\n")
    sb.toString
  }

  val NPages = 24

  /** The soup corpus the catalog entry, the fixture generator, and the
    * staleness spec all share — one definition, like the multimodal
    * corpora, so the live Spark side cannot silently diverge from the
    * frozen oracle rows. */
  def corpus: Seq[(Long, String)] =
    (0 until NPages).map(i => (i.toLong, makePage(i)))
}
