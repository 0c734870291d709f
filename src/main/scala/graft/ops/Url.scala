package graft.ops

/** URL canonicalization — stage 0 of a crawl pipeline, BEFORE any text
  * flows: the same page is crawled under scheme/host case variants,
  * default ports, tracking parameters, reordered query strings, fragments
  * and slash noise, and URL-level exact dedup over the canonical form is
  * the cheapest dedup any corpus runs (it drops refetches without ever
  * touching content). Deterministic, integer/string-only rules so the
  * whole transform is exactly replayable:
  *
  *   - scheme and host lowercase; a leading `www.` strips;
  *   - the scheme's default port strips (`:80` http, `:443` https);
  *   - the fragment (`#…`) drops entirely;
  *   - tracking parameters drop (`utm_*`, `gclid`, `fbclid`, `ref`);
  *     survivors sort lexicographically by their full `k=v` text;
  *   - runs of `/` in the path collapse; one trailing slash strips
  *     (the root path stays `/` — an empty path becomes `/`).
  *
  * Per-row JVM kernel: zero shuffle, no state — at 100 TB the
  * canonicalization rides the scan, and the dedup after it is one
  * group-by-canonical aggregation. Lenient by design (a crawl list is
  * full of junk): anything without `://` returns unchanged.
  */
object Url {

  private val dropParam = (k: String) =>
    k.startsWith("utm_") || k == "gclid" || k == "fbclid" || k == "ref"

  def canonicalize(url: String): String = {
    if (url == null) return null
    val sep = url.indexOf("://")
    if (sep < 0) return url
    val scheme = url.substring(0, sep).toLowerCase
    val rest = url.substring(sep + 3)
    // authority ends at the first '/', '?' or '#'
    var a = 0
    while (a < rest.length && rest.charAt(a) != '/' && rest.charAt(a) != '?' &&
      rest.charAt(a) != '#') a += 1
    var host = rest.substring(0, a).toLowerCase
    if (host.startsWith("www.")) host = host.substring(4)
    val defPort = if (scheme == "https") ":443" else if (scheme == "http") ":80" else ""
    if (defPort.nonEmpty && host.endsWith(defPort))
      host = host.substring(0, host.length - defPort.length)
    // split the remainder into path / query / fragment(dropped)
    val tail0 = rest.substring(a)
    val hashAt = tail0.indexOf('#')
    val tail = if (hashAt < 0) tail0 else tail0.substring(0, hashAt)
    val qAt = tail.indexOf('?')
    val rawPath = if (qAt < 0) tail else tail.substring(0, qAt)
    val rawQuery = if (qAt < 0) "" else tail.substring(qAt + 1)
    // collapse slash runs, strip one trailing slash (root stays "/")
    val collapsed = rawPath.replaceAll("/{2,}", "/")
    val path0 = if (collapsed.isEmpty) "/" else collapsed
    val path =
      if (path0.length > 1 && path0.endsWith("/")) path0.dropRight(1) else path0
    val params = rawQuery.split("&").toSeq.filter(_.nonEmpty)
      .filterNot(p => dropParam(p.takeWhile(_ != '=')))
      .sorted
    val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
    s"$scheme://$host$path$query"
  }
}
