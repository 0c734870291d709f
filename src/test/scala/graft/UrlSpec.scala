package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Url

/** [[graft.ops.Url]] — hand-built canonicalization expectations,
  * independent of the catalog gate's generative contract. */
class UrlSpec extends AnyFunSuite {

  test("scheme/host lowercase, www strip, default port strip") {
    assert(Url.canonicalize("HTTPS://WWW.Example.COM:443/A/B")
      == "https://example.com/A/B") // path case preserved
    assert(Url.canonicalize("HTTP://example.com:80/x")
      == "http://example.com/x")
    assert(Url.canonicalize("http://example.com:8080/x")
      == "http://example.com:8080/x") // non-default port survives
    assert(Url.canonicalize("https://example.com:80/x")
      == "https://example.com:80/x") // :80 is NOT https' default
  }

  test("fragment drops; tracking params drop; survivors sort") {
    assert(Url.canonicalize("https://a.io/p?utm_source=x&b=2&a=1&gclid=g#frag")
      == "https://a.io/p?a=1&b=2")
    assert(Url.canonicalize("https://a.io/p?utm_campaign=c&fbclid=f&ref=r")
      == "https://a.io/p")
    assert(Url.canonicalize("https://a.io/p#only-fragment")
      == "https://a.io/p")
  }

  test("slash runs collapse; trailing slash strips; root normalizes") {
    assert(Url.canonicalize("https://a.io//x///y/") == "https://a.io/x/y")
    assert(Url.canonicalize("https://a.io/") == "https://a.io/")
    assert(Url.canonicalize("https://a.io") == "https://a.io/")
  }

  test("junk without :// passes through; null-safe") {
    assert(Url.canonicalize("not a url") == "not a url")
    assert(Url.canonicalize(null) == null)
  }

  test("the three synthesis variants honor the oracle's contract") {
    // variant 1 (messy) canonicalizes exactly onto variant 0 (clean);
    // variant 2 keeps its sorted surviving params — a DIFFERENT url
    val v0 = graft.catalog.UrlQueries.messyUrl(5L)
    val v1 = graft.catalog.UrlQueries.messyUrl(205L)
    val v2 = graft.catalog.UrlQueries.messyUrl(405L)
    assert(Url.canonicalize(v0) == v0)
    assert(Url.canonicalize(v1) == v0)
    assert(Url.canonicalize(v2) == v0 + "?a=1&b=2")
  }
}
