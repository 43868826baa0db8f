package graft

import graft.corpus.{TextAnalysis, Urls}
import org.apache.spark.sql.functions._

/** Known-vector tests for the crawl-side text operators: HTML stripping
  * and URL canonicalization (graft.corpus.Urls). */
class UrlsHtmlSpec extends SparkTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.cast("string")).head().getString(0)

  test("stripHtml: tags out, entities decoded, whitespace collapsed") {
    val html = """<html><body><p>a</p><p>b&nbsp;&amp;&nbsp;c</p>""" +
      """<div class="x">&lt;tag&gt; &quot;q&quot; &#39;s&#39;</div></body></html>"""
    val got = one(TextAnalysis.stripHtml(lit(html)))
    assert(got == "a b & c <tag> \"q\" 's'")
  }

  test("stripHtml: double-encoded &amp;lt; decodes exactly one level") {
    assert(one(TextAnalysis.stripHtml(lit("x &amp;lt; y"))) == "x &lt; y")
  }

  test("markupRatio: tag bytes over total bytes") {
    // "<b>" + "aa" + "</b>" = 3 + 2 + 4 tag/text bytes → 7/9 markup
    assert(one(TextAnalysis.markupRatio(lit("<b>aa</b>"))).toDouble
      == math.round(7.0 / 9.0 * 1e6) / 1e6)
  }

  test("url host / domain / path extraction") {
    val u = lit("https://www.sub.example.com/a/b?q=1#f")
    assert(one(Urls.host(u)) == "www.sub.example.com")
    assert(one(Urls.registrableDomain(Urls.host(u))) == "example.com")
    assert(one(Urls.path(u)) == "/a/b")
  }

  test("host/path accept uppercase schemes like canonicalize does") {
    // schemes are case-insensitive (RFC 3986); a lowercase-only pattern
    // would send HTTPS:// URLs to the empty-domain bucket while
    // canonicalize (which lowercases first) handled them fine
    val u = lit("HTTPS://Example.com/x?q=1")
    assert(one(Urls.host(u)) == "Example.com")
    assert(one(Urls.registrableDomain(Urls.host(u))) == "Example.com")
    assert(one(Urls.path(u)) == "/x")
  }

  test("host strips userinfo and port so the domain still resolves") {
    val u = lit("https://alice:pw@shop.example.org:8443/cart")
    assert(one(Urls.host(u)) == "shop.example.org")
    assert(one(Urls.registrableDomain(Urls.host(u))) == "example.org")
    // port-only and plain hosts unaffected
    assert(one(Urls.host(lit("http://example.com:80/"))) == "example.com")
    assert(one(Urls.host(lit("http://example.com/"))) == "example.com")
  }

  test("canonicalize: scheme, www, query, fragment, trailing slash all drop") {
    assert(one(Urls.canonicalize(
      lit("HTTPS://WWW.Example.COM/Path/?utm_source=x&a=1#frag"))) ==
      "example.com/path")
    // path-less URL and bare host agree
    assert(one(Urls.canonicalize(lit("http://example.com/"))) == "example.com")
    assert(one(Urls.canonicalize(lit("http://example.com"))) == "example.com")
    // www. strips only as a PREFIX label
    assert(one(Urls.canonicalize(lit("http://wwwx.com/p"))) == "wwwx.com/p")
  }

  test("canonicalize strips userinfo and port like host() — one page, one key") {
    // the three spellings of the same page must collapse to ONE dedup key
    assert(one(Urls.canonicalize(lit("https://example.com:443/page"))) ==
      "example.com/page")
    assert(one(Urls.canonicalize(lit("https://user@example.com/page"))) ==
      "example.com/page")
    assert(one(Urls.canonicalize(lit("https://user@www.example.com:8080/page"))) ==
      "example.com/page")
    // a colon-bearing PATH segment is not a port
    assert(one(Urls.canonicalize(lit("http://a.com/x:8080/y"))) == "a.com/x:8080/y")
  }

  test("hasTracking flags utm params only") {
    assert(one(Urls.hasTracking(lit("http://a.com/p?utm_source=x"))) == "true")
    assert(one(Urls.hasTracking(lit("http://a.com/p?id=utm_source"))) == "false")
  }

  test("tokenSegments: order-preserving fixed windows with a short tail") {
    import spark.implicits._
    val got = Seq("a b c d e f g h i j", "a b", "", "   ")
      .toDF("t").select(TextAnalysis.tokenSegments(col("t"), 4).as("s"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b c d", "e f g h", "i j"))
    assert(got(1) == Seq("a b"))
    assert(got(2) == Seq.empty && got(3) == Seq.empty)
  }
}
