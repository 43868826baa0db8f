package graft.corpus

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL analysis for web-corpus pipelines: host/path extraction, registrable
 * domain, and canonicalization — the key ingredients of URL-level dedup and
 * per-domain quality/mixing decisions in a training-data build.
 *
 * Everything is regexp built-ins over the Java∩RE2 common subset (no
 * alternation — Java resolves it leftmost-first, RE2 leftmost-longest — no
 * lookarounds), so a DuckDB oracle reproduces every extraction
 * byte-for-byte, and the whole operator is a codegen'd pure projection:
 * zero shuffles at any corpus size.
 */
object Urls {

  /** scheme://AUTHORITY — userinfo@host:port up to the first `/ ? #`.
    * Scheme class is case-insensitive ([A-Za-z]): RFC 3986 schemes are, and
    * [[canonicalize]] lowercases before its scheme strip — a lowercase-only
    * class here would send `HTTPS://x.com` to the empty-domain bucket while
    * canonicalize handled it fine. */
  val hostPattern: String = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"

  /** scheme://host PATH — path = from the first `/` up to `? #`. */
  val pathPattern: String = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Last two dot-labels of the host — the registrable domain under
    * single-label public suffixes (com/org/net/…). A full public-suffix
    * list is a broadcast lookup table at scale; the regex is the
    * suffix-free core. */
  val registrableDomainPattern: String = "([A-Za-z0-9-]+\\.[A-Za-z]+)$"

  /** `[?&]utm_xxx=` — tracking-parameter marker (no alternation). */
  val trackingParamPattern: String = "[?&]utm_[a-z]+="

  /** The HOST alone: authority minus a leading `userinfo@` and a trailing
    * `:port` — without the strip, any ported/credentialed crawl URL would
    * fail [[registrableDomain]] and collapse into one empty-domain
    * bucket. */
  def host(url: Column): Column =
    regexp_replace(
      regexp_replace(regexp_extract(url, hostPattern, 1), "^[^@/]*@", ""),
      ":[0-9]+$", "")

  def path(url: Column): Column = regexp_extract(url, pathPattern, 1)

  def registrableDomain(hostCol: Column): Column =
    regexp_extract(hostCol, registrableDomainPattern, 1)

  def hasTracking(url: Column): Column =
    TextAnalysis.matchCount(url, trackingParamPattern) > 0

  /** Canonical form for URL-level dedup: lowercase; drop scheme, query
    * string, fragment, a leading `userinfo@`, a `:port` on the
    * authority, a leading `www.`, and any trailing slash run. The
    * userinfo/port strip mirrors [[host]] — without it,
    * `https://example.com:443/p` and `https://user@example.com/p`
    * survive URL dedup as distinct keys for the same page, the exact
    * failure the host() strip was added to prevent for domain
    * bucketing. The query string is dropped WHOLESALE (not just
    * utm_*) — the standard aggressive policy for crawl dedup; callers
    * needing param-preserving canonicalization filter before this step.
    * Each regex has a single parse (no alternation), so Java and RE2
    * agree on every byte; the port strip's anchored `[^/:]` class keeps
    * it off path segments. */
  def canonicalize(url: Column): Column = {
    val noScheme = regexp_replace(lower(url), "^[a-z][a-z0-9+.-]*://", "")
    val noFragment = regexp_replace(noScheme, "#.*", "")
    val noQuery = regexp_replace(noFragment, "\\?.*", "")
    val noUser = regexp_replace(noQuery, "^[^@/]*@", "")
    val noPort = regexp_replace(noUser, "^([^/:]+):[0-9]+", "$1")
    val noWww = regexp_replace(noPort, "^www\\.", "")
    regexp_replace(noWww, "/+$", "")
  }
}
