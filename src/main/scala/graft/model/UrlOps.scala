package graft.model

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** URL canonicalization + hashing (F13; reference: fess-crawler's
  * getDuplicateUrl trailing-slash handling, ScrapingTransformer.java:648-650).
  *
  * Canonical form: lowercase scheme + host, default port stripped,
  * `#fragment` stripped, trailing slashes stripped (so `http://h/` ==
  * `http://h`). Implemented twice on purpose:
  *   - `canonicalize`/`urlHash`: pure Scala, used by the in-memory Oracle
  *     and driver-side code;
  *   - `canonicalizeCol`/`urlHashCol`: Catalyst built-ins only (regexp /
  *     lower / xxhash64) so the hot crawl path stays inside whole-stage
  *     codegen — no UDF (SURVEY.md §7.4).
  * A property test asserts the two agree on generated URLs.
  */
object UrlOps {

  /** Pure-Scala canonicalization — single pass, no regex (the hot-path
    * profile showed the regex formulation dominating the frontier round's
    * CPU). This ONE implementation serves the driver, the parity Oracle and
    * the Catalyst expression ([[CanonicalizeUrl]]), so the twins agree by
    * construction.
    */
  def canonicalize(raw: String): String = {
    var u = raw.trim
    val frag = u.indexOf('#')
    if (frag >= 0) u = u.substring(0, frag)
    // locate scheme://authority; lowercase only that prefix
    val schemeEnd = u.indexOf("://")
    if (schemeEnd > 0 && isScheme(u, schemeEnd)) {
      var authEnd = u.indexOf('/', schemeEnd + 3)
      if (authEnd < 0) authEnd = u.length
      var needsLower = false
      var i = 0
      while (i < authEnd && !needsLower) {
        val c = u.charAt(i)
        if (c >= 'A' && c <= 'Z') needsLower = true
        i += 1
      }
      if (needsLower)
        u = u.substring(0, authEnd).toLowerCase + u.substring(authEnd)
      // strip default port (:80 http, :443 https)
      val isHttp = u.startsWith("http://")
      val isHttps = u.startsWith("https://")
      if (isHttp || isHttps) {
        var ae = u.indexOf('/', schemeEnd + 3)
        if (ae < 0) ae = u.length
        val port = if (isHttp) ":80" else ":443"
        if (u.regionMatches(ae - port.length, port, 0, port.length) &&
            u.lastIndexOf(':', ae - port.length - 1) <= schemeEnd) // scheme ':' sits AT schemeEnd
          u = u.substring(0, ae - port.length) + u.substring(ae)
      }
    }
    var end = u.length
    while (end > 1 && u.charAt(end - 1) == '/') end -= 1
    if (end < u.length) u.substring(0, end) else u
  }

  private def isScheme(u: String, schemeEnd: Int): Boolean = {
    val c0 = u.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return false
    var i = 1
    while (i < schemeEnd) {
      val c = u.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'
      if (!ok) return false
      i += 1
    }
    true
  }

  /** Host of a canonical URL ("" if unparseable). */
  def host(canonicalUrl: String): String = {
    val i = canonicalUrl.indexOf("://")
    if (i < 0) ""
    else {
      val rest = canonicalUrl.substring(i + 3)
      rest.takeWhile(c => c != '/' && c != ':')
    }
  }

  /** xxhash64 of the UTF-8 bytes with Spark's default seed (42) — exactly
    * what the built-in `xxhash64` Column function computes, so driver-side
    * and executor-side hashes agree.
    */
  def urlHash(canonicalUrl: String): Long = {
    val b = canonicalUrl.getBytes(StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
  }

  // --- Column twins (codegen'd built-ins only) -----------------------------

  /** Column form of [[canonicalize]] — a codegen'd single-pass Catalyst
    * expression (graft.functions.CanonicalizeUrl) calling the same static
    * function, replacing the original six-regexp composition that dominated
    * the frontier round's CPU.
    */
  def canonicalizeCol(url: Column): Column =
    graft.functions.UrlExpressions.canonicalizeUrl(url)

  /** Host of a canonical URL, Column form (codegen'd expression). */
  def hostCol(canonicalUrl: Column): Column =
    graft.functions.UrlExpressions.urlHost(canonicalUrl)

  /** xxhash64 Column (same function as [[urlHash]]). */
  def urlHashCol(canonicalUrl: Column): Column = xxhash64(canonicalUrl)
}
