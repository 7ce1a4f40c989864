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

  /** Pure-Scala canonicalization (Oracle twin of [[canonicalizeCol]]). */
  def canonicalize(raw: String): String = {
    var u = raw.trim
    val frag = u.indexOf('#')
    if (frag >= 0) u = u.substring(0, frag)
    // lowercase scheme://authority prefix only (path/query are case-sensitive)
    val m = SchemeHost.findFirstMatchIn(u)
    u = m match {
      case Some(mm) => mm.group(1).toLowerCase + u.substring(mm.group(1).length)
      case None     => u
    }
    u = u.replaceFirst("^(http://[^/:]+):80(/|$)", "$1$2")
    u = u.replaceFirst("^(https://[^/:]+):443(/|$)", "$1$2")
    while (u.length > 1 && u.endsWith("/")) u = u.dropRight(1)
    u
  }

  private val SchemeHost = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)".r

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

  /** Column form of [[canonicalize]]. */
  def canonicalizeCol(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val prefix = regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    val suffix = noFrag.substr(length(prefix) + 1, lit(Int.MaxValue))
    val schemed = when(prefix =!= "", concat(lower(prefix), suffix)).otherwise(noFrag)
    val noPort = regexp_replace(
      regexp_replace(schemed, "^(http://[^/:]+):80(/|$)", "$1$2"),
      "^(https://[^/:]+):443(/|$)", "$1$2")
    // strip trailing slashes (but keep a bare "/" alone)
    when(noPort.rlike("^/+$"), lit("/")).otherwise(regexp_replace(noPort, "/+$", ""))
  }

  /** Host of a canonical URL, Column form. */
  def hostCol(canonicalUrl: Column): Column =
    regexp_extract(canonicalUrl, "^[a-z][a-z0-9+.-]*://([^/:]+)", 1)

  /** xxhash64 Column (same function as [[urlHash]]). */
  def urlHashCol(canonicalUrl: Column): Column = xxhash64(canonicalUrl)
}
