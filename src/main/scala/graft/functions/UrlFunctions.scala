package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalize-before-dedup stage of a web-corpus
  * pipeline: two crawls of the same page under cosmetically different URLs
  * must map to one canonical key before URL-level dedup can work.
  *
  * Steps, in order:
  *   1. drop the fragment (`#…`)
  *   2. lowercase the scheme+authority (path/query case is significant)
  *   3. strip a `www.` host prefix
  *   4. strip explicit default ports `:80` / `:443`
  *   5. remove tracking params (`utm_*`, `fbclid`, `gclid`)
  *   6. repair the separator if the first param was removed (`&` → `?`)
  *   7. strip trailing slashes on the path and a bare trailing `?`
  *
  * Pure codegen'd column expressions (anchored regexes, no UDF); the same
  * step sequence is expressible in any RE2 engine, which is how the oracle
  * mirrors it.
  */
object UrlFunctions {

  private val AuthorityRe = "^[^/?#]*://[^/?#]*"

  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val lowered = concat(
      lower(regexp_extract(noFrag, AuthorityRe, 0)),
      regexp_replace(noFrag, AuthorityRe, ""))
    val noWww = regexp_replace(lowered, "://www\\.", "://")
    val noPort = regexp_replace(noWww, ":(80|443)(/|\\?|$)", "$2")
    val noTrack = regexp_replace(noPort, "[?&](utm_[a-z]+|fbclid|gclid)=[^&#]*", "")
    val fixedSep = regexp_replace(noTrack, "^([^?&]*)&", "$1?")
    val noSlash = regexp_replace(fixedSep, "/+(\\?|$)", "$1")
    regexp_replace(noSlash, "\\?$", "")
  }

  /** Registrable host of a URL — the key for domain-level corpus policy
    * (blocklists, per-domain caps/stats): scheme stripped, everything from
    * the first `/ : ? #` on stripped, lowercased, `www.` prefix dropped.
    * Schemeless input is treated as starting at the host.
    */
  def hostOf(u: Column): Column = {
    val noScheme = regexp_replace(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val host = regexp_replace(noScheme, "[/:?#].*$", "")
    regexp_replace(lower(host), "^www\\.", "")
  }

  /** DuckDB twin of [[hostOf]]. */
  def oracleHostOf(e: String): String = {
    val noScheme = s"regexp_replace($e, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    val host = s"regexp_replace($noScheme, '[/:?#].*$$', '')"
    s"regexp_replace(lower($host), '^www\\.', '')"
  }

  /** DuckDB twin of [[canonicalizeUrl]] — the same step sequence as nested
    * RE2 `regexp_replace` calls (`\n` group syntax, explicit 'g' where a
    * pattern can match more than once), applied to SQL expression `e`.
    */
  def oracleCanonicalize(e: String): String = {
    val noFrag = s"regexp_replace($e, '#.*$$', '')"
    val lowered = s"lower(regexp_extract($noFrag, '^[^/?#]*://[^/?#]*')) || " +
      s"regexp_replace($noFrag, '^[^/?#]*://[^/?#]*', '')"
    val noWww = s"regexp_replace($lowered, '://www\\.', '://')"
    val noPort = s"regexp_replace($noWww, ':(80|443)(/|\\?|$$)', '\\2')"
    val noTrack = s"regexp_replace($noPort, '[?&](utm_[a-z]+|fbclid|gclid)=[^&#]*', '', 'g')"
    val fixedSep = s"regexp_replace($noTrack, '^([^?&]*)&', '\\1?')"
    val noSlash = s"regexp_replace($fixedSep, '/+(\\?|$$)', '\\1')"
    s"regexp_replace($noSlash, '\\?$$', '')"
  }
}
