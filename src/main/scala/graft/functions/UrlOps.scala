package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl/web-data dedup (RFC 3986-flavored
  * normalizations): lowercase scheme+host, strip fragments and default
  * ports, drop tracking parameters (utm_*, fbclid), sort surviving
  * query parameters, trim the trailing path slash. Two raw URLs that
  * differ only in these respects canonicalize identically, which is
  * the identity crawl dedup keys on. Pure `functions._` composition —
  * codegen'd end to end, and exactly replayable by a SQL oracle. */
object UrlOps {

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // scheme://host[:port] — the only case-insensitive part
    val headRaw = regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val head = regexp_replace(
      regexp_replace(lower(headRaw), "^(http://.*):80$", "$1"),
      "^(https://.*):443$", "$1")
    val rest = substring(noFrag, length(headRaw) + 1, lit(1 << 24))
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = array_join(
      array_sort(filter(split(query, "&"),
        p => !p.rlike("^(utm_[^=]*|fbclid)(=|$)") && length(p) > 0)),
      "&")
    concat(head, path,
      when(length(params) > 0, concat(lit("?"), params)).otherwise(lit("")))
  }

  /** PII redaction for training-data curation: mask URLs, email
    * addresses, and phone-shaped numbers with typed placeholder
    * tokens. Patterns are RE2-safe (no lookarounds/backrefs) so any
    * SQL engine replays them byte-exactly; URL masking runs first so
    * an address inside a URL is not double-matched. A production
    * pass would add locale-specific identifiers behind the same
    * column-in, column-out contract. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val PhoneRe = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
}
