package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation: re-crawls of the same
  * page differ only in tracking params, case, default ports, fragments
  * and trailing slashes, so exact-URL dedup without canonicalization
  * under-merges badly.  The rules here are the conservative common
  * denominator of crawl pipelines:
  *
  *  - scheme and host lowercased (path/query case is significant)
  *  - leading `www.` stripped from the host
  *  - default ports stripped (`:80` for http, `:443` for https)
  *  - fragment dropped
  *  - tracking params dropped (`utm_*`, `gclid`, `fbclid` keys)
  *  - remaining query params sorted (param order is not semantic)
  *  - trailing path slash stripped
  *
  * Everything is pure column expressions (regexp extracts + array
  * higher-order ops) — canonicalization runs inside the scan's
  * whole-stage-codegen projection, no UDF, no shuffle; the natural
  * downstream is an exact groupBy on the canonical string (or its
  * xxhash64 for 8-byte shuffle keys at corpus scale).
  *
  * Reference behavior: the reference's URL surface
  * (`sql/core/.../expressions/urlExpressions` via parse_url) only
  * EXTRACTS components; it has no canonical form, so its users dedup
  * raw strings.
  */
object UrlOps {

  /** Canonical form of a URL column.  Inputs must carry a
    * `scheme://` prefix; anything unparseable passes through as
    * lower(trim(url)) — a deterministic fallback, never a NULL that
    * would silently drop rows from a dedup.
    */
  def canonicalize(url: Column): Column = {
    val u = trim(url)
    val schemePat = "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)(.*)$"
    val scheme = lower(regexp_extract(u, schemePat, 1))
    val authority0 = lower(regexp_extract(u, schemePat, 2))
    val tail0 = regexp_extract(u, schemePat, 3)
    // www. prefix, then the scheme's default port
    val authority1 = regexp_replace(authority0, "^www\\.", "")
    val authority = when(scheme === "http",
        regexp_replace(authority1, ":80$", ""))
      .when(scheme === "https", regexp_replace(authority1, ":443$", ""))
      .otherwise(authority1)
    // fragment, then split path / query
    val tail = regexp_replace(tail0, "#.*$", "")
    val path0 = regexp_replace(tail, "\\?.*$", "")
    val path = regexp_replace(path0, "/+$", "")
    val query0 = regexp_extract(tail, "\\?(.*)$", 1)
    val keptParams = filter(split(query0, "&"), p =>
      !(p.startsWith("utm_") ||
        split(p, "=").getItem(0).isin("gclid", "fbclid") ||
        p === ""))
    val query = array_join(sort_array(keptParams), "&")
    val canon = concat(scheme, lit("://"), authority, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
    when(scheme === "", lower(u)).otherwise(canon)
  }

  /** Registrable host of a canonical (or raw) URL — the per-domain
    * grouping key for crawl budgeting and domain caps.
    */
  def hostOf(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(trim(url), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)", 1)),
      "^www\\.", "")
}
