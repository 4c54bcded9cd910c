package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation.
  *
  * Web-scale pipelines dedup and group by URL before they ever touch
  * document text (a CommonCrawl snapshot carries the same page under
  * http/https, with/without `www.`, with tracking params, with
  * fragments). Canonicalizing first makes URL-level exact dedup
  * ([[Dedup.exactGroups]] on the normalized column) catch those
  * families, and makes per-site caps ([[Sampling.topNPerKey]] on
  * [[urlHost]]) group correctly.
  *
  * Everything here is a chain of RE2-safe regexp/split/filter
  * built-ins (no lookarounds, no backreferences): a pure codegen
  * projection — zero shuffle, linear scan at any corpus size — and an
  * oracle can replay every step with the same patterns.
  *
  * Normalization rules (the conservative, lossless-for-ranking core):
  *  - drop the `#fragment`;
  *  - lowercase scheme and host (never path or query);
  *  - strip a leading `www.`;
  *  - strip the default port (`:80` for http, `:443` for https);
  *  - drop tracking query params (`utm_*`, `fbclid`, `gclid`,
  *    `msclkid`, `ref`), keeping the remaining params in order;
  *  - drop an emptied `?`;
  *  - empty path becomes `/`.
  */
object Urls {

  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://.*$"
  private val HostRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*).*$"
  private val RestRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*).*$"

  /** Lowercased scheme of an absolute URL ('' if not absolute). */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, SchemeRe, 1))

  /** Lowercased host[:port] of an absolute URL ('' if not absolute),
    * `www.`-stripped and default-port-stripped.
    */
  def urlHost(url: Column): Column = {
    val raw = lower(regexp_extract(url, HostRe, 1))
    val noWww = regexp_replace(raw, "^www\\.", "")
    val noPort = when(urlScheme(url) === "http",
        regexp_replace(noWww, ":80$", ""))
      .when(urlScheme(url) === "https",
        regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    noPort
  }

  /** Path + query of an absolute URL, fragment dropped, tracking
    * params removed, empty path canonicalized to `/`.
    */
  def urlPathQuery(url: Column): Column = {
    val rest = regexp_extract(url, RestRe, 1)
    val path = regexp_extract(rest, "^([^?]*).*$", 1)
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val keptParams = filter(split(query, "&"),
      p => !(p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)=") ||
        p === ""))
    val cleanQuery = array_join(keptParams, "&")
    val canonPath = when(path === "", lit("/")).otherwise(path)
    concat(canonPath,
      when(cleanQuery === "", lit("")).otherwise(concat(lit("?"),
        cleanQuery)))
  }

  /** Full canonical URL; non-absolute inputs (no `scheme://`) pass
    * through unchanged so the column stays total.
    */
  def normalizeUrl(url: Column): Column =
    when(regexp_extract(url, SchemeRe, 1) === "", url)
      .otherwise(concat(urlScheme(url), lit("://"), urlHost(url),
        urlPathQuery(url)))
}
