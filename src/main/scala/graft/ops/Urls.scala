package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed deduplication — the first dedup pass of
  * every web-scale corpus pipeline (Common-Crawl-style curation dedups by
  * canonical URL before any content hashing: it's free, exact, and removes
  * the bulk of recrawl duplicates).
  *
  * Canonical form (the conservative, always-safe subset of RFC 3986 §6
  * normalization):
  *   - scheme and host lowercased
  *   - default ports stripped (`:80` for http, `:443` for https)
  *   - fragment dropped (`#...` — never reaches the server)
  *   - query parameters sorted byte-wise (param ORDER is almost always
  *     insignificant; sorting makes `?b=2&a=1` ≡ `?a=1&b=2`)
  *   - empty query's dangling `?` dropped, trailing slash on a bare
  *     authority kept as-is (path semantics are the server's business)
  *
  * Everything is a column-expression pipeline (regexp_extract / split /
  * array_sort / concat) — codegen'd, no UDF, map-only until the dedup's one
  * hash-aggregate on the canonical key.
  */
object Urls {

  /** All `http(s)://...` URLs in `textCol`, one row per match:
    * (…input cols…, url). */
  def extractUrls(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("url",
      explode(expr(s"regexp_extract_all($textCol, '(?i)https?://[^\\\\s]+', 0)")))

  /** The canonical form of a URL column (see object doc). Non-URL strings
    * pass through unchanged (every component regex just fails to match). */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // authority = host[:port]; userinfo is rare and preserved verbatim ahead
    // of the host match failing — conservative
    val hostPort = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = lower(regexp_extract(hostPort, "^([^:]*)", 1))
    val port = regexp_extract(hostPort, ":(\\d+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    // path: after authority, before ? or #
    val path = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val sortedQuery = when(query === "", lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(split(query, "&")), "&")))
    when(scheme === "", url) // not a URL: pass through
      .otherwise(concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path, sortedQuery))
  }

  /** Dedup by canonical URL: one row per canonical key with its occurrence
    * count and the lexicographically-first raw form as the survivor
    * (deterministic, engine-neutral). */
  def dedupByUrl(urls: DataFrame, urlCol: String): DataFrame =
    urls
      .withColumn("canonical_url", canonicalUrl(col(urlCol)))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_raw"), min(col(urlCol)).as("first_raw"))
}
