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

  /** `(href, anchor)` pairs from an HTML markup column, one row per
    * `<a href="...">text</a>` tag, input columns preserved. Both capture
    * groups come from the SAME pattern via two `regexp_extract_all` calls,
    * so the arrays align by construction and `zip_with` pairs them — the
    * `extract_patterns` idiom, fully codegen'd, no UDF.
    */
  def extractAnchors(df: DataFrame, htmlCol: String): DataFrame = {
    val pat = """'<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>'"""
    df.withColumn("pair", explode(expr(
      s"""zip_with(regexp_extract_all($htmlCol, $pat, 1),
         |  regexp_extract_all($htmlCol, $pat, 2),
         |  (h, a) -> struct(h AS href, a AS anchor))""".stripMargin)))
      .withColumn("href", col("pair.href"))
      .withColumn("anchor", col("pair.anchor"))
      .drop("pair")
  }

  /** Anchor-text index: per link target, in-link count and the sorted
    * distinct anchor texts pointing at it — the web-graph signal search
    * and corpus-quality pipelines aggregate (anchors describe the TARGET
    * page better than its own boilerplate). Map-side extraction + one
    * hash-agg on the href; anchors are '|'-joined so the table stays flat.
    * At web scale, cap per-target list size before collect (df-bounded,
    * same caveat as the inverted index).
    */
  def anchorTextIndex(df: DataFrame, htmlCol: String): DataFrame =
    extractAnchors(df, htmlCol)
      .groupBy("href")
      .agg(count(lit(1)).as("n_links"),
        array_join(array_sort(array_distinct(collect_list(col("anchor")))), "|")
          .as("anchors"))

  /** Lowercased host of a URL (port and userinfo excluded); "" for
    * non-URLs. Pure codegen'd expression.
    */
  def host(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1))

  /** Per-host corpus accounting — the table domain mixing, blocklisting,
    * and crawl-budget decisions read: URL count, distinct-URL count, and
    * (optionally) the sum of a per-row weight such as a token count, so
    * "how much training mass comes from host X" is one lookup. One
    * hash-agg on the host (hosts are the canonical example of a skewed
    * key — counts/sums partial-aggregate map-side, and the distinct
    * count rides Spark's two-phase partial_count(distinct ...) expand,
    * so no single reducer sees a whole mega-host's rows unaggregated).
    */
  def domainStats(df: DataFrame, urlCol: String,
                  weightCol: Option[String] = None): DataFrame = {
    val base = df.groupBy(host(col(urlCol)).as("host"))
    val aggs = Seq(count(lit(1)).as("n_urls"),
      countDistinct(col(urlCol)).as("n_distinct_urls")) ++
      weightCol.map(w => sum(col(w)).as("weight_sum"))
    base.agg(aggs.head, aggs.tail: _*)
  }
}
