package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-crawl curation operators — the URL-side stages every crawl-based
  * training corpus runs before any text is read (CCNet/Gopher/RefinedWeb
  * all begin here): URL canonicalization, URL-level dedup, and domain
  * blocklist filtering.
  *
  * All pure codegen'd column expressions (map-only at any scale); the
  * regexes stay inside the RE2 ∩ java.util.regex common subset for the
  * same cross-engine-parity reason as [[TextOps.EmailRe]].
  */
object WebOps {

  /** Canonical form of a URL for dedup purposes: fragment stripped,
    * query string stripped, scheme+host lowercased (RFC 3986 — those
    * parts are case-insensitive; the PATH is NOT, so `/API` and `/api`
    * stay distinct pages), trailing slash stripped. Two crawls of one
    * page (tracking params, #anchors, case-variant hosts) collapse to
    * one canonical key. Deliberately conservative — paths that differ
    * in meaningful ways stay distinct. A string that doesn't parse as
    * scheme://host passes through with only fragment/query/slash rules
    * applied.
    */
  def canonicalUrl(url: Column): Column = {
    val stripped = regexp_replace(
      regexp_replace(url, "#.*$", ""), "\\?.*$", "")
    // the case-insensitive portion: scheme://host (everything before
    // the first path slash); empty when the URL shape doesn't match
    val prefix = regexp_extract(stripped,
      "^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)
    regexp_replace(
      concat(lower(prefix), stripped.substr(length(prefix) + 1, lit(Int.MaxValue))),
      "/$", "")
  }

  /** The host of a URL (text between `scheme://` and the next `/`, `?`
    * or `#`; empty string when the shape doesn't match). Case-tolerant:
    * the scheme may arrive un-canonicalized.
    */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)

  /** The last `levels` dot-labels of a host — the registrable-domain
    * proxy (`a.b.spam.example` -> `spam.example` at levels 2).
    */
  def domainSuffix(host: Column, levels: Int = 2): Column =
    substring_index(host, ".", -levels)

  /** True when `host` is `suffix` itself or any subdomain of it — the
    * standard blocklist rule, correct for entries of ANY label depth
    * (a fixed-level [[domainSuffix]] compare silently never matches a
    * 3-label entry).
    */
  def hostMatchesSuffix(host: Column, suffix: Column): Column =
    host === suffix || host.endsWith(concat(lit("."), suffix))

  /** URL-level dedup + blocklist, the combined crawl-admission screen:
    * canonicalize, keep the smallest `idCol` per canonical URL (crawl
    * dups collapse), then drop every document whose host is a blocked
    * domain or any subdomain of one ([[hostMatchesSuffix]] — entries of
    * any label depth work). The keeper is one canonical-key-partitioned
    * min (equi-shuffle); the blocklist rides a broadcast anti-join —
    * blocklists are small, corpora are not.
    *
    * Output: (idCol, host, canonical url) of surviving documents.
    */
  def screenUrls(df: DataFrame, idCol: String, urlCol: String,
                 blocked: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val canon = df.select(col(idCol), canonicalUrl(col(urlCol)).as("url"))
      .withColumn("host", urlHost(col("url")))
    val kept = canon.groupBy("url", "host")
      .agg(min(col(idCol)).as(idCol))
    kept.join(broadcast(blocked.toDF("__suffix")),
        hostMatchesSuffix(col("host"), col("__suffix")), "left_anti")
      .select(col(idCol), col("host"), col("url"))
  }
}
