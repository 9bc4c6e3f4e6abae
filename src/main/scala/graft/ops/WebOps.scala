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

  /** Canonical form of a URL for dedup purposes: lowercase, fragment
    * stripped, query string stripped, trailing slash stripped. Two
    * crawls of one page (tracking params, #anchors, case-variant hosts)
    * collapse to one canonical key. Deliberately conservative — paths
    * that differ in meaningful ways stay distinct.
    */
  def canonicalUrl(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(lower(url), "#.*$", ""),
        "\\?.*$", ""),
      "/$", "")

  /** The host of a URL (text between `scheme://` and the next `/`, `?`
    * or `#`; empty string when the shape doesn't match).
    */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)

  /** The last `levels` dot-labels of a host — the registrable-domain
    * proxy blocklists key on (`a.b.spam.example` -> `spam.example` at
    * levels 2).
    */
  def domainSuffix(host: Column, levels: Int = 2): Column =
    substring_index(host, ".", -levels)

  /** URL-level dedup + blocklist, the combined crawl-admission screen:
    * canonicalize, keep the smallest `idCol` per canonical URL (crawl
    * dups collapse), then drop every document whose 2-label domain
    * suffix is in `blocked`. The keeper is one canonical-key-partitioned
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
        domainSuffix(col("host")) === col("__suffix"), "left_anti")
      .select(col(idCol), col("host"), col("url"))
  }
}
