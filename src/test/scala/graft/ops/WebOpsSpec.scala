package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WebOpsSpec extends SparkSpec {

  import spark.implicits._

  test("canonicalUrl: host lowercased, PATH case kept, frag/query/slash stripped") {
    val out = Seq(
      "https://Example.ORG/A/b/?utm=x#frag", // host folds, /A/b does not
      "https://example.org/a/b",
      "HTTP://example.org/a/b?x=1&y=2",      // scheme folds too
      "https://example.org/a/b#only-frag",
      "https://example.org",
      "Not A Url/")                           // non-URL: only slash rule applies
      .toDF("u").select(WebOps.canonicalUrl($"u")).as[String].collect().toSeq
    assert(out == Seq(
      "https://example.org/A/b",
      "https://example.org/a/b",
      "http://example.org/a/b",
      "https://example.org/a/b",
      "https://example.org",
      "Not A Url"))
    // RFC 3986: paths are case-sensitive — /API and /api must remain
    // DISTINCT canonical keys (a full-lowercase canon would silently
    // delete one of two real pages as a crawl dup)
    val distinct = Seq("https://example.org/API", "https://example.org/api")
      .toDF("u").select(WebOps.canonicalUrl($"u")).as[String].collect().toSet
    assert(distinct.size == 2)
  }

  test("urlHost and domainSuffix parse hosts; non-URLs yield empty host") {
    val out = Seq(
      ("https://a.b.spam.example/x", "a.b.spam.example", "spam.example"),
      ("http://example.org", "example.org", "example.org"),
      ("ftp+ssh://h.example/x?q", "h.example", "h.example"),
      ("not a url", "", ""))
      .toDF("u", "wantHost", "wantSuffix")
      .select(WebOps.urlHost($"u").as("h"),
        WebOps.domainSuffix(WebOps.urlHost($"u")).as("s"),
        $"wantHost", $"wantSuffix")
      .collect()
    out.foreach { r =>
      assert(r.getString(0) == r.getString(2), s"host of ${r}")
      assert(r.getString(1) == r.getString(3), s"suffix of ${r}")
    }
  }

  test("screenUrls: crawl dups collapse to min id, blocked suffixes drop, broadcast anti-join") {
    val df = Seq(
      (5L, "https://A.example.org/p/1?utm=1"),   // dup of 2 after canon
      (2L, "https://a.example.org/p/1#f"),       // keeper (min id)
      (3L, "https://a.example.org/p/2"),         // distinct path survives
      (4L, "https://ads.spam.example/p/1"),      // blocked suffix
      (9L, "https://deep.sub.spam.example/x"),   // blocked at any depth
      (7L, "https://spam.example/p"),            // the domain itself
      (8L, "https://notspam.example/p"))         // NOT a subdomain — survives
      .toDF("doc_id", "url")
    val out = WebOps.screenUrls(df, "doc_id", "url", Seq("spam.example"))
    val rows = out.select("doc_id", "url").as[(Long, String)].collect().toMap
    assert(rows.keySet == Set(2L, 3L, 8L))
    assert(rows(2L) == "https://a.example.org/p/1")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"blocklist should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("blocklist entries of any label depth match exactly their subtree") {
    val df = Seq(
      (1L, "https://x.ads.spam.example/a"), // subdomain of the 3-label entry
      (2L, "https://ads.spam.example/a"),   // the entry itself
      (3L, "https://spam.example/a"),       // PARENT of the entry — survives
      (4L, "https://fads.spam.example/a"))  // sibling, not a subdomain
      .toDF("doc_id", "url")
    val kept = WebOps.screenUrls(df, "doc_id", "url", Seq("ads.spam.example"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
  }
}
