package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.TextOps

/** Pins the URL canonicalization scalar (TextOps.canonicalUrl) and
  * the URL-first dedup stage built on it: decoration variants of one
  * page collapse to one keeper, distinct pages on the same host
  * survive, and the stage composes with exactDedupFirst (URL collapse
  * first, content dedup on the survivors). */
class UrlSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-url-test")
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(TextOps.canonicalUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalUrl: scheme/fragment/www/utm stripped, host lowered " +
    "(path case kept), query params sorted, empty path -> /") {
    assert(canon(
      "http://Site1.Example.org/a/b",
      "https://www.site1.example.org/a/b",
      "HTTPS://WWW.SITE1.EXAMPLE.ORG/A/B",
      "http://x.org/p#frag2",
      "http://x.org/p?utm_source=feed&b=2&a=1",
      "https://x.org/p?a=1&b=2",
      "http://x.org",
      "x.org/p",
      "http://x.org?b=2&utm_a=1", // pathless host?query form
      "http://x.org/p?utm_a=1&utm_b=2") == Seq(
      "site1.example.org/a/b",
      "site1.example.org/a/b",
      "site1.example.org/A/B", // host lowered, PATH case preserved
      "x.org/p",
      "x.org/p?a=1&b=2", // utm_* dropped, params sorted
      "x.org/p?a=1&b=2", // already canonical order
      "x.org/",          // bare host normalizes to the root path
      "x.org/p",         // scheme-less input passes through
      "x.org/?b=2",      // host ends at '?' even with no path
      "x.org/p"))        // all-tracking query drops entirely
  }

  test("canonicalUrl: default ports stripped (non-default kept), " +
    "stacked www. fully stripped, duplicate path slashes collapsed " +
    "(query untouched), percent-escape hex uppercased") {
    assert(canon(
      "http://x.org:80/p",
      "https://x.org:443/p",
      "http://x.org:8080/p",    // non-default port is semantic
      "http://WWW.X.ORG:80/p",
      "http://www.www.x.org/p", // one-strip would leave www.x.org
      "http://x.org//a///b",
      "http://x.org//a//b?z=//v", // '//' in a VALUE must survive
      "http://x.org/a%2fb",
      "http://x.org/p?q=%3a%2F",
      "http://x.org/p%zz",      // malformed escape passes through
      "http://x.org:80//www%2fa?utm_x=1&b=%2e") == Seq(
      "x.org/p",
      "x.org/p",
      "x.org:8080/p",
      "x.org/p",
      "x.org/p",
      "x.org/a/b",
      "x.org/a/b?z=//v",
      "x.org/a%2Fb",
      "x.org/p?q=%3A%2F",
      "x.org/p%zz",
      "x.org/www%2Fa?b=%2E")) // www inside the PATH is not stripped
  }

  test("canonicalUrl is idempotent across every decoration family") {
    val urls = Seq(
      "http://Site1.Example.org/a/b",
      "HTTPS://WWW.WWW.SITE1.EXAMPLE.ORG:443//A//B#f",
      "http://x.org:80/p?utm_source=feed&b=%2f&a=1",
      "http://x.org", "x.org/p", "http://x.org?b=2&utm_a=1",
      "http://x.org//a///b%2fc%zz?z=//v&y=%3a")
    val once = canon(urls: _*)
    val twice = once.toDF("u")
      .select(TextOps.canonicalUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(once == twice)
  }

  test("urlDedupFirst: decoration variants collapse to min id; " +
    "distinct pages on the same host survive") {
    val docs = Seq(
      (1L, "http://a.org/page", "one"),
      (2L, "https://www.a.org/page#top", "one"),
      (3L, "https://a.org/page?utm_source=x", "one"),
      (4L, "https://a.org/other", "two"),
      (5L, "https://a.org/other?z=1", "three"))
      .toDF("doc_id", "url", "text")
    val kept = TextOps.urlDedupFirst(docs, "doc_id", "url")
      .collect().map(_.getLong(0)).sorted.toSeq
    // 1,2,3 share a canonical page -> keeper 1; 4 and 5 are distinct
    // canonical URLs on the same host (different query) -> both live
    assert(kept == Seq(1L, 4L, 5L))
    val audit = TextOps.urlCanonicalDedup(docs, "doc_id", "url")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(audit("a.org/page") == ((3L, 3L, 1L)))
    assert(audit("a.org/other") == ((1L, 1L, 4L)))
    assert(audit("a.org/other?z=1") == ((1L, 1L, 5L)))
  }

  test("URL-first composes with exactDedupFirst: recrawl mass drops " +
    "at the URL stage, same-text cross-URL pages at the content stage") {
    val docs = Seq(
      (1L, "http://a.org/p", "mirrored text"),
      (2L, "https://www.a.org/p", "mirrored text"), // recrawl of 1
      (3L, "http://b.org/q", "mirrored text"),      // mirror site
      (4L, "http://b.org/r", "unique text"))
      .toDF("doc_id", "url", "text")
    val afterUrl = TextOps.urlDedupFirst(docs, "doc_id", "url")
    assert(afterUrl.collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L, 4L))
    val afterBoth =
      TextOps.exactDedupFirst(afterUrl, "doc_id", "text")
    assert(afterBoth.collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 4L)) // the mirror collapses on content
  }
}
