package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** Semantics specs for the URL curation operators: parse edge cases
  * (ports, uppercase hosts, relative/garbage URLs) and blocklist flags. */
class UrlsSpec extends SparkSuite {
  import spark.implicits._

  test("parse extracts host/domain/tld/path depth; survives junk input") {
    val df = Seq(
      (1L, "https://Sub.Example.COM/a/b/c"),
      (2L, "http://example.org:8080/x"),
      (3L, "https://localhost/"),
      (4L, "not a url at all"),
      (5L, "ftp://files.archive.net")).toDF("doc_id", "url")
    val out = Urls.parse(df, "url", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getString(3), r.getString(4), r.getInt(5)))).toMap
    assert(out(1L) === (("sub.example.com", "example.com", "com", 3)))
    assert(out(2L) === (("example.org", "example.org", "org", 1)))   // port stripped
    assert(out(3L) === (("localhost", "", "", 1)))                    // single label
    assert(out(4L) === (("", "", "", 0)))                             // unparseable
    assert(out(5L) === (("files.archive.net", "archive.net", "net", 0)))
  }

  test("canonicalize: scheme/case/port/trackers/param-order/slash/fragment") {
    val df = Seq(
      (1L, "HTTP://Example.COM:80/page/?utm_source=x&b=2&a=1#frag"),
      (2L, "https://example.com/page?a=1&b=2"),
      (3L, "https://example.com:443/page?b=2&utm_campaign=y&a=1"),
      (4L, "https://example.com/page?fbclid=abc"),
      (5L, "https://example.com/other")).toDF("doc_id", "url")
    val out = df.select(col("doc_id"),
        Urls.canonicalize(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1-4 all collapse to the same canonical identity
    assert(out(1L) === "https://example.com/page?a=1&b=2")
    assert(out(2L) === out(1L))
    assert(out(3L) === out(1L))
    assert(out(4L) === "https://example.com/page")
    assert(out(5L) === "https://example.com/other")
  }

  test("canonicalize: malformed/relative/garbage URLs yield NULL, not a shared identity") {
    val df = Seq(
      (1L, "example.com/page"),      // scheme-less
      (2L, "/relative/path"),
      (3L, "not a url at all"),
      (4L, "https://real.com/p")).toDF("doc_id", "url")
    val out = df.select(col("doc_id"), Urls.canonicalize(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
    assert(out(4L) === Some("https://real.com/p"))
  }

  test("urlDedup: NULL-canon docs are their own keepers, never pooled") {
    val df = Seq(
      (20L, "garbage one"), (21L, "garbage two"),
      (22L, "https://example.com/p"), (23L, "HTTPS://example.com/p"))
      .toDF("doc_id", "url")
    val out = Urls.urlDedup(df, "url", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    // the two malformed docs each keep themselves — no pseudo-group
    assert(out(20L) === ((20L, false)))
    assert(out(21L) === ((21L, false)))
    assert(out(22L) === ((22L, false)))
    assert(out(23L) === ((22L, true)))
  }

  test("urlDedup groups by canonical identity, min id wins") {
    val df = Seq(
      (10L, "https://example.com/p?x=1&utm_source=a"),
      (11L, "HTTP://EXAMPLE.com/p/?x=1#top"),
      (12L, "https://example.com/q")).toDF("doc_id", "url")
    val out = Urls.urlDedup(df, "url", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(10L) === ((10L, false)))
    assert(out(11L) === ((10L, true)))
    assert(out(12L) === ((12L, false)))
  }

  test("flagBlocked flags by registered domain, not host") {
    val df = Seq(
      (1L, "https://spam.bad.com/x"),
      (2L, "https://good.com/x"),
      (3L, "https://bad.com.good.org/x")).toDF("doc_id", "url") // suffix trick
    val out = Urls.flagBlocked(Urls.parse(df, "url", "doc_id"),
        Seq("bad.com"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(out(1L) === true)   // subdomain of a blocked domain
    assert(out(2L) === false)
    assert(out(3L) === false)  // registered domain is good.org
  }
}
