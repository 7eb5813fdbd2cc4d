package graft

import org.apache.spark.sql.functions._
import graft.text.{PiiScrub, UrlOps}

/** M24 PII scrubbing and M25/M26 URL canonicalization value-level cases
  * (the gate queries verify the same chains corpus-wide vs DuckDB). */
class PiiUrlSpec extends SparkSpec {

  private def one(text: String) = {
    val r = PiiScrub.scrub(
      spark.createDataFrame(Seq((1L, text))).toDF("doc_id", "text")).collect()(0)
    (r.getAs[String]("clean"), r.getAs[Int]("n_emails"),
      r.getAs[Int]("n_ips"), r.getAs[Int]("n_phones"))
  }

  test("scrub replaces emails, IPv4s and phones with typed placeholders") {
    val (clean, e, i, p) = one(
      "mail a.b+c@x-y.org or d@e.co, host 192.168.0.1, call +41791234567 now")
    assert(clean ==
      "mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE> now")
    assert((e, i, p) == (2, 1, 1))
  }

  test("ordering: an email local part with +digits is not eaten as a phone") {
    val (clean, e, _, p) = one("user+123456789@example.com")
    assert(clean == "<EMAIL>" && e == 1 && p == 0)
  }

  test("dotted quads inside words and short numbers are left alone") {
    val (clean, e, i, p) = one("version 1.2.3 of +123 at 1.2.3.4.5")
    // 1.2.3 is not an IPv4; +123 is too short for a phone; 1.2.3.4.5 has
    // a word-boundary quad prefix 1.2.3.4 (matching follows the regex,
    // not URL semantics — documented RE2-subset tradeoff)
    assert(e == 0 && p == 0 && i == 1)
    assert(clean == "version 1.2.3 of +123 at <IP>.5")
  }

  private def canon(url: String): String =
    spark.createDataFrame(Seq(Tuple1(url))).toDF("url")
      .select(UrlOps.canonical(col("url"))).collect()(0).getString(0)

  test("canonical: case, default ports, fragments, tracking params, param order") {
    assert(canon("HTTP://Example.COM:80/a/b?utm_source=x&z=2&a=1#frag") ==
      "http://example.com/a/b?a=1&z=2")
    assert(canon("https://Host.io:443/p?fbclid=abc&gclid=1") ==
      "https://host.io/p")
    assert(canon("https://host.io:8443/p") == "https://host.io:8443/p")
    assert(canon("http://h.com/") == "http://h.com/")
    assert(canon("ftp://H.com:80/f") == "ftp://h.com:80/f") // only http strips :80
  }

  test("dedupByCanonicalUrl collapses variants; keeps smallest doc_id") {
    val docs = spark.createDataFrame(Seq(
      (3L, "http://a.com/p?x=1&y=2"),
      (1L, "HTTP://A.COM:80/p?y=2&x=1&utm_source=s"),
      (2L, "http://a.com/q"))).toDF("doc_id", "url")
    val out = UrlOps.dedupByCanonicalUrl(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("http://a.com/p?x=1&y=2") == ((1L, 2L, 2L)))
    assert(out("http://a.com/q") == ((2L, 1L, 1L)))
  }

  test("domainStats rolls up docs, pages and chars per host") {
    val docs = spark.createDataFrame(Seq(
      (1L, "http://a.com/p", 10L), (2L, "HTTP://A.com/p", 20L),
      (3L, "http://b.com/x", 5L))).toDF("doc_id", "url", "n_chars")
    val out = UrlOps.domainStats(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a.com") == ((2L, 1L, 30L)))
    assert(out("b.com") == ((1L, 1L, 5L)))
  }
}
