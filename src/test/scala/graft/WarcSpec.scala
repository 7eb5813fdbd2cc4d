package graft

import graft.sources.{LoaderFixtures, Warc}

/** WARC reader vs the ISO 28500 record grammar, on the committed crawl
  * fixture (plain + two-member gzip shards). */
class WarcSpec extends SparkSpec {

  test("parseFile walks every record of the plain shard") {
    val rows = Warc.parseFile("shard_000.warc", LoaderFixtures.warcBytes)
    assert(rows.map(_.warc_type) ==
      Seq("warcinfo", "request", "response", "response", "response"))
    assert(rows.map(_.seq) == Seq(0, 1, 2, 3, 4))
    assert(rows(2).target_uri == "http://example.test/")
    assert(rows(2).record_id == "urn:uuid:p0")
    assert(rows(2).warc_date == "2026-01-02T03:04:06Z")
  }

  test("HTTP payload split: status, content-type, body") {
    val rows = Warc.parseFile("s", LoaderFixtures.warcBytes)
    val ok = rows(2)
    assert(ok.http_status == 200)
    assert(ok.http_content_type == "text/html; charset=UTF-8")
    assert(new String(ok.body, "UTF-8") == LoaderFixtures.warcHtml0)
    val miss = rows(4)
    assert(miss.http_status == 404)
    assert(new String(miss.body, "UTF-8") == "gone\n")
    // non-HTTP records pass payload through with status -1
    assert(rows(0).http_status == -1)
    assert(new String(rows(0).body, "UTF-8").startsWith("software:"))
  }

  test("multi-member gzip shard inflates to the identical record set") {
    val plain = Warc.parseFile("a", LoaderFixtures.warcBytes)
    val gz = Warc.parseFile("b", LoaderFixtures.warcGzBytes)
    assert(gz.map(r => (r.seq, r.warc_type, r.target_uri, r.http_status)) ==
      plain.map(r => (r.seq, r.warc_type, r.target_uri, r.http_status)))
    assert(gz.zip(plain).forall { case (a, b) =>
      java.util.Arrays.equals(a.body, b.body) })
  }

  test("Spark read: one row per record per shard, no shuffle in the plan") {
    val ds = Warc.read(spark, "fixtures/crawl")
    assert(ds.count() == 10) // 5 records x 2 shards
    val plan = ds.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"warc scan must not shuffle:\n$plan")
    val html = Warc.htmlResponses(ds)
    assert(html.count() == 4) // 2 HTML 200s x 2 shards
    assert(html.columns.toSeq ==
      Seq("file", "seq", "url", "fetched_at", "html", "n_bytes"))
  }

  test("truncated payload fails loudly, not silently") {
    val cut = LoaderFixtures.warcBytes.dropRight(60)
    val e = intercept[IllegalArgumentException] {
      Warc.parseFile("cut.warc", cut)
    }
    assert(e.getMessage.contains("payload runs past end"))
  }
}
