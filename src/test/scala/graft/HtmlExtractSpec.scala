package graft

import graft.sources.LoaderFixtures
import graft.text.HtmlExtract

/** Value-level checks for the HTML extraction kernels (strip pipeline,
  * block scanner, link-density filter) and their Catalyst expressions. */
class HtmlExtractSpec extends SparkSpec {

  test("strip: comments, script/style, tags, entities, whitespace") {
    val html = "<html><head><style>p {c}</style><script>if(1<2){}</script>" +
      "</head><body><!-- c --><p>a &amp; b &lt;x&gt; &quot;q&quot; " +
      "&#39;s&#39;&nbsp;end</p></body></html>"
    assert(HtmlExtract.strip(html) == "a & b <x> \"q\" 's' end")
  }

  test("strip: &amp; decodes LAST (double-escape stays escaped)") {
    assert(HtmlExtract.strip("<p>&amp;lt;tag&amp;gt;</p>") == "&lt;tag&gt;")
  }

  test("blocks: block tags split, inline tags don't, entities decode") {
    val bs = HtmlExtract.blocks(
      "<h1>Title</h1><p>one <b>two</b> three</p><p>x &#8212; y</p>")
    assert(bs.map(_.text) == Vector("Title", "one two three", "x — y"))
    // nChars counts rendered non-whitespace chars only
    assert(bs.map(_.nChars) == Vector(5, 11, 3))
  }

  test("blocks: script/style/comment content never renders, case-insensitive") {
    val bs = HtmlExtract.blocks(
      "<SCRIPT>var x = '<p>not text</p>';</SCRIPT><p>real</p>" +
        "<style>a{}</style><!-- <p>no</p> -->tail")
    assert(bs.map(_.text) == Vector("real", "tail"))
  }

  test("blocks: link chars tracked through nesting; self-closing <a/> ignored") {
    val bs = HtmlExtract.blocks(
      "<div><a href=x>link text</a> plain</div><div><a/>free</div>")
    assert(bs.length == 2)
    assert(bs(0).nLinkChars == 8)  // "link"+"text"
    assert(bs(0).nChars == 13)     // "link"+"text"+"plain"
    assert(bs(1).nLinkChars == 0)
  }

  test("mainText: nav/footer pure-link blocks drop, content stays") {
    val (text, nb, nk, _, _) = HtmlExtract.mainText(
      LoaderFixtures.warcHtml0, maxLinkDensity = 0.33, minChars = 2)
    assert(text.contains("Emission inventories at scale"))
    assert(text.contains("no mass lost"))
    assert(!text.contains("Home"))     // nav dropped (all links)
    assert(!text.contains("Imprint"))  // footer dropped (link-dominated)
    assert(nk < nb)
    // the partially-linked content paragraph SURVIVES the density cap
    assert(text.contains("remap operator for details"))
  }

  test("expressions: html_strip and html_main_text run codegen'd") {
    import org.apache.spark.sql.functions._
    // RDD-backed input: keeps Catalyst from folding the projection into
    // a LocalTableScan, so the assert below sees real codegen
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      (0L, "<p>a &amp; b</p>"),
      (1L, LoaderFixtures.warcHtml1)))).toDF("id", "html")
      .select(col("id"), HtmlExtract.htmlStrip(col("html")).as("clean"),
        HtmlExtract.htmlMainText(col("html")).as("m"))
    val rows = df.select("id", "clean", "m.text", "m.n_blocks", "m.n_kept")
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "a & b")
    assert(rows(0).getString(2) == "a & b")
    val t1 = rows(1).getString(2)
    assert(t1.contains("Second page body text"))
    assert(t1.contains("minhash"))
    assert(!t1.contains("x y")) // menu div dropped
    // '*(n)' marks the projection fused into WholeStageCodegen (native
    // expr, no UDF boundary)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("strip equals the regex pipeline replayed step-for-step") {
    // the exact chain the DuckDB oracle runs — any kernel drift fails here
    def replay(h: String): String = {
      var s = h.replaceAll("(?s)<!--.*?-->", " ")
      s = s.replaceAll("(?is)<script\\b[^>]*>.*?</script>", " ")
      s = s.replaceAll("(?is)<style\\b[^>]*>.*?</style>", " ")
      s = s.replaceAll("<[^>]*>", " ")
      s = s.replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&#39;", "'")
        .replace("&nbsp;", " ").replace("&amp;", "&")
      s.replaceAll("\\s+", " ").trim
    }
    Seq(LoaderFixtures.warcHtml0, LoaderFixtures.warcHtml1,
      "plain no markup", "", "<p>&amp;lt;</p>").foreach { h =>
      assert(HtmlExtract.strip(h) == replay(h))
    }
  }
}
