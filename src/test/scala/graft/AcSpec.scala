package graft

import graft.functions.AcAutomaton
import graft.text.TextAnalysis

class AcSpec extends SparkSpec {

  /** Brute-force oracle: count of (pattern, end position) pairs and of
    * distinct patterns present, overlapping included. */
  private def brute(text: String, pats: Seq[String]): (Long, Long) = {
    val per = pats.map { p =>
      (0 to text.length - p.length).count(i => text.startsWith(p, i))
    }
    (per.map(_.toLong).sum, per.count(_ > 0).toLong)
  }

  test("classic Aho-Corasick example: {he, she, his, hers} on ushers") {
    val ac = AcAutomaton(Seq("he", "she", "his", "hers"))
    assert(ac.scan("ushers") === ((3L, 3L))) // she, he, hers
    assert(ac.scan("his hers") === ((3L, 3L))) // his, he (in hers), hers
    assert(ac.scan("xyz") === ((0L, 0L)))
  }

  test("overlapping occurrences all count") {
    val ac = AcAutomaton(Seq("aa"))
    assert(ac.scan("aaaa") === ((3L, 1L)))
    val ac2 = AcAutomaton(Seq("ab", "b"))
    assert(ac2.scan("abab") === ((4L, 2L)))
  }

  test("characters outside the pattern alphabet reset the walk") {
    val ac = AcAutomaton(Seq("ab"))
    assert(ac.scan("aXab") === ((1L, 1L)))
    assert(ac.scan("a中ab") === ((1L, 1L))) // char above alphabet bound
  }

  test("random texts match the brute-force oracle") {
    val pats = Seq("aba", "ba", "bb", "abab", "c")
    val ac = AcAutomaton(pats)
    var seed = 99L
    def next(): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L; seed >>> 33
    }
    (0 until 200).foreach { _ =>
      val t = (0 until (next() % 30).toInt).map(_ => "abc" ((next() % 3).toInt)).mkString
      assert(ac.scan(t) === brute(t, pats), s"text=$t")
    }
  }

  test("ac_scan is callable from SQL via GraftFunctions") {
    graft.functions.GraftFunctions.register(spark)
    val a = spark.sql("SELECT ac_scan('ushers', 'he,she,his,hers') AS a")
      .collect()(0).getSeq[Long](0)
    assert(a === Seq(3L, 3L))
  }

  test("blocklistFilter end-to-end over a DataFrame") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean words only here"),
      (2L, "spam spam and more spam"),
      (3L, "a single spamword")).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFilter(docs, Seq("spam", "spamword"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 0L && !out(0).getBoolean(3))
    assert(out(1).getLong(1) === 3L && out(1).getLong(2) === 1L)
    // "spamword" contains "spam": 1 + 1 matches, 2 distinct patterns
    assert(out(2).getLong(1) === 2L && out(2).getLong(2) === 2L)
    assert(out(2).getBoolean(3))
  }
}
