package graft

import graft.ops.Sampling
import graft.text.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private def mixedDocs = {
    import spark.implicits._
    // two disjoint vocabularies: "science" docs (target-like) and
    // "spam" docs
    val sci = Seq("atoms bond into stable molecules",
      "energy flows through the reaction",
      "molecules exchange energy in collisions",
      "stable atoms resist the reaction")
    val spam = Seq("click here buy now cheap",
      "cheap deals click now here",
      "buy cheap now click deals")
    (sci ++ spam).zipWithIndex
      .map { case (t, i) => (i.toLong, t, if (i < sci.length) "sci" else "spam") }
      .toDF("doc_id", "text", "lang")
  }

  test("dsirScores prefers target-like documents") {
    val docs = mixedDocs
    val out = Curation.dsirScores(docs, docs.where(col("lang") === "sci"),
        buckets = 256)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Boolean]("keep"),
        r.getAs[Double]("mean_w")))
    val sciMean = out.filter(_._1 == "sci").map(_._3).sum / out.count(_._1 == "sci")
    val spamMean = out.filter(_._1 == "spam").map(_._3).sum / out.count(_._1 == "spam")
    assert(sciMean > spamMean, s"sci $sciMean should outscore spam $spamMean")
    assert(out.filter(_._1 == "sci").forall(_._2), "all sci docs kept")
    assert(!out.filter(_._1 == "spam").exists(_._2), "no spam doc kept")
  }

  test("dsirWeights covers every bucket exactly once") {
    val docs = mixedDocs
    val w = Curation.dsirWeights(docs, docs.where(col("lang") === "sci"), 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.keySet === (0L until 64L).toSet)
    assert(w.values.forall(_ > 0L))
  }

  test("qualityClassifier logit matches hand arithmetic") {
    import spark.implicits._
    val docs = Seq((1L, "the the cat")).toDF("doc_id", "text")
    val r = Curation.qualityClassifier(docs, Seq("the", "a"),
      wTtr = 2.0, wStop = -1.5, wLen = 0.25, wWords = 1.0, bias = -2.5)
      .collect().head
    val nw = 3.0
    val ttr = 2.0 / nw
    val stop = 2.0 / nw
    val mwl = (11.0 - nw + 1.0) / nw
    val capped = math.min(nw, 64.0) / 64.0
    val logit = -2.5 + 2.0 * ttr + -1.5 * stop + 0.25 * mwl + 1.0 * capped
    assert(r.getAs[Double]("ttr") === ttr)
    assert(r.getAs[Double]("stop_ratio") === stop)
    assert(r.getAs[Double]("mean_wlen") === mwl)
    assert(r.getAs[Double]("logit") === logit)
    assert(r.getAs[Boolean]("keep") === (logit > 0))
  }

  test("domainMix reproduces the per-domain epoch plan") {
    import spark.implicits._
    val docs = ((0L until 8L).map(i => (i, s"a doc $i", "a")) ++
      (8L until 10L).map(i => (i, s"b doc $i", "b")))
      .toDF("doc_id", "text", "lang")
    val out = Sampling.domainMix(docs, "lang", Map("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // expected, by the documented formula: total=10
    def plan(n: Long, w: Double) = {
      val e = w * 10.0 / n
      (math.floor(e).toLong, math.floor((e - math.floor(e)) * Sampling.MixSlotMod).toLong)
    }
    val expect = (0L until 10L).flatMap { id =>
      val dom = if (id < 8) "a" else "b"
      val (copies, thresh) = if (id < 8) plan(8, 0.5) else plan(2, 0.5)
      val slot = ((id % Sampling.MixSlotMod) * 48271L) % Sampling.MixSlotMod
      val n = copies + (if (slot < thresh) 1L else 0L)
      (0L until n).map(e => (id, dom, e))
    }
    assert(out.toSet === expect.toSet)
    // domain b upsamples: every b doc appears at least twice (2.5 epochs)
    assert((8L until 10L).forall(id => out.count(_._1 == id) >= 2))
    // weights must sum to 1
    intercept[IllegalArgumentException] {
      Sampling.domainMix(docs, "lang", Map("a" -> 0.5, "b" -> 0.1))
    }
  }

  test("gopherRules flags each heuristic independently; keep is the conjunction") {
    import spark.implicits._
    val docs = Seq(
      // passes everything: 10 words, mean wlen 3.8, 2 stopwords, distinct
      (1L, "the quick brown fox jumps over a lazy dog today"),
      // too short (3 words) — r_word_count=0
      (2L, "the cat sat"),
      // one pathological 25-char word — r_max_wlen=0
      (3L, "the of one two three four five six seven " + "x" * 25),
      // numeric soup — r_alpha=0 (2/12 words alphabetic < 0.8)
      (4L, "the of 1 2 3 4 5 6 7 8 9 10"),
      // massive repetition — r_ttr=0 (3 distinct / 20 = 0.15 < 0.2)
      (5L, "the of " + Seq.fill(18)("x").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.gopherRules(docs,
        Seq("the", "a", "of", "and", "to", "in"))
      .collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getInt).toList).toMap
    // list indices: 0=r_word_count 1=r_mean_wlen 2=r_max_wlen 3=r_alpha
    //               4=r_stop 5=r_ttr 6=r_symbol 7=keep
    assert(out(1L).forall(_ == 1), s"doc1 should pass all: ${out(1L)}")
    assert(out(2L).head == 0 && out(2L).last == 0, s"doc2: ${out(2L)}")
    assert(out(3L)(2) == 0 && out(3L).last == 0, s"doc3: ${out(3L)}")
    assert(out(4L)(3) == 0 && out(4L).last == 0, s"doc4: ${out(4L)}")
    assert(out(5L)(5) == 0 && out(5L).last == 0, s"doc5: ${out(5L)}")
  }

  test("domainMix rejects high-cardinality domain columns (>1000)") {
    import spark.implicits._
    val docs = (0L until 1200L).map(i => (i, s"host$i"))
      .toDF("doc_id", "host")
    val w = (0L until 1200L).map(i => s"host$i" -> 1.0 / 1200.0).toMap
    val e = intercept[IllegalArgumentException] {
      Sampling.domainMix(docs, "host", w)
    }
    assert(e.getMessage.contains("broadcast-joined factor table"))
  }
}
