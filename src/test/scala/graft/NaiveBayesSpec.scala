package graft

import org.apache.spark.sql.functions._
import graft.text.NaiveBayes

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // Even ids train, odd ids test. Training: "spam" docs say buy/cheap,
  // "ham" docs say meeting/notes.
  private def corpus = Seq(
    (0L, "spam", "buy cheap pills buy"),
    (2L, "spam", "cheap cheap deal"),
    (4L, "ham", "meeting notes agenda"),
    (6L, "ham", "notes from the meeting"),
    (1L, "spam", "buy cheap"),        // test: clearly spam vocabulary
    (3L, "ham", "meeting agenda"),    // test: clearly ham vocabulary
    (5L, "ham", "zzz qqq")            // test: all-unseen tokens
  ).toDF("doc_id", "lang", "text")

  test("trainPredict recovers the class of test docs with seen vocabulary") {
    val out = NaiveBayes.trainPredict(corpus, "lang", trainMod = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getInt(5))).toMap
    assert(out(1L)._1 == "spam" && out(1L)._2 == 1)
    assert(out(3L)._1 == "ham" && out(3L)._2 == 1)
    assert(out.size == 7) // every doc classified, including train docs
  }

  test("all-unseen doc falls back to priors + smoothing floor, deterministically") {
    val rows = NaiveBayes.trainPredict(corpus, "lang", trainMod = 2)
      .where(col("doc_id") === 5L).collect()
    assert(rows.length == 1)
    // Both classes have 2 training docs (equal priors) and 7 training
    // tokens; V=9 distinct tokens, so both floors are ln(1/16): a full
    // score tie, resolved by the deterministic label tie-break
    // ("ham" < "spam").
    assert(rows(0).getString(2) == "ham")
    val expected = // 2 tokens · round(ln(1/16)·1e6) + round(ln(2/4)·1e6)
      2L * math.round(math.log(1.0 / 16.0) * 1e6) +
        math.round(math.log(2.0 / 4.0) * 1e6)
    assert(rows(0).getLong(3) == expected)
  }

  test("score_micro is an exact integer sum (micro-quantized per token)") {
    // doc 1 "buy cheap" under spam: train counts buy=2, cheap=3 of
    // spam tot=7 tokens, V=9 → ln(3/16)+ln(4/16), prior ln(2/4)
    val r = NaiveBayes.trainPredict(corpus, "lang", trainMod = 2)
      .where(col("doc_id") === 1L).collect()(0)
    val expected =
      math.round(math.log(3.0 / 16.0) * 1e6) +
        math.round(math.log(4.0 / 16.0) * 1e6) +
        math.round(math.log(2.0 / 4.0) * 1e6)
    assert(r.getLong(3) == expected)
  }
}
