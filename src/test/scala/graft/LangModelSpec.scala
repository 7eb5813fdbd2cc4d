package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.LangModel

/** M42 stupid-backoff LM scoring, M43 intra-doc chunk dedup, M44
  * incremental cross-corpus dedup. */
class LangModelSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  // ---- M43 intraDocDedup -------------------------------------------------

  test("intraDocDedup drops later repeats of a chunk within one doc") {
    val out = Dedup.intraDocDedup(docs(
      (1L, "a b c a b c d e f"), // chunks [a b c][a b c][d e f]
      (2L, "x y z u v w")), chunkWords = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("a b c d e f", 3L, 1L)))
    assert(out(2L) == (("x y z u v w", 2L, 0L)))
  }

  test("intraDocDedup keeps first occurrence order; partial tail chunk") {
    // 7 words, c=3 → [p q r][p q r][p]; trailing partial chunk "p" is its
    // own chunk and differs from "p q r", so it survives
    val out = Dedup.intraDocDedup(docs((1L, "p q r p q r p")), chunkWords = 3)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).head
    assert(out == (("p q r p", 3L, 1L)))
  }

  test("intraDocDedup is shuffle-free (no Exchange in the plan)") {
    val plan = Dedup.intraDocDedup(
      Tables.documents(spark, "/root/testdata/sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  // ---- M42 bigramScore ---------------------------------------------------

  test("bigramScore: seen bigram, unigram backoff, and OOV floor") {
    // train slice = even ids: doc 0 "a b a b" → c(a,b)=2 c(b,a)=1,
    // ca: a=2 b=1; unigrams a=2 b=2; N=4
    val out = LangModel.bigramScore(docs(
      (0L, "a b a b"),
      (1L, "a b x"), // (a,b) seen s=1 → 0; (b,x) OOV s=0.4/5 → ln=-2.5257286
      (3L, "b b"),   // (b,b) unseen, b seen: s=0.4*2/4=0.2 → ln=-1.6094379
      (5L, "z")),    // no bigrams
      trainMod = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(out(0L) == ((3L, 0L, 0L, 1)))            // all s=1 → lp 0
    assert(out(1L) == ((2L, 1L, -2525729L, 1)))     // round(ln(0.08)*1e6)
    assert(out(3L) == ((1L, 1L, -1609438L, 1)))     // round(ln(0.2)*1e6)
    assert(out(5L) == ((0L, 0L, 0L, 1)))
  }

  test("bigramScore keep flag compares integer sums against threshold·n") {
    // threshold avg ln p ≥ -2: doc 1's avg is -2525729/2 ≈ -1.26e6 ≥ -2e6
    // (keep), doc 3's is -1609438 ≥ -2e6 (keep) — then a tight -1.2e6
    // threshold flips doc 1 but not doc 3's? -1609438 < -1200000 → drop.
    val out = LangModel.bigramScore(docs(
      (0L, "a b a b"), (1L, "a b x"), (3L, "b b")),
      trainMod = 2, keepAvgLogpMicro = -1200000L)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out(0L) == 1)
    assert(out(1L) == 0) // -2525729 < -1200000*2 = -2400000
    assert(out(3L) == 0) // -1609438 < -1200000
  }

  test("bigramScore: no cartesian product; only the 1-row N cross join") {
    // The vocab count tables may be BROADCAST when small (size-based
    // planning — the CCNet setup where the reference LM is tiny) or
    // shuffled when large; what must never appear is a cartesian
    // product, and the only nested-loop join allowed is the single-row
    // token-total crossJoin.
    val plan = LangModel.bigramScore(
      Tables.documents(spark, "/root/testdata/sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nlj <= 1, s"expected at most the 1-row N crossJoin, got $nlj:\n$plan")
  }

  // ---- M44 incrementalDedup ----------------------------------------------

  test("incrementalDedup classifies exact, near, and new docs") {
    // "a b a b a" and "a b a b a b" have IDENTICAL 3-gram shingle SETS
    // ({a b a, b a b}) → all minhash bands agree → candidate guaranteed,
    // jaccard exactly 1.0, but texts differ → near_dup not exact_dup.
    val existing = docs(
      (0L, "a b a b a"),
      (2L, "completely different text entirely here now"))
    val incoming = docs(
      (1L, "a b a b a b"),  // near dup of 0
      (3L, "a b a b a"),    // exact dup of 0
      (5L, "unrelated fresh content with nothing shared at all"))
    val out = Dedup.incrementalDedup(spark, existing, incoming)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.size == 3)
    assert(out(3L) == (("exact_dup", 0L, 1.0)))
    assert(out(1L) == (("near_dup", 0L, 1.0)))
    assert(out(5L) == (("new", -1L, 0.0)))
  }

  // ---- M46 corpusSimilarity ----------------------------------------------

  test("corpusSimilarity: identical shingle sets → 1.0, disjoint → 0.0") {
    val df = spark.createDataFrame(Seq(
      (0L, "a b c d e", "s1"),
      (1L, "a b c d e", "s2"),   // same shingles as s1 → all slots agree
      (2L, "p q r s t", "s3")))  // disjoint vocabulary
      .toDF("doc_id", "text", "source")
    val out = Dedup.corpusSimilarity(spark, df)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(out(("s1", "s2")) == 1.0)
    assert(out(("s1", "s3")) == 0.0)
    assert(out(("s2", "s3")) == 0.0)
    assert(out.size == 3)
  }

  test("incrementalDedup: exact beats near; smallest existing id wins") {
    // incoming 1 is an exact copy of BOTH 0 and 4 → match_id = min = 0
    val existing = docs((0L, "same text here okay"), (4L, "same text here okay"))
    val incoming = docs((1L, "same text here okay"))
    val out = Dedup.incrementalDedup(spark, existing, incoming)
      .collect().map(r => (r.getString(1), r.getLong(2))).head
    assert(out == (("exact_dup", 0L)))
  }
}
