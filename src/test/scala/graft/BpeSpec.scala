package graft

import graft.functions.{BpeKernel, BpeTable}
import graft.text.Bpe
import org.apache.spark.sql.functions._

/** BPE trainer + encoder vs the hand-worked Sennrich et al. 2016 §3.2
  * example corpus {low:5, lower:2, newest:6, widest:3}. Every merge
  * below is derived by hand from the weighted pair counts under the
  * library's deterministic tie-break (highest count, then
  * lexicographically smallest pair) — an independent oracle for the
  * training algorithm, not a regression pin. */
class BpeSpec extends SparkSpec {

  private val hist = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  /** Hand-derived: counts after each merge recomputed on paper.
    * r0: es 9 (ties st 9, t</w> 9 → lexicographic), r1: est 9,
    * r2: est</w> 9, r3: lo 7 (ties ow 7), r4: low 7, r5: ew 6
    * (ties ne 6, w-est</w> 6), r6: ewest</w> 6, r7: newest</w> 6,
    * r8: low</w> 5, r9: dest</w> 3 (ties id 3, wi 3). */
  private val handMerges = Seq(
    ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    ("e", "w"), ("ew", "est</w>"), ("n", "ewest</w>"), ("low", "</w>"),
    ("d", "est</w>"))

  test("trainNaive matches the hand-worked Sennrich example") {
    assert(Bpe.trainNaive(hist, 10) === handMerges)
  }

  test("incremental trainer equals the naive recount trainer") {
    assert(Bpe.trainFromHistogram(hist, 10) === handMerges)
    // larger deterministic histogram (LCG-generated words): the two
    // trainers must agree merge-for-merge until the corpus runs dry
    var seed = 12345L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); seed >>> 33 }
    val alpha = "abcdef"
    val big = (0 until 300).map { _ =>
      val len = 2 + (next() % 7).toInt
      val w = (0 until len).map(_ => alpha((next() % alpha.length).toInt)).mkString
      w -> (1L + next() % 50)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val n = Bpe.trainNaive(big, 80)
    val i = Bpe.trainFromHistogram(big, 80)
    assert(i === n)
  }

  test("trainer stops early when the corpus is fully merged") {
    val m = Bpe.trainNaive(Seq("ab" -> 3L), 100)
    // a+b+</w>: 2 merges exhaust the word
    assert(m.length === 2)
    assert(Bpe.trainFromHistogram(Seq("ab" -> 3L), 100) === m)
  }

  test("encodeWord applies merges greedily by learned rank") {
    val t = BpeTable(handMerges)
    assert(BpeKernel.encodeWord(t, "lowest").toSeq === Seq("low", "est</w>"))
    assert(BpeKernel.encodeWord(t, "low").toSeq === Seq("low</w>"))
    assert(BpeKernel.encodeWord(t, "lower").toSeq === Seq("low", "e", "r", "</w>"))
    assert(BpeKernel.encodeWord(t, "newest").toSeq === Seq("newest</w>"))
    assert(BpeKernel.encodeWord(t, "widest").toSeq === Seq("w", "i", "dest</w>"))
    // unseen symbols pass through as characters
    assert(BpeKernel.encodeWord(t, "xyz").toSeq === Seq("x", "y", "z", "</w>"))
  }

  test("mergePair merges every occurrence left-to-right, non-overlapping") {
    assert(BpeKernel.mergePair(Array("a", "a", "a", "a", "</w>"), "a", "a").toSeq
      === Seq("aa", "aa", "</w>"))
    assert(BpeKernel.mergePair(Array("a", "a", "a", "</w>"), "a", "a").toSeq
      === Seq("aa", "a", "</w>"))
    val same = Array("x", "y")
    assert(BpeKernel.mergePair(same, "a", "b") eq same)
  }

  test("overlapping pairs count with multiplicity in training") {
    // "aaaa":2 → (a,a) occurs 3× per word, count 6, beats (a,</w>) 2;
    // merging yields aa,aa,</w>. Then (aa,aa) ties (aa,</w>) at 2 and
    // "</w>" < "aa" lexicographically ('<' = 0x3C) → (aa,</w>) wins.
    val m = Bpe.trainNaive(Seq("aaaa" -> 2L), 3)
    assert(m.head === ("a", "a"))
    assert(m(1) === ("aa", "</w>"))
    assert(Bpe.trainFromHistogram(Seq("aaaa" -> 2L), 3) === m)
  }

  test("DataFrame encode/decode round-trips and matches the kernel") {
    import spark.implicits._
    val docs = Seq((0L, "low lower newest"), (1L, "widest low low"))
      .toDF("doc_id", "text")
    val enc = docs.select(col("doc_id"),
      Bpe.encode(col("text"), handMerges).as("toks"))
    val rows = enc.orderBy("doc_id").collect()
    assert(rows(0).getSeq[String](1) ===
      Seq("low</w>", "low", "e", "r", "</w>", "newest</w>"))
    assert(rows(1).getSeq[String](1) ===
      Seq("w", "i", "dest</w>", "low</w>", "low</w>"))
    val dec = enc.select(col("doc_id"), Bpe.decode(col("toks")).as("d"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(dec === Array("low lower newest", "widest low low"))
  }

  test("train end-to-end over a DataFrame corpus") {
    import spark.implicits._
    val docs = Seq(
      "low low low low low", "lower lower",
      "newest newest newest newest newest newest", "widest widest widest")
      .toDF("text")
    assert(Bpe.train(docs, "text", 10) === handMerges)
  }

  test("roundtrip property: decode(encode(t)) = t on random corpora, any table") {
    import spark.implicits._
    var seed = 777L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); seed >>> 33 }
    val alpha = "abcdeé中ß" // includes non-ASCII symbols
    val docs = (0L until 40L).map { id =>
      val nw = 1 + (next() % 8).toInt
      val text = (0 until nw).map { _ =>
        (0 until 1 + (next() % 6).toInt)
          .map(_ => alpha((next() % alpha.length).toInt)).mkString
      }.mkString(" ")
      (id, text)
    }
    val df = docs.toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", 25)
    val out = df.select(col("doc_id"),
        Bpe.decode(Bpe.encode(col("text"), merges)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, t) => assert(out(id) === t, s"doc $id") }
  }

  test("empty corpus and empty merge table degrade gracefully") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Bpe.train(empty, "text", 10) === Seq.empty)
    // empty table: encode splits to chars + </w>
    val enc = Seq((1L, "ab c")).toDF("doc_id", "text")
      .select(Bpe.encode(col("text"), Seq.empty).as("t"))
      .collect()(0).getSeq[String](0)
    assert(enc === Seq("a", "b", "</w>", "c", "</w>"))
  }

  test("tokenStats counts tokens under the learned table") {
    import spark.implicits._
    val docs = Seq((7L, "newest widest")).toDF("doc_id", "text")
    val r = Bpe.tokenStats(docs, handMerges).collect().head
    assert(r.getLong(1) === 4L) // [newest</w>] + [w,i,dest</w>]
    assert(r.getLong(2) === 13L)
    assert(r.getDouble(3) === 13.0 / 4.0)
  }
}
