package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{BpeEncodeExpr, BpeKernel, BpeTable}

/** Byte-pair-encoding tokenizer (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the real-merge-table upgrade over [[TextAnalysis.tokenCounts]]'
  * BPE-ish regex estimate, and a first-class training-data-pipeline
  * operator (tokenize-for-LLM is the last step of every curation run).
  *
  * Scale shape (the part that must survive 100 TB):
  *
  *  - Corpus-side work is ONE distributed word-histogram aggregate
  *    ([[wordCounts]]) — a single shuffle whose output is
  *    vocabulary-sized, not corpus-sized (Zipf: a 100 TB crawl has
  *    billions of documents but ~10⁷ distinct words after `minCount`
  *    pruning, the standard subword-nmt `--min-frequency` knob).
  *  - Training then runs over the histogram on the driver with the
  *    classic incremental pair-index algorithm ([[trainFromHistogram]]):
  *    a lazy max-heap of pair counts plus a pair→words inverted index,
  *    so each merge touches only the words containing the merged pair —
  *    O(vocab · wordLen) total updates across all merges, NOT
  *    O(merges · vocab). A 10⁷-type histogram × 50k merges is minutes,
  *    and never touches the corpus again.
  *  - Encoding is corpus-side but embarrassingly parallel: the learned
  *    table ships inside a codegen'd native `Expression`
  *    ([[graft.functions.BpeEncodeExpr]] — no UDF boxing, stays in
  *    whole-stage codegen) with a per-executor word→tokens memo, so the
  *    Zipf head of every partition encodes via hash lookup.
  *
  * Determinism contract (required by the correctness gate): ties on
  * pair count break toward the lexicographically smallest (left, right)
  * pair. The reference implementation's `max(dict)` tie-break is
  * insertion-order-dependent; ours is total, so the same corpus always
  * learns the same merges on any cluster layout.
  */
object Bpe {

  type Merge = (String, String)

  /** Distributed word histogram — the only corpus-sized pass in
    * training. `minCount` drops the long tail (hapax legomena cannot
    * win a merge against the head in practice and dominate histogram
    * size; pruning them is the standard trainer memory bound — note it
    * DOES perturb counts vs. an unpruned train, so the default keeps
    * everything). */
  def wordCounts(docs: DataFrame, textCol: String = "text",
      minCount: Long = 1L): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)

  /** Learn `numMerges` merges from a corpus. The histogram must fit on
    * the driver (`maxVocabRows` guard — raise `minCount` if it fires;
    * the histogram is vocabulary-, not corpus-, sized). */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 1L, maxVocabRows: Int = 5000000): Seq[Merge] = {
    val hist = wordCounts(docs, textCol, minCount)
      .limit(maxVocabRows + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    require(hist.size <= maxVocabRows,
      s"word histogram exceeds maxVocabRows=$maxVocabRows; " +
        "raise minCount to prune the tail")
    trainFromHistogram(hist, numMerges)
  }

  /** Incremental trainer over a (word, count) histogram: pair counts
    * maintained under a lazy max-heap (push-on-update, discard stale
    * entries on pop) and a pair→word-indices inverted index, so each
    * merge re-counts only the words it touches. Stops early when no
    * pair is left (fully merged corpus). */
  def trainFromHistogram(hist: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val words: Array[Array[String]] =
      hist.map { case (w, _) => symbolize(w) }.toArray
    val wcnt: Array[Long] = hist.map(_._2).toArray

    val pairCnt = mutable.HashMap.empty[Merge, Long]
    val pairWords = mutable.HashMap.empty[Merge, mutable.HashSet[Int]]
    // Max-heap popping (highest count, then lexicographically SMALLEST
    // pair): reverse string comparison so the smaller pair is "greater".
    val ord: Ordering[(Long, String, String)] = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val l = b._2.compareTo(a._2)
          if (l != 0) l else b._3.compareTo(a._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)

    def bump(p: Merge, delta: Long, wi: Int, add: Boolean): Unit = {
      val n = pairCnt.getOrElse(p, 0L) + delta
      if (n <= 0L) { pairCnt.remove(p); pairWords.remove(p) }
      else {
        pairCnt(p) = n
        val set = pairWords.getOrElseUpdate(p, mutable.HashSet.empty[Int])
        if (add) set += wi
        heap.enqueue((n, p._1, p._2))
      }
    }

    var wi = 0
    while (wi < words.length) {
      val s = words(wi)
      var i = 0
      while (i < s.length - 1) {
        bump((s(i), s(i + 1)), wcnt(wi), wi, add = true); i += 1
      }
      wi += 1
    }

    val merges = mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.length < numMerges && !done) {
      // pop until a live entry (count matches the current map) surfaces
      var best: Merge = null
      while (best == null && heap.nonEmpty) {
        val (c, l, r) = heap.dequeue()
        if (pairCnt.getOrElse((l, r), 0L) == c) best = (l, r)
      }
      if (best == null) done = true
      else {
        merges += best
        val touched = pairWords.get(best).map(_.toArray).getOrElse(Array.empty)
        touched.foreach { t =>
          val old = words(t)
          val merged = BpeKernel.mergePair(old, best._1, best._2)
          if (merged ne old) {
            var i = 0
            while (i < old.length - 1) {
              bump((old(i), old(i + 1)), -wcnt(t), t, add = false); i += 1
            }
            i = 0
            while (i < merged.length - 1) {
              bump((merged(i), merged(i + 1)), wcnt(t), t, add = true); i += 1
            }
            words(t) = merged
          }
        }
        // the merged pair itself must be gone for every word we touched
        pairCnt.remove(best); pairWords.remove(best)
      }
    }
    merges.toSeq
  }

  /** Reference trainer — full pair recount every iteration, same
    * tie-break. O(merges · vocab · wordLen); exists to cross-check
    * [[trainFromHistogram]] in BpeSpec, and as the readable spec of the
    * algorithm. */
  def trainNaive(hist: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    var words: Array[Array[String]] =
      hist.map { case (w, _) => symbolize(w) }.toArray
    val wcnt = hist.map(_._2).toArray
    val merges = mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.length < numMerges && !done) {
      val cnt = mutable.HashMap.empty[Merge, Long]
      var wi = 0
      while (wi < words.length) {
        val s = words(wi)
        var i = 0
        while (i < s.length - 1) {
          val p = (s(i), s(i + 1))
          cnt(p) = cnt.getOrElse(p, 0L) + wcnt(wi); i += 1
        }
        wi += 1
      }
      if (cnt.isEmpty) done = true
      else {
        val best = cnt.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        words = words.map(s => BpeKernel.mergePair(s, best._1, best._2))
      }
    }
    merges.toSeq
  }

  private def symbolize(w: String): Array[String] = {
    val a = new Array[String](w.length + 1)
    var i = 0
    while (i < w.length) { a(i) = String.valueOf(w.charAt(i)); i += 1 }
    a(w.length) = BpeTable.Eow
    a
  }

  /** `array<string>` of BPE tokens for a whitespace-tokenized text
    * column under a learned merge table (codegen'd native kernel). */
  def encode(text: Column, merges: Seq[Merge]): Column =
    BpeEncodeExpr.bpeEncode(text, BpeTable(merges))

  /** Inverse of [[encode]] for any valid token stream: concatenate and
    * turn end-of-word markers back into spaces. `decode(encode(t)) = t`
    * for single-space-separated text — the gate's round-trip oracle. */
  def decode(tokens: Column): Column =
    rtrim(regexp_replace(concat_ws("", tokens), BpeTable.Eow, " "))

  /** Per-document token count + compression ratio under the table —
    * the fertility numbers a tokenizer eval reports. */
  def tokenStats(docs: DataFrame, merges: Seq[Merge],
      textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        size(encode(col(textCol), merges)).cast("long").as("n_bpe_tokens"),
        length(col(textCol)).cast("long").as("n_chars"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("n_bpe_tokens"))
}
