package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model document scoring — the CCNet/KenLM-style
  * perplexity filter (Wenzek et al. 2020 train a 5-gram KenLM on clean
  * text and drop documents whose perplexity is too high; Brants et al.
  * 2007 define the "stupid backoff" score this implements). A bigram
  * model is trained on a deterministic slice of the corpus (the
  * stand-in for the clean reference corpus — in production the trained
  * count tables are persisted once and reused across scoring runs) and
  * every document is scored by its summed bigram log-probability.
  *
  * Stupid backoff, S(w₂|w₁):
  *   - c(w₁w₂) > 0 →  c(w₁w₂) / c(w₁)
  *   - else, w₂ seen →  0.4 · c(w₂) / N
  *   - else →  0.4 / (N + 1)        (out-of-vocabulary floor)
  *
  * Numeric portability: each bigram instance's log-score is quantized to
  * integer MICRO-units (`round(ln(S)·10⁶)`, the same device as
  * [[Bm25]]), so the per-document score is an exact BIGINT sum —
  * order-independent across 1000 executors and engine-portable for the
  * DuckDB hash gate. The keep decision compares integer sums
  * (`sum ≥ threshold · n`), never floating averages.
  *
  * Scale shape: token/bigram explodes are narrow; the three count
  * aggregates are keyed by vocabulary-scale n-grams (balanced, grows
  * with the corpus); scoring joins are keyed the same way. The trained
  * tables are vocabulary-sized — when the reference corpus is small
  * (the CCNet setup) AQE broadcasts them; nothing corpus-sized is ever
  * broadcast. One final per-doc aggregate.
  */
object LangModel {

  /** Per-instance bigram pairs (w1, w2) of a docs frame — one narrow
    * zip+explode, no shuffle. */
  private def bigramPairs(docs: DataFrame): DataFrame = {
    val w = TextAnalysis.words(col("text"))
    docs.select(
      col("doc_id"),
      explode(zip_with(
        slice(w, lit(1), greatest(size(w) - 1, lit(0))),
        slice(w, lit(2), greatest(size(w) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Train on `doc_id % trainMod == 0`, score every document.
    *
    * @param keepAvgLogpMicro keep threshold on the AVERAGE per-bigram
    *        log-prob in micro-units (e.g. -8_000_000 = mean ln p ≥ -8);
    *        compared as `sum ≥ threshold · n` in exact integers.
    * @return (doc_id, n_bigrams, n_backoff, logp_micro_sum, keep) —
    *         one row per input doc; docs with no bigram score 0 / keep 1.
    */
  def bigramScore(
      docs: DataFrame,
      trainMod: Int = 2,
      keepAvgLogpMicro: Long = -8000000L): DataFrame = {
    val w = TextAnalysis.words(col("text"))
    val train = docs.where(col("doc_id") % trainMod === 0)
    val trainBg = graft.Caching.cache(bigramPairs(train))
    val bigramCounts = trainBg.groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
    // history count c(w1) = occurrences of w1 as a left context — the
    // denominator stupid backoff uses (equals the bigram-table row sums,
    // aggregated here directly from the pair stream)
    val leftCounts = trainBg.groupBy("w1").agg(count(lit(1)).as("ca"))
    val unigramCounts = train
      .select(explode(w).as("w2"))
      .groupBy("w2").agg(count(lit(1)).as("cw"))
    // N = total trained tokens; single row, broadcast
    val nTokens = train.select(sum(size(w)).cast("double").as("n"))
    val scored = bigramPairs(docs)
      .join(bigramCounts, Seq("w1", "w2"), "left")
      .join(leftCounts, Seq("w1"), "left")
      .join(unigramCounts, Seq("w2"), "left")
      .crossJoin(broadcast(nTokens))
      .withColumn("s",
        when(col("cab").isNotNull, col("cab") / col("ca"))
          .when(col("cw").isNotNull, lit(0.4) * col("cw") / col("n"))
          .otherwise(lit(0.4) / (col("n") + lit(1.0))))
      .select(
        col("doc_id"),
        round(log(col("s")) * lit(1000000.0)).cast("long").as("lp"),
        col("cab"))
    val perDoc = scored.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"),
      sum(when(col("cab").isNull, 1L).otherwise(0L)).as("n_backoff"),
      sum("lp").as("logp_micro_sum"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_backoff"), lit(0L)).as("n_backoff"),
        coalesce(col("logp_micro_sum"), lit(0L)).as("logp_micro_sum"))
      .withColumn("keep",
        (col("logp_micro_sum") >= lit(keepAvgLogpMicro) * col("n_bigrams"))
          .cast("int"))
  }
}
