package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based data curation: DSIR-style importance resampling (Xie et
  * al. 2023, "Data Selection for Language Models via Importance
  * Resampling") and a linear quality-classifier filter (the
  * fasttext-style keep/drop gate of CCNet/RefinedWeb-class pipelines).
  *
  * Numeric design: importance weights are integer-quantized
  * (`round(scale · ratio)` per feature bucket, summed as BIGINT) so the
  * per-document aggregate is exact integer arithmetic — order-independent
  * across partitions AND engines, which is what lets DuckDB gate these
  * operators value-for-value. The classifier logit is a fixed-order
  * chain of IEEE double ops mirrored verbatim by the oracle SQL.
  */
object Curation {

  /** Hashed n-gram (unigram + bigram, occurrence-weighted) bucket ids
    * for every document — the DSIR feature space. One narrow explode;
    * bucket = portable hash mod `buckets` so any engine can replay it. */
  def ngramBuckets(docs: DataFrame, buckets: Int,
      textCol: String = "text"): DataFrame = {
    val w = split(col(textCol), " ")
    val unigrams = docs.select(col("doc_id"), explode(w).as("ngram"))
    val bigrams = docs.select(col("doc_id"),
      explode(zip_with(slice(w, lit(1), greatest(size(w) - 1, lit(0))),
        slice(w, lit(2), greatest(size(w) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b))).as("ngram"))
    unigrams.unionAll(bigrams)
      .select(col("doc_id"),
        pmod(TextAnalysis.portableHash(col("ngram")), lit(buckets)).as("bucket"))
  }

  /** Per-bucket integer importance weight
    * `round(scale · p̂_target(b) / p̂_raw(b))` with add-one smoothing —
    * a `buckets`-row table (broadcast-sized at any corpus scale; the two
    * corpus passes are single hash aggregates). */
  def dsirWeights(raw: DataFrame, target: DataFrame, buckets: Int,
      scale: Double = 1e6): DataFrame = {
    val spark = raw.sparkSession
    def bucketCounts(df: DataFrame) = ngramBuckets(df, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val rawC = bucketCounts(raw)
    val tgtC = bucketCounts(target)
    val rawTot = rawC.agg(sum("cnt")).head().getLong(0).toDouble
    val tgtTot = tgtC.agg(sum("cnt")).head().getLong(0).toDouble
    spark.range(buckets).select(col("id").as("bucket"))
      .join(tgtC.withColumnRenamed("cnt", "cnt_t"), Seq("bucket"), "left")
      .join(rawC.withColumnRenamed("cnt", "cnt_r"), Seq("bucket"), "left")
      .select(col("bucket"),
        round(
          ((coalesce(col("cnt_t"), lit(0L)) + lit(1L)).cast("double") /
            lit(tgtTot + buckets)) /
          ((coalesce(col("cnt_r"), lit(0L)) + lit(1L)).cast("double") /
            lit(rawTot + buckets)) * lit(scale), 0)
          .cast("long").as("w"))
  }

  /** DSIR document scores: mean integer importance weight over the
    * document's hashed n-grams, `keep` when the mean ratio ≥ 1 (doc
    * looks at least as target-like as raw-like). Plan shape at 100 TB:
    * one narrow explode, a broadcast join against the `buckets`-row
    * weight table, one hash aggregate by doc — no corpus×corpus work. */
  def dsirScores(raw: DataFrame, target: DataFrame, buckets: Int = 1024,
      scale: Double = 1e6): DataFrame = {
    val weights = dsirWeights(raw, target, buckets, scale)
    val scored = ngramBuckets(raw, buckets)
      .join(broadcast(weights), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum("w").as("w_sum"))
      .withColumn("mean_w", col("w_sum").cast("double") / col("n_grams"))
      .withColumn("keep", col("mean_w") >= lit(scale))
    raw.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("w_sum"), lit(0L)).as("w_sum"),
        coalesce(col("mean_w"), lit(0.0)).as("mean_w"),
        coalesce(col("keep"), lit(false)).as("keep"))
  }

  /** Linear quality classifier over deterministic surface features
    * (type-token ratio, stopword ratio, mean word length, a capped
    * length signal) — the shape of a learned fasttext/logistic quality
    * gate with the weights supplied by the caller. The logit is emitted
    * raw (`keep` = logit > 0); the sigmoid is monotone so thresholding
    * the logit IS thresholding the probability, and keeping `exp` out of
    * the gate columns keeps the oracle bit-exact across libm
    * implementations. Zero shuffles — one narrow projection. */
  def qualityClassifier(docs: DataFrame, stopwords: Seq[String],
      wTtr: Double, wStop: Double, wLen: Double, wWords: Double,
      bias: Double, lenCap: Double = 64.0): DataFrame = {
    val w = split(col("text"), " ")
    val nWords = size(w).cast("double")
    val ttr = size(array_distinct(w)).cast("double") / nWords
    val stopRatio = size(filter(w,
      x => stopwords.map(s => x === lit(s)).reduce(_ || _)))
      .cast("double") / nWords
    val meanWlen = (length(col("text")).cast("double") - nWords + lit(1.0)) / nWords
    val wordsCapped = least(nWords, lit(lenCap)) / lit(lenCap)
    // fixed evaluation order — mirrored token-for-token by the oracle SQL
    val logit = lit(bias) + lit(wTtr) * ttr + lit(wStop) * stopRatio +
      lit(wLen) * meanWlen + lit(wWords) * wordsCapped
    docs.select(col("doc_id"), ttr.as("ttr"), stopRatio.as("stop_ratio"),
      meanWlen.as("mean_wlen"), logit.as("logit"), (logit > 0).as("keep"))
  }

  /** Gopher-style rule-flag quality filter (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", table A1; reference corpus-cleaning
    * intent mirrored from emiproc's category-filter surface, not code).
    * Each named heuristic becomes an explicit boolean column so a
    * pipeline can audit WHICH rule dropped a document — the operational
    * difference from a single learned score — and `keep` is their
    * conjunction. Rules are adapted to the whitespace-token corpus
    * (line-based rules become word-based):
    *
    *  - r_word_count: minWords ≤ #words ≤ maxWords
    *  - r_mean_wlen:  mean word length in [minMeanWlen, maxMeanWlen]
    *  - r_max_wlen:   longest word ≤ maxWordLen chars
    *  - r_alpha:      ≥ minAlphaFrac of words contain a letter
    *  - r_stop:       ≥ minStopHits DISTINCT stopwords present
    *  - r_ttr:        type-token ratio ≥ minTtr (duplicate-text proxy)
    *  - r_symbol:     '#'/ellipsis occurrences per word ≤ maxSymbolRatio
    *
    * Determinism: every ratio is one IEEE division of integer-valued
    * doubles and every flag an exact comparison, so any engine replays
    * the gate bit-for-bit. Zero shuffles — a single narrow projection
    * the optimizer can pipeline into the scan. */
  def gopherRules(docs: DataFrame, stopwords: Seq[String],
      minWords: Int = 10, maxWords: Int = 100000,
      minMeanWlen: Double = 3.0, maxMeanWlen: Double = 10.0,
      maxWordLen: Int = 20, minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2, minTtr: Double = 0.2,
      maxSymbolRatio: Double = 0.1): DataFrame = {
    val w = split(col("text"), " ")
    val nWords = size(w).cast("double")
    val meanWlen = (length(col("text")).cast("double") - nWords + lit(1.0)) / nWords
    val maxWlen = array_max(transform(w, x => length(x)))
    val alphaFrac = size(filter(w, x => x.rlike("[a-zA-Z]"))).cast("double") / nWords
    val stopHits = size(array_intersect(array_distinct(w),
      array(stopwords.map(lit): _*)))
    val ttr = size(array_distinct(w)).cast("double") / nWords
    val symbolRatio =
      (regexp_count(col("text"), lit("#")) +
        regexp_count(col("text"), lit("\\.\\.\\."))).cast("double") / nWords
    val flags = Seq(
      "r_word_count" -> (nWords >= minWords && nWords <= maxWords),
      "r_mean_wlen" -> (meanWlen >= minMeanWlen && meanWlen <= maxMeanWlen),
      "r_max_wlen" -> (maxWlen <= maxWordLen),
      "r_alpha" -> (alphaFrac >= minAlphaFrac),
      "r_stop" -> (stopHits >= minStopHits),
      "r_ttr" -> (ttr >= minTtr),
      "r_symbol" -> (symbolRatio <= maxSymbolRatio))
    docs.select(
      col("doc_id") +:
        flags.map { case (n, c) => c.cast("int").as(n) } :+
        flags.map(_._2).reduce(_ && _).cast("int").as("keep"): _*)
  }
}
