package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation-classifier evaluation (M73): exact ROC-AUC and a full
  * threshold sweep for the keep/drop scorers the engine trains and applies
  * (M33 linear gate, M49 Naive Bayes, M42 LM scores). A 100 TB pipeline
  * tunes its keep threshold from exactly these two artifacts — and both
  * reduce to ONE score-keyed aggregate, so the corpus is touched once no
  * matter how many thresholds are examined.
  *
  * Scale shape: `groupBy(score)` collapses the corpus to #distinct-scores
  * rows (scores are integer/quantized everywhere in the engine — µ-unit
  * logits, token counts); the cumulative windows then run on that
  * metadata-sized table with a single-partition window — bounded by score
  * cardinality, never by corpus size.
  *
  * Numeric design: AUC is the Mann–Whitney U statistic with the standard
  * tie correction (ties count ½). Emitted as an exact BIGINT fraction
  * `auc_num / auc_den` = (2U) / (2·P·N) — both engines compute identical
  * integers, and the single rounded division is IEEE-identical on
  * identical operands. The sweep's precision/recall/F1 are likewise
  * single divisions of exact counts (F1 via its 2TP/(2TP+FP+FN) form —
  * one division, no compounding).
  *
  * No reference analogue (emiproc has no classifier surface); SURVEY §2
  * M73, companion to M33/M49/M42.
  */
object Evaluation {

  /** Per-distinct-score confusion counts + cumulative tallies — the shared
    * kernel: one corpus aggregate, then windows over #scores rows.
    * Columns: score, pos (labels=1 AT this score), neg, cum_pos_below /
    * cum_neg_below (strictly below), tp/fp (predict positive at
    * threshold = this score, i.e. score ≥ t). */
  private def scoreTable(
      df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = df
      .select(col(scoreCol).cast("long").as("score"),
        col(labelCol).cast("long").as("y"))
      .groupBy("score")
      .agg(sum(col("y")).as("pos"), sum(lit(1L) - col("y")).as("neg"))
    val asc = Window.orderBy(col("score").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val desc = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("cum_pos_below", coalesce(sum("pos").over(asc), lit(0L)))
      .withColumn("cum_neg_below", coalesce(sum("neg").over(asc), lit(0L)))
      .withColumn("tp", sum("pos").over(desc))
      .withColumn("fp", sum("neg").over(desc))
  }

  /** Exact ROC-AUC (Mann–Whitney with tie correction): one row —
    * `auc_num` = 2U = Σ_s (2·pos_s·neg_below_s + pos_s·neg_s),
    * `auc_den` = 2·P·N, `auc` = round(num/den, 6), plus the P/N counts.
    * Degenerate corpora (P = 0 or N = 0) yield auc_den = 0 and a NULL
    * auc — loud, never a fabricated 0.5. */
  def aucExact(
      df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    scoreTable(df, scoreCol, labelCol)
      .agg(
        sum(lit(2L) * col("pos") * col("cum_neg_below") +
          col("pos") * col("neg")).as("auc_num"),
        sum("pos").as("n_pos"),
        sum("neg").as("n_neg"))
      .select(
        col("auc_num"),
        (lit(2L) * col("n_pos") * col("n_neg")).as("auc_den"),
        col("n_pos"), col("n_neg"),
        when(col("n_pos") * col("n_neg") === 0L, lit(null))
          .otherwise(round(col("auc_num") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))

  /** Threshold sweep: one row per distinct score t with the confusion
    * counts for the rule "keep iff score ≥ t" and exact-division
    * precision / recall / F1 (F1 = 2TP/(2TP+FP+FN) — a single division).
    * #distinct-scores rows out; the operating point for any target
    * precision/recall is a filter on this table, no corpus re-scan. */
  def thresholdSweep(
      df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val t = scoreTable(df, scoreCol, labelCol)
    val totals = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    t
      .withColumn("p_all", sum("pos").over(totals))
      .withColumn("n_all", sum("neg").over(totals))
      .select(
        col("score").as("threshold"),
        col("tp"), col("fp"),
        (col("p_all") - col("tp")).as("fn"),
        (col("n_all") - col("fp")).as("tn"),
        round(col("tp") / (col("tp") + col("fp")), 6).as("precision"),
        when(col("p_all") === 0L, lit(null))
          .otherwise(round(col("tp") / col("p_all"), 6)).as("recall"),
        round(lit(2L) * col("tp") /
          (lit(2L) * col("tp") + col("fp") + col("p_all") - col("tp")), 6)
          .as("f1"))
  }
}
