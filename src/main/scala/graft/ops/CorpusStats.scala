package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M13 — per-group corpus length distributions, in two variants:
  *
  *  - [[exact]]: Spark's exact `percentile` (shares DuckDB
  *    `quantile_cont`'s linear-interpolation definition, so the gate
  *    hash-matches even interpolated values). Exact percentiles hold
  *    the full value multiset per group — fine at gate scale, the
  *    WRONG choice at 100 TB.
  *  - [[approx]]: `approx_percentile` (Spark's t-digest-style QDigest
  *    sketch) — bounded memory per group regardless of corpus size,
  *    mergeable map-side, rank error ≤ 1/accuracy. THE 100 TB path;
  *    the spec bounds its drift against [[exact]] on skewed data.
  */
object CorpusStats {

  private def aggs(valueCol: String, p50: org.apache.spark.sql.Column,
      p90: org.apache.spark.sql.Column) = Seq(
    count(lit(1)).as("n_docs"),
    min(valueCol).as("min_chars"),
    p50.as("p50_chars"),
    p90.as("p90_chars"),
    max(valueCol).as("max_chars"),
    sum(valueCol).as("total_chars"))

  /** Exact per-group distribution (gate variant). */
  def exact(docs: DataFrame, groupCol: String = "lang",
      valueCol: String = "n_chars"): DataFrame = {
    val a = aggs(valueCol,
      expr(s"percentile($valueCol, 0.5)"),
      expr(s"percentile($valueCol, 0.9)"))
    docs.groupBy(groupCol).agg(a.head, a.tail: _*)
  }

  /** Sketch-based distribution (scale variant); `accuracy` trades
    * memory for rank error exactly like the reference's pandas
    * `.quantile` → dask/approx swap would. */
  def approx(docs: DataFrame, groupCol: String = "lang",
      valueCol: String = "n_chars", accuracy: Int = 10000): DataFrame = {
    val a = aggs(valueCol,
      expr(s"approx_percentile($valueCol, 0.5, $accuracy)"),
      expr(s"approx_percentile($valueCol, 0.9, $accuracy)"))
    docs.groupBy(groupCol).agg(a.head, a.tail: _*)
  }

  /** Population stability index between two corpus snapshots — the
    * standard drift monitor a data pipeline runs before accepting a new
    * crawl/refresh into an established mix (PSI < 0.1 stable, > 0.25
    * drifted; the credit-scoring metric adopted wholesale by MLOps).
    * Both snapshots are bucketed by `bucketExpr` (any deterministic
    * integer feature: length decile, quality band, lang id);
    * per-bucket contribution (p_a − p_b)·ln(p_a/p_b) with add-one
    * smoothing is quantized to integer micro-units — the per-bucket
    * BIGINT is exact and order-independent, and PSI is their sum.
    *
    * Scale shape: one bucket-keyed count aggregate per snapshot
    * (map-side combined), then arithmetic on #buckets rows with the
    * two totals broadcast — nothing corpus-sized moves after the
    * counts. */
  def psiDrift(
      snapA: DataFrame,
      snapB: DataFrame,
      bucketExpr: String): DataFrame = {
    def counts(df: DataFrame, as: String) =
      df.select(expr(bucketExpr).cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(as))
    val a = counts(snapA, "n_a")
    val b = counts(snapB, "n_b")
    val joined = a.join(b, Seq("bucket"), "full")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = joined.agg(
      sum("n_a").as("tot_a"), sum("n_b").as("tot_b"),
      count(lit(1)).as("k")) // single row — broadcast
    joined.crossJoin(broadcast(totals))
      // add-one smoothing keeps empty buckets finite; p uses the
      // smoothed totals so probabilities still sum to 1
      .withColumn("p_a",
        (col("n_a") + 1).cast("double") / (col("tot_a") + col("k")))
      .withColumn("p_b",
        (col("n_b") + 1).cast("double") / (col("tot_b") + col("k")))
      .select(col("bucket"), col("n_a"), col("n_b"),
        round((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b"))
          * lit(1000000.0)).cast("long").as("psi_contrib_micro"))
  }

  /** Corpus snapshot diff — the dataset-versioning primitive: given two
    * snapshots keyed by doc_id, classify every id as `added` (new side
    * only), `removed` (old side only), `changed` (both, text differs)
    * or `unchanged`. Presence is tracked by explicit marker columns,
    * NOT text nullability — a document whose text is legitimately NULL
    * is still "present", and NULL-vs-NULL text compares as unchanged
    * via null-safe equality (`<=>`). Text comparison is direct string
    * equality inside the join (no cross-engine hash dependence). One
    * full-outer equi-join on doc_id — both sides shuffle once on the
    * key whose cardinality grows with the corpus; no hot keys (ids
    * unique per side).
    *
    * Output: (doc_id, status, old_len, new_len) — length -1 when the
    * side is absent (or its text is NULL), so size-drift accounting
    * needs no null handling. */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val a = oldDocs.select(col("doc_id"), col("text").as("_old"),
      lit(true).as("_in_old"))
    val b = newDocs.select(col("doc_id"), col("text").as("_new"),
      lit(true).as("_in_new"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(!(col("_old") <=> col("_new")), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(length(col("_old")).cast("long"), lit(-1L)).as("old_len"),
        coalesce(length(col("_new")).cast("long"), lit(-1L)).as("new_len"))
  }

  /** Corpus release manifest (M65) — the reproducibility artifact a
    * dataset release ships next to its shards: per content-stable shard
    * (`pmod(portableHash(text), shards)` — re-runs of the same corpus
    * certify the same partition), the doc/token/char counts, the doc_id
    * range for completeness auditing, and an ORDER-INDEPENDENT content
    * checksum: `sum(portableHash(text))`. Addition is commutative, so
    * any execution order, partitioning, or engine yields the same
    * BIGINT — a consumer re-derives it shard-locally and detects any
    * dropped/duplicated/mutated document without ordering guarantees.
    * One map-side-combined aggregate; #shards output rows. Checksum
    * overflow bound: hashes < 10⁹ ⇒ safe below ~9·10⁹ docs/shard. */
  def releaseManifest(docs: DataFrame, shards: Int = 8): DataFrame = {
    val h = graft.functions.PortableHashExpr.portableHash(col("text"))
    docs.select(col("doc_id"), col("text"), h.as("_h"))
      .withColumn("shard", pmod(col("_h"), lit(shards.toLong)))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        sum(col("_h")).as("checksum"),
        min("doc_id").as("min_doc_id"),
        max("doc_id").as("max_doc_id"))
  }
}
