package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 retrieval over the document corpus for a fixed query set — the
  * lexical-search primitive of a training-data pipeline (query-based
  * corpus exploration, eval-set retrieval, RAG indexing). Okapi BM25
  * (Robertson & Zaragoza 2009) with the Lucene idf variant
  * `ln(1 + (N - df + 0.5)/(df + 0.5))`.
  *
  * Scale shape: the query-term table is a handful of rows and is
  * BROADCAST to the token explode, so the corpus-scale shuffle carries
  * only tokens matching some query term — the inverted-index bound; the
  * per-(doc,term) tf aggregate and per-(query,doc) score aggregate are
  * both keyed by cardinalities that grow with the match set, not the
  * corpus. Global N/avgdl are one single-row aggregate cross-joined in.
  *
  * Numeric design (the 1000-executor reproducibility contract): the only
  * transcendental, ln, is quantized once per TERM to integer
  * micro-units; each (doc, term) contribution is then one fixed-order
  * chain of IEEE divisions/multiplications rounded to integer
  * NANO-units, and the per-document score is an exact BIGINT sum —
  * order-independent across partitions and bit-replayable by any engine
  * (the DuckDB oracle mirrors the arithmetic token-for-token).
  *
  * Top-k is two-phase: a per-(query, doc_id mod 64) salt window keeps k
  * candidates per salt, then the final window ranks ≤ 64·k rows — the
  * global sort never sees more than 64·k rows per query, so a query
  * matching half the corpus cannot funnel it into one task.
  */
object Bm25 {

  /** @param queries (query_id, whitespace-tokenized query text)
    * @return (query_id, rank, doc_id, score_nanos, score), rank ≤ topK
    *         per query, ordered by (score desc, doc_id asc). */
  def search(
      spark: SparkSession,
      docs: DataFrame,
      queries: Seq[(Int, String)],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    val qterms = broadcast(
      spark.createDataFrame(
        queries.flatMap { case (qid, t) => t.split(" ").map(qid -> _) }.distinct)
        .toDF("query_id", "term"))
    val terms = qterms.select("term").distinct()

    val d = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
    // N and avgdl: integer sums (exact), one terminal division — the
    // single-row result is cross-joined (broadcast) into the score.
    val stats = d.agg(
      count(lit(1)).cast("double").as("n"),
      (sum(size(col("w"))).cast("double") /
        count(lit(1)).cast("double")).as("avgdl"))

    // Token explode pre-filtered by the broadcast term list: only words
    // that appear in some query survive to the (doc, term) shuffle.
    val tf = d
      .select(col("doc_id"), size(col("w")).cast("double").as("dl"),
        explode(col("w")).as("term"))
      .join(broadcast(terms), "term")
      .groupBy("doc_id", "term")
      .agg(max("dl").as("dl"), count(lit(1)).cast("double").as("tf"))

    // idf quantized to micro-units per term: |query terms| rows, tiny.
    val idf = tf
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      .crossJoin(stats.select("n"))
      .select(col("term"),
        round(log(lit(1.0) + (col("n") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) * lit(1000000.0)).cast("long")
          .as("idf_micro"))

    // Fixed-order contribution chain — mirrored verbatim by the oracle:
    // idf_micro * (tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))) * 1e3
    val contrib = tf
      .join(broadcast(idf), "term")
      .crossJoin(stats.select("avgdl"))
      .join(qterms, "term")
      .select(col("query_id"), col("doc_id"),
        round(col("idf_micro") *
          (col("tf") * (lit(k1) + lit(1.0)) /
            (col("tf") + lit(k1) *
              (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))) *
          lit(1000.0)).cast("long").as("contrib_nanos"))

    val scores = contrib
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib_nanos").as("score_nanos"))

    val bySalt = Window
      .partitionBy(col("query_id"), pmod(col("doc_id"), lit(64)))
      .orderBy(col("score_nanos").desc, col("doc_id").asc)
    val byQuery = Window.partitionBy("query_id")
      .orderBy(col("score_nanos").desc, col("doc_id").asc)
    scores
      .withColumn("_sr", row_number().over(bySalt))
      .where(col("_sr") <= topK)
      .withColumn("rank", row_number().over(byQuery))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_nanos"),
        (col("score_nanos") / lit(1.0e9)).as("score"))
  }
}
