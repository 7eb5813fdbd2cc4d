package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn the near-duplicate PAIR list
  * (from [[Dedup.verifiedNearDups]] / [[graft.similarity.Similarity]])
  * into per-document cluster assignments — the final step of a
  * production dedup pipeline, where each cluster keeps one canonical
  * document and drops the rest.
  *
  * Algorithm: iterative min-label propagation (the standard
  * connected-components-by-message-passing on Spark — cf. the
  * large-star/small-star formulation of Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14). Each round every node
  * adopts the minimum label among itself and its neighbors; the fixpoint
  * label of a node is the minimum doc_id of its component, which we use
  * directly as the canonical/cluster id.
  *
  * Scale design: one shuffle per round (an aggregate keyed by node id
  * after an edge join), rounds bounded by the component DIAMETER — for
  * near-dup clusters (dense cliques-ish, diameter ~1-3) a handful of
  * rounds suffices; `maxIter` is a hard stop. Labels and edges are
  * persisted per round and the previous round unpersisted, so lineage
  * stays O(1) instead of growing per iteration (the classic iterative-
  * Spark trap). Convergence is detected with a bounded single-row
  * aggregate (sum of labels strictly decreases until fixpoint), not a
  * full collect.
  */
object Clustering {

  /** Connected components over an undirected pair list.
    *
    * @param pairs DataFrame with two long columns naming the endpoints
    *              (defaults `doc_a`/`doc_b`), one row per edge.
    * @return (doc_id, cluster_id) — one row per node that appears in
    *         any pair; cluster_id = min doc_id of the component.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxIter: Int = 20): DataFrame = {
    // Symmetric edge list, persisted once — reused every round.
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val edges = graft.Caching.cache(
      fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst"))).distinct())

    // localCheckpoint (eager) TRUNCATES LINEAGE each round — the labels
    // plan references itself twice per iteration (join side + union
    // side), so without truncation the logical plan doubles every round
    // (exponential analysis cost, stack overflow by ~10 rounds). On a
    // real cluster use spark.sparkContext.setCheckpointDir + .checkpoint
    // for fault tolerance; locally the memory-backed variant suffices.
    //
    // Initialization IS propagation round 1: each node starts from the
    // min over itself and its direct neighbors (one aggregate on the
    // edge list — no extra shuffle vs a plain-self init, which would
    // need the same groupBy to dedup nodes). Near-dup components are
    // near-cliques, so most of the graph is already at fixpoint here
    // and the loop usually runs a single confirming round.
    var labels = edges
      .groupBy(col("src").as("doc_id"))
      .agg(least(col("src"), min("dst")).as("label"))
      .localCheckpoint()
    var prevSum = labels.agg(sum("label")).head().getLong(0)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighbor labels flow along edges; keep the min of (own, neighbors)
      val next = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst").as("doc_id"), col("label"))
        .unionByName(labels)
        .groupBy("doc_id")
        .agg(min("label").as("label"))
        .localCheckpoint()
      val nextSum = next.agg(sum("label")).head().getLong(0)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    graft.Caching.release(edges)
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** Full-corpus dedup assignment: every document mapped to its
    * near-dup cluster id (documents in no pair form singleton clusters
    * of themselves), plus the cluster size and a keep/drop flag —
    * `keep = 1` exactly for the canonical (minimum-id) member. The
    * typical 100 TB composition is
    * `dedupAssign(docs, verifiedNearDups(...))` followed by
    * `where(col("keep") === 1)`. */
  def dedupAssign(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
    val assigned = docs
      .select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val byCluster = Window.partitionBy("cluster_id")
    assigned
      .withColumn("cluster_size", count(lit(1)).over(byCluster))
      .withColumn("keep",
        (col("doc_id") === min("doc_id").over(byCluster)).cast("int"))
  }
}
