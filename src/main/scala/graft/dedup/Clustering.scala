package graft.dedup

import org.apache.spark.sql.DataFrame
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
  * Scale design: two shuffles per round (edge-hop aggregate keyed by
  * node id, then a pointer-doubling self-join), rounds bounded by the
  * LOG of the component diameter — near-dup clusters (dense
  * cliques-ish) converge in 1-2 rounds, adversarial chains in
  * log₂(diameter). Lineage is truncated per round with localCheckpoint
  * (the classic iterative-Spark trap is plan growth, not data), and
  * convergence is detected with a bounded single-row aggregate (the
  * label sum strictly decreases until fixpoint), never a collect.
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
      maxIter: Int = 20,
      driverEdgeLimit: Long = 200000L): DataFrame = {
    val spark = pairs.sparkSession
    // The pair list is cached before branching: counting it and then
    // re-reading it must not recompute the (often expensive) upstream
    // candidate pipeline.
    // cast("long") up front: integer doc-id columns must behave the same
    // on the driver union-find path (row.getLong) as on the distributed
    // path (where Spark would widen them implicitly in joins anyway)
    val p = graft.Caching.cache(pairs.select(
      col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")))
    val nEdges = p.count()

    // ADAPTIVE small-graph path: near-dup edge lists are usually TINY
    // relative to the corpus (pairs survive LSH banding + verification),
    // so below `driverEdgeLimit` edges (~a few MB of longs) a
    // driver-side union-find with path compression answers in
    // milliseconds, where each distributed round costs several Spark
    // jobs of fixed latency. Exact same result: union always attaches
    // the larger root under the smaller, so every component's final
    // root IS its minimum doc_id. The distributed pointer-doubling loop
    // below remains the path for real graphs (ScaleBench B9: 8M edges)
    // and is what a 100 TB corpus takes; set driverEdgeLimit = 0 to
    // force it (the specs pin both paths against each other).
    if (nEdges <= driverEdgeLimit) {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      p.collect().foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val labels = parent.keys.toSeq.sorted.map(k => (k, find(k)))
      graft.Caching.release(p)
      return spark.createDataFrame(labels).toDF("doc_id", "cluster_id")
    }

    // Symmetric edge list, persisted once — reused every round. `rev`
    // is a projection of the cached `p`, which is exactly the
    // "plan unioned with a projection of itself" shape Catalyst's
    // union-constraint rewriting cannot analyze on a LAZY plan — it is
    // safe here ONLY because `p` is already force-materialized (the
    // count() above) so the union reads cached blocks, not the rewritten
    // logical plan. Keep the cache+count above if touching this.
    val fwd = p
    val rev = p.select(col("dst").as("src"), col("src").as("dst"))
    val edges = graft.Caching.cache(fwd.unionByName(rev).distinct())

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
      // neighbor labels flow along edges; merge with the node's own label
      // via an outer join (NOT a union — Catalyst's union-constraint
      // rewriting breaks when one union child embeds the other's
      // attributes through the edge join). Checkpointed before the
      // doubling self-join below, which also truncates loop lineage.
      val msgs = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min("label").as("nbr"))
      val prop = labels.join(msgs, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
        .localCheckpoint()
      // POINTER DOUBLING: l(v) ← l(l(v)). Every label is itself a node id
      // (it is the min of a set of node ids), so one self-join shortcuts
      // each pointer chain to half its length — combined with the edge
      // hop above, distance-to-root shrinks geometrically and ANY graph
      // converges in O(log diameter) rounds, not O(diameter). Without
      // this a path graph needs one round per hop (a 1000-chain would
      // exhaust maxIter and fragment).
      val next = prop.as("a")
        .join(
          prop.select(col("doc_id").as("label"), col("label").as("label2")),
          Seq("label"), "left")
        .select(col("doc_id"),
          coalesce(col("label2"), col("label")).as("label"))
        .localCheckpoint()
      val nextSum = next.agg(sum("label")).head().getLong(0)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "raise maxIter (rounds needed ≈ log2 of the largest component diameter)")
    graft.Caching.release(edges)
    graft.Caching.release(p)
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
    // Every non-singleton cluster member appears in the CC output (it
    // was an endpoint of some verified pair), so cluster stats can be
    // computed on the CC table ALONE — pairs-sized, tiny next to the
    // corpus — and joined back. Docs absent from CC are singletons:
    // cluster_id = doc_id, size 1, keep 1. This replaces the previous
    // full-corpus window over cluster_id (a corpus-wide shuffle) with
    // one aggregate + one join whose build side is near-dup-sized and
    // broadcastable at any corpus scale.
    val cc = connectedComponents(pairs)
    val stats = cc.groupBy("cluster_id").agg(
      count(lit(1)).as("cluster_size"),
      min("doc_id").as("_keeper"))
    val enriched = cc.join(stats, Seq("cluster_id"))
    docs
      .select(col("doc_id"))
      .join(enriched, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        coalesce((col("doc_id") === col("_keeper")).cast("int"), lit(1))
          .as("keep"))
  }

  /** Quality-aware canonical selection (M67) — [[dedupAssign]] with a
    * KEEP POLICY instead of min-id: per cluster, keep the member with
    * the highest `score` (ties → lowest doc_id), the C4/CCNet practice
    * of retaining the longest / best-quality variant of a near-dup
    * group rather than an arbitrary one. `scores(doc_id, score)` with
    * BIGINT scores (length, LM µ-score, any integer quality signal —
    * integer so the argmax is engine-exact).
    *
    * Same scale shape as [[dedupAssign]]: cluster stats live on the
    * CC table (pairs-sized ≪ corpus); the scores join touches only CC
    * members, and the corpus-wide join-back is one left join. The
    * argmax is `max_by(doc_id, (score, -doc_id))` — one aggregate, no
    * cluster-wide window.
    *
    * A cluster member ABSENT from `scores` keeps its place in
    * `cluster_size` but scores `Long.MinValue` — it is never preferred
    * over a scored member (in an all-unscored cluster the tie-break
    * falls back to min doc_id, i.e. [[dedupAssign]]'s policy).
    * `scores` is aggregated to one row per doc_id (max) before the
    * join, so duplicate score rows can't inflate cluster sizes.
    *
    * The `-doc_id` tie-break negation would overflow at
    * `doc_id == Long.MinValue`; doc ids are nonnegative everywhere in
    * this engine, and negative ids would already break
    * [[dedupAssign]]'s unclustered-singleton convention upstream. */
  def dedupAssignBy(
      docs: DataFrame,
      pairs: DataFrame,
      scores: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
    val uniqScores = scores.groupBy("doc_id").agg(max("score").as("score"))
    val scored = cc.join(uniqScores, Seq("doc_id"), "left")
      .withColumn("score", coalesce(col("score"), lit(Long.MinValue)))
    val stats = scored.groupBy("cluster_id").agg(
      count(lit(1)).as("cluster_size"),
      expr("max_by(doc_id, struct(score, -doc_id))").as("_keeper"))
    val enriched = cc.join(stats, Seq("cluster_id"))
    docs
      .select(col("doc_id"))
      .join(enriched, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        coalesce((col("doc_id") === col("_keeper")).cast("int"), lit(1))
          .as("keep"))
  }
}
