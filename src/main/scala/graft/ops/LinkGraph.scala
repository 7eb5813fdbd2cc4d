package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for crawl curation — the CommonCrawl-style
  * host/page ranking (harmonic or PageRank centrality over the crawl's
  * link graph) used to prioritize fetches and as a document quality
  * prior (Page et al. 1999; the CC host-level ranks are the public
  * precedent).
  *
  * Arithmetic is INTEGER-QUANTIZED end to end: ranks live in µ-units
  * (uniform start 10⁶ per node) and one update is
  *
  *   pr'(v) = 150000 + (85 · Σ_{u→v} (pr(u) div outdeg(u))) div 100
  *
  * i.e. damping 0.85 as the rational 85/100 with floor division, and
  * per-edge contributions floored BEFORE the sum. Every operation is
  * exact BIGINT math, so the result is independent of aggregation
  * order (1000 executors sum in whatever order they like) and
  * bit-reproducible across engines — the floating-point PageRank would
  * drift under the cross-engine hash gate and across reruns. Dangling
  * mass (nodes with no out-edges) is dropped, the standard
  * simplification; ranks are a relative prior, not a probability.
  *
  * Scale shape: per iteration, one join of the rank table against the
  * edge list keyed by src (both partition by node id — co-partitioned
  * after the first exchange, AQE reuses the layout) and one aggregate
  * keyed by dst. The edge list is the only corpus-scale table and is
  * hash-partitioned, never broadcast or collected; rank-table lineage
  * is truncated per iteration with localCheckpoint (the iterative-
  * Spark trap is plan growth — cf. [[graft.dedup.Clustering]]).
  */
object LinkGraph {

  /** @param edges (src, dst) long columns, one row per DISTINCT edge
    *              (callers dedup; self-loops allowed but conventionally
    *              removed first).
    * @return (node, pr) — every node appearing as src or dst, with its
    *         µ-unit integer rank after `iters` updates. */
  def pageRank(
      edges: DataFrame,
      iters: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst",
      driverEdgeLimit: Long = 200000L): DataFrame = {
    val e = graft.Caching.cache(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")))
    // ADAPTIVE small-graph path (the Clustering.driverEdgeLimit shape):
    // below `driverEdgeLimit` edges the whole update runs on the driver
    // in microseconds, where each distributed iteration costs several
    // Spark jobs of fixed latency. Ranks are integer µ-units, so the
    // driver loop and the join+aggregate loop produce THE SAME numbers
    // (integer addition is order-free); the spec pins both paths equal.
    // driverEdgeLimit = 0 forces the distributed path — the 100 TB one.
    val nEdges = e.count()
    if (nEdges <= driverEdgeLimit) {
      val el = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      graft.Caching.release(e)
      val outdeg = scala.collection.mutable.LongMap.empty[Long]
      val nodeSet = scala.collection.mutable.LongMap.empty[Long] // as a set
      el.foreach { case (s, d) =>
        outdeg(s) = outdeg.getOrElse(s, 0L) + 1L
        nodeSet(s) = 0L; nodeSet(d) = 0L
      }
      var pr = scala.collection.mutable.LongMap.empty[Long]
      nodeSet.foreachKey(n => pr(n) = 1000000L)
      var i = 0
      while (i < iters) {
        val contrib = scala.collection.mutable.LongMap.empty[Long]
        el.foreach { case (s, d) =>
          contrib(d) = contrib.getOrElse(d, 0L) + pr(s) / outdeg(s)
        }
        val next = scala.collection.mutable.LongMap.empty[Long]
        nodeSet.foreachKey(n =>
          next(n) = 150000L + (85L * contrib.getOrElse(n, 0L)) / 100L)
        pr = next
        i += 1
      }
      val spark = edges.sparkSession
      return spark.createDataFrame(
        pr.iterator.map { case (n, r) => (n, r) }.toSeq)
        .toDF("node", "pr")
    }
    val nodes = graft.Caching.cache(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct())
    val outdeg = graft.Caching.cache(
      e.groupBy("src").agg(count(lit(1)).as("outdeg")))
    var pr = nodes.withColumn("pr", lit(1000000L)).localCheckpoint()
    var i = 0
    while (i < iters) {
      val contrib = e
        .join(pr.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("pr div outdeg")).as("m"))
      val next = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) +
            expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100")).as("pr"))
      // truncate lineage every SECOND iteration (and at the end): each
      // localCheckpoint is an eager materialization — a per-iteration
      // fixed cost — while two iterations of plan depth stay far from
      // the growth cliff iterative Spark has to guard against
      pr = if (i % 2 == 1 || i == iters - 1) next.localCheckpoint() else next
      i += 1
    }
    graft.Caching.release(e)
    graft.Caching.release(outdeg)
    // safe: the final localCheckpoint above has already materialized pr,
    // so the nodes cache is no longer reachable from the returned plan
    graft.Caching.release(nodes)
    pr
  }
}
