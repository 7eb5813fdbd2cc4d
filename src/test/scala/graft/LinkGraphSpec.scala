package graft

import graft.ops.LinkGraph

/** M45 integer-quantized PageRank. */
class LinkGraphSpec extends SparkSpec {

  private def edges(rows: (Long, Long)*) =
    spark.createDataFrame(rows).toDF("src", "dst")

  test("pageRank: 3 hand-computed integer iterations") {
    // 1→2, 2→1, 1→3; outdeg 1=2, 2=1; node 3 dangling.
    // i1: pr = (1000000, 575000, 575000)
    // i2: pr = (638750, 575000, 575000)
    // i3: in(1)=575000 → 638750; in(2)=in(3)=638750 div 2=319375
    //     → 150000 + (85·319375) div 100 = 421468
    val pr = LinkGraph.pageRank(edges((1L, 2L), (2L, 1L), (1L, 3L)), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr == Map(1L -> 638750L, 2L -> 421468L, 3L -> 421468L))
  }

  test("pageRank: isolated sink keeps teleport floor; rank mass is bounded") {
    // star 1→{2,3,4}: after one iteration the center has no in-links
    val pr = LinkGraph.pageRank(
      edges((1L, 2L), (1L, 3L), (1L, 4L)), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(1L) == 150000L) // no in-edges → bare teleport term
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L))
    // i1 leaves = 150000 + 85·(1000000 div 3) div 100 = 433333
    // i2 leaves = 150000 + 85·(150000 div 3) div 100 = 192500
    assert(pr(2L) == 192500L)
  }

  test("pageRank result is deterministic across reruns (integer math)") {
    val e = edges((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (2L, 1L))
    val a = LinkGraph.pageRank(e, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = LinkGraph.pageRank(e, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("pageRank: driver small path equals the distributed join+aggregate path") {
    // 600-edge pseudo-random graph over 200 nodes: default takes the
    // driver loop; driverEdgeLimit = 0 forces the distributed one.
    // Integer µ-unit ranks must agree EXACTLY (addition is order-free).
    val rows = (0 until 600).map { i =>
      val s = (i * 48271L) % 200
      val d = (i * 16807L + 7L) % 200
      (s, if (d == s) (d + 1) % 200 else d)
    }.distinct
    val e = edges(rows: _*)
    val small = LinkGraph.pageRank(e, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caching.release()
    val dist = LinkGraph.pageRank(e, iters = 4, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caching.release()
    assert(small == dist)
    // all three of the hand-checked suites above also take the driver
    // path by default, so the arithmetic itself is already pinned
  }
}
