package graft

import graft.model.RegularGrid
import graft.ops.SourceWeights

/** Ports of the reference's hand-computed point/line weight cases
  * (tests/test_weights_mapping.py:31-55) onto a 3x2 unit grid
  * (x-major cell_id = ix*2 + iy). */
class SourceWeightsSpec extends SparkSpec {

  private val grid = RegularGrid(3, 2, 0.0, 0.0, 1.0, 1.0)

  private def pts(rows: (Long, Double, Double)*) =
    spark.createDataFrame(rows).toDF("source_id", "x", "y")

  private def segs(rows: (Long, Double, Double, Double, Double)*) =
    spark.createDataFrame(rows).toDF("source_id", "x1", "y1", "x2", "y2")

  private def wmap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("point weights: interior 1, edge 1/2, corner 1/4, outside dropped") {
    val w = wmap(SourceWeights.pointWeights(pts(
      (1L, 0.75, 0.75), // interior of cell (0,0)
      (2L, 1.2, 1.0),   // on horizontal edge y=1 -> cells (1,0),(1,1)
      (3L, 1.0, 1.0),   // corner of 4 cells
      (4L, -1.0, -1.0), // outside
      (5L, 0.0, 0.5)),  // on outer left border -> single cell
      grid))
    assert(w == Map(
      (1L, 0L) -> 1.0,
      (2L, 2L) -> 0.5, (2L, 3L) -> 0.5,
      (3L, 0L) -> 0.25, (3L, 1L) -> 0.25, (3L, 2L) -> 0.25, (3L, 3L) -> 0.25,
      (5L, 0L) -> 1.0))
  }

  test("line weights: in-cell, border-of-grid, diagonal, duplicated-edge renorm") {
    val w = wmap(SourceWeights.lineWeights(segs(
      (1L, 0.1, 0.1, 0.2, 0.2),  // inside cell (0,0)
      (2L, 0.0, 0.0, 0.0, 2.0),  // along outer border x=0
      (3L, 0.5, 0.5, 1.5, 1.5),  // diagonal crossing 2 cells
      (4L, 10.0, 10.0, 11.0, 11.0), // outside
      (5L, 1.0, 0.0, 1.0, 2.0)), // on shared edge x=1 -> 4 cells, renormalized
      grid))
    assert(w((1L, 0L)) == 1.0)
    assert(w((2L, 0L)) == 0.5 && w((2L, 1L)) == 0.5)
    assert(w((3L, 0L)) == 0.5 && w((3L, 3L)) == 0.5)
    assert(!w.keys.exists(_._1 == 4L))
    // x=1 duplicates into ix=0 and ix=1 for both iy -> 4 x 0.5, sum 2 -> 0.25
    assert(Seq((5L, 0L), (5L, 1L), (5L, 2L), (5L, 3L)).forall(k => w(k) == 0.25))
    val sums = w.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
    sums.foreach { case (_, s) => assert(s <= 1.0 + 1e-12) }
  }

  test("addPointSources folds weighted point values into the inventory") {
    val emi = spark.createDataFrame(Seq((0L, "c", "s", 10.0)))
      .toDF("cell_id", "category", "substance", "value")
    val points = spark.createDataFrame(Seq(
      (1L, "c", "s", 8.0, 1.0, 1.0))) // corner point: 2.0 into each of 4 cells
      .toDF("source_id", "category", "substance", "value", "x", "y")
    val out = SourceWeights.addPointSources(emi, points, grid)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out == Map(0L -> 12.0, 1L -> 2.0, 2L -> 2.0, 3L -> 2.0))
  }
}
