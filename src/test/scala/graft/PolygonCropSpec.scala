package graft

import graft.functions.BoxPolyClipAreaExpr
import graft.model.RegularGrid
import graft.ops.PolygonCrop
import org.apache.spark.sql.functions._

/** Ports the reference's polygon weight oracles
  * (tests/test_weights_mapping.py:57-97: squares grid × triangles). */
class PolygonCropSpec extends SparkSpec {

  // the reference's 4 triangles (tests/test_weights_mapping.py:22-29)
  private val triangles = Seq(
    Seq((0.5, 0.5), (0.5, 1.5), (1.5, 1.5)),
    Seq((0.5, 0.5), (1.5, 0.5), (1.5, 1.5)),
    Seq((2.5, 0.5), (1.5, 1.5), (1.5, 0.5)),
    Seq((2.5, 0.5), (2.5, 1.5), (1.5, 1.5)))

  // 3x2 unit grid; reference squares 0..4 = cells (0,0),(0,1),(1,0),(1,1),(2,1)
  private val grid = RegularGrid(3, 2, 0.0, 0.0, 1.0, 1.0)
  private val squareToCell = Map(0 -> 0L, 1 -> 1L, 2 -> 2L, 3 -> 3L, 4 -> 5L)

  test("square->triangle weights match the reference 1/8,1/4 table") {
    // expected_weights (tests/test_weights_mapping.py:57-78): per square,
    // weight = area(square ∩ triangle) / area(square)
    val expected = Map( // (square, triangle) -> w, zeros omitted
      (0, 0) -> 0.125, (1, 0) -> 0.25, (3, 0) -> 0.125,
      (0, 1) -> 0.125, (2, 1) -> 0.25, (3, 1) -> 0.125,
      (2, 2) -> 0.25, (3, 2) -> 0.125,
      (3, 3) -> 0.125, (4, 3) -> 0.25)
    triangles.zipWithIndex.foreach { case (tri, t) =>
      val w = PolygonCrop.cellWeights(spark, grid, tri)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      squareToCell.foreach { case (sq, cell) =>
        val exp = expected.getOrElse((sq, t), 0.0)
        assert(math.abs(w.getOrElse(cell, 0.0) - exp) < 1e-12,
          s"triangle $t square $sq: got ${w.getOrElse(cell, 0.0)} want $exp")
      }
    }
  }

  test("triangle-normalized weights match weights_triangle_to_square") {
    // (tests/test_weights_mapping.py:80-97): weight = area(∩)/area(triangle)
    val expected = Map(
      (0, 0) -> 0.25, (0, 1) -> 0.5, (0, 3) -> 0.25,
      (1, 0) -> 0.25, (1, 2) -> 0.5, (1, 3) -> 0.25,
      (2, 2) -> 0.5, (2, 3) -> 0.25,
      (3, 3) -> 0.25, (3, 4) -> 0.5)
    triangles.zipWithIndex.foreach { case (tri, t) =>
      val w = PolygonCrop.cellWeights(spark, grid, tri, normalizeByPoly = true)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      squareToCell.foreach { case (sq, cell) =>
        val exp = expected.getOrElse((t, sq), 0.0)
        assert(math.abs(w.getOrElse(cell, 0.0) - exp) < 1e-12,
          s"triangle $t square $sq: got ${w.getOrElse(cell, 0.0)} want $exp")
      }
    }
  }

  test("clipArea kernel: containment, disjoint, partial") {
    val sq = (Array(0.0, 2.0, 2.0, 0.0), Array(0.0, 0.0, 2.0, 2.0))
    assert(BoxPolyClipAreaExpr.clipArea(0, 0, 2, 2, sq._1, sq._2) == 4.0)
    assert(BoxPolyClipAreaExpr.clipArea(5, 5, 6, 6, sq._1, sq._2) == 0.0)
    assert(BoxPolyClipAreaExpr.clipArea(1, 1, 3, 3, sq._1, sq._2) == 1.0)
    assert(BoxPolyClipAreaExpr.clipArea(-1, -1, 5, 5, sq._1, sq._2) == 4.0)
  }

  test("point crop: inside kept, boundary halved, outside dropped; inverted complement") {
    val square = Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0))
    val pts = spark.createDataFrame(Seq(
      (1L, 1.0, 1.0, 8.0),  // interior
      (2L, 2.0, 1.0, 8.0),  // on edge
      (3L, 0.0, 0.0, 8.0),  // on corner
      (4L, 5.0, 5.0, 8.0))) // outside
      .toDF("source_id", "x", "y", "value")
    val in = PolygonCrop.cropPointSources(pts, square)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(in == Map(1L -> 8.0, 2L -> 4.0, 3L -> 4.0))
    val out = PolygonCrop.cropPointSources(pts, square, keepOutside = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out == Map(2L -> 4.0, 3L -> 4.0, 4L -> 8.0))
  }

  test("point-in-poly kernel handles non-convex polygons") {
    // L-shaped polygon
    val px = Array(0.0, 4.0, 4.0, 2.0, 2.0, 0.0)
    val py = Array(0.0, 0.0, 2.0, 2.0, 4.0, 4.0)
    import graft.functions.PointInPolyExpr.classify
    assert(classify(1.0, 1.0, px, py) == 2) // in the lower arm
    assert(classify(1.0, 3.0, px, py) == 2) // in the upper arm
    assert(classify(3.0, 3.0, px, py) == 0) // in the notch
    assert(classify(2.0, 3.0, px, py) == 1) // on the notch edge
    assert(classify(5.0, 5.0, px, py) == 0)
  }

  test("cropWithPolygon + complement conserve total mass") {
    val tri = triangles(0)
    val emi = basicInv // cells 0..4 on srcGrid? use the 3x2 grid cells 0..4
    val in = PolygonCrop.cropWithPolygon(spark, emi, grid, tri)
    val out = PolygonCrop.cropWithPolygon(spark, emi, grid, tri, keepOutside = true)
    val total = emi.groupBy().sum("value").collect()(0).getDouble(0)
    val sumIn = in.groupBy().sum("value").collect()(0).getDouble(0)
    val sumOut = out.groupBy().sum("value").collect()(0).getDouble(0)
    assert(math.abs(sumIn + sumOut - total) < 1e-9)
  }

  test("inline clip path is bit-identical to the weight-table join path") {
    val tri = triangles(0)
    val emi = basicInv
    // inline (poly.length <= InlineClipMaxVertices)
    val inline = PolygonCrop.cropWithPolygon(spark, emi, grid, tri)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    // the join path, replicated manually (what >64-vertex polygons run)
    val w = PolygonCrop.cellWeights(spark, grid, tri)
    val joined = emi.join(broadcast(w), Seq("cell_id"), "left")
      .withColumn("value", col("value") * coalesce(col("weight"), lit(0.0)))
      .drop("weight").where(col("value") =!= 0.0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    assert(inline.keySet == joined.keySet)
    inline.foreach { case (k, v) => assert(v == joined(k), k.toString) }
  }

  test("small-polygon crop plan has no join and no shuffle") {
    val tri = triangles(0)
    val plan = PolygonCrop.cropWithPolygon(spark, basicInv, grid, tri)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
