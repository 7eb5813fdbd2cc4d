package graft

import org.apache.spark.sql.functions._
import graft.model.HexGrid
import graft.functions.PolyAreaExpr

/** HexGrid against the reference's construction rules
  * (emiproc/grids.py:495-628, tests/grids/test_hex_grid.py). */
class HexGridSpec extends SparkSpec {

  test("fromSpacing: counts, six corners, exact cell area dx*dy") {
    val g = HexGrid.fromSpacing(0.0, 0.0, nx = 4, ny = 3, spacing = 2.0)
    assert(g.dx == 2.0 && g.dy == 2.0 * math.sqrt(3.0) / 2)
    val cells = g.cells(spark)
    assert(cells.count() == 12)
    val areas = cells.select(col("poly_id"),
      PolyAreaExpr.col(col("xs"), col("ys")).as("a")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(areas.size == 12)
    areas.values.foreach(a => assert(math.abs(a - g.cellArea) < 1e-12))
    val row = cells.where(col("poly_id") === 0).collect()(0)
    assert(row.getSeq[Double](1).length == 6)
  }

  test("odd rows shift by dx/2 when oriented north; odd columns otherwise") {
    val gN = HexGrid(2, 2, 0.0, 0.0, 1.0, 1.0, orientedNorth = true)
    val cN = gN.cells(spark).select(col("poly_id"),
      gN.centerX(col("poly_id")).as("xc"), gN.centerY(col("poly_id")).as("yc"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(cN(0L) == ((0.5, 0.5))) // (ix 0, iy 0)
    assert(cN(1L) == ((1.0, 1.5))) // (ix 0, iy 1): odd row, x shifted
    assert(cN(2L) == ((1.5, 0.5))) // (ix 1, iy 0)

    val gE = HexGrid(2, 2, 0.0, 0.0, 1.0, 1.0, orientedNorth = false)
    val cE = gE.cells(spark).select(col("poly_id"),
      gE.centerX(col("poly_id")).as("xc"), gE.centerY(col("poly_id")).as("yc"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(cE(1L) == ((0.5, 1.5))) // odd row NOT shifted
    assert(cE(2L) == ((1.5, 1.0))) // (ix 1, iy 0): odd column, y shifted
  }

  test("corner pattern matches the reference offsets (h = 1/sqrt(3))") {
    val g = HexGrid(1, 1, 0.0, 0.0, 2.0, 2.0)
    val r = g.cells(spark).collect()(0)
    val h = 1.0 / math.sqrt(3.0)
    val xs = r.getSeq[Double](1)
    val ys = r.getSeq[Double](2)
    assert(xs == Seq(1.0, 2.0, 2.0, 1.0, 0.0, 0.0))
    val expYs = Seq(2 - h, h, -h, -(2 - h), -h, h).map(o => 1.0 + o)
    ys.zip(expYs).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("hexes tile: mass remapped from a regular grid is conserved") {
    import graft.model.RegularGrid
    import graft.ops.SpatialJoin
    val src = RegularGrid(2, 2, 0.0, 0.0, 1.0, 1.0)
    // hex grid generously covering the source square
    val hex = HexGrid(6, 6, -1.5, -1.5, 0.75, 0.75)
    val emi = spark.createDataFrame(Seq(
      (0L, "a", "CO2", 4.0), (3L, "a", "CO2", 8.0)))
      .toDF("cell_id", "category", "substance", "value")
    val out = SpatialJoin.remapAcrossPolygons(
      spark, emi, SpatialJoin.gridAsPolygons(spark, src),
      hex.cells(spark), tileSize = 1.0)
    val total = out.groupBy().sum("value").collect()(0).getDouble(0)
    assert(math.abs(total - 12.0) < 1e-9)
  }
}
