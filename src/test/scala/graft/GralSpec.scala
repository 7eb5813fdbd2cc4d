package graft

import org.apache.spark.sql.functions._
import graft.sinks.GralExport

/** GRAL text export/ingest semantics vs hand-computed values
  * (reference emiproc/exports/gral.py:65-331). */
class GralSpec extends SparkSpec {

  test("source groups follow substance-major numbering (gral.py:82-88)") {
    val sg = GralExport.sourceGroups(spark, Seq("CO2", "CH4"), Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(sg(("CO2", "a")) == 0 && sg(("CO2", "c")) == 2)
    assert(sg(("CH4", "a")) == 3 && sg(("CH4", "c")) == 5)
  }

  test("line sections split emission by length ratio (gral.py:236-262)") {
    val lines = spark.createDataFrame(Seq(
      (1L, Array(0.0, 3.0, 3.0), Array(0.0, 0.0, 1.0), 8.0, 7)))
      .toDF("line_id", "xs", "ys", "value", "source_group")
    val rows = GralExport.lineRows(lines, height = 2.0, width = 0.5,
      verticalExtension = 3.0)
      .collect().map(_.getString(0)).sorted
    assert(rows.length == 2)
    // segment 0: (0,0)->(3,0) len 3 of 4 -> emission 6; segment 1 -> 2
    assert(rows(0) == "unnamed,0,7,0.0,0.0,2.0,3.0,0.0,2.0,0.5,-3.0,0,0,6.0,0,0,0,0")
    assert(rows(1) == "unnamed,1,7,3.0,0.0,2.0,3.0,1.0,2.0,0.5,-3.0,0,0,2.0,0,0,0,0")
  }

  test("cadastre rasterization: center containment, emission x cell/polyArea") {
    // right triangle (0,0),(2,0),(0,2), area 2, value 8, raster 1x1 at (0,0):
    // centers (0.5,0.5) inside, (1.5,0.5) and (0.5,1.5) exactly on the
    // hypotenuse (counts as covered), (1.5,1.5) outside
    val polys = spark.createDataFrame(Seq(
      (1L, Array(0.0, 2.0, 0.0), Array(0.0, 0.0, 2.0), 8.0, 3)))
      .toDF("poly_id", "xs", "ys", "value", "source_group")
    val cells = GralExport.cadastreCells(polys, 1.0, 0.0, 0.0)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    assert(cells.keySet == Set((0.0, 0.0), (1.0, 0.0), (0.0, 1.0)))
    cells.values.foreach(v => assert(v == 8.0 * 1.0 / 2.0))
  }

  test("overlapping polygons merge additively into one cadastre cell") {
    val polys = spark.createDataFrame(Seq(
      (1L, Array(0.0, 2.0, 2.0, 0.0), Array(0.0, 0.0, 2.0, 2.0), 8.0, 3),
      (2L, Array(0.0, 1.0, 1.0, 0.0), Array(0.0, 0.0, 1.0, 1.0), 5.0, 3)))
      .toDF("poly_id", "xs", "ys", "value", "source_group")
    val cells = GralExport.cadastreCells(polys, 1.0, 0.0, 0.0)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    // cell (0,0): 8*(1/4) + 5*(1/1) = 7; others only the big square
    assert(cells((0.0, 0.0)) == 8.0 / 4 + 5.0)
    assert(cells((1.0, 1.0)) == 2.0)
  }

  test("readers skip the documented header lines and parse columns") {
    val dir = java.nio.file.Files.createTempDirectory("gral")
    val pts = dir.resolve("point.dat")
    java.nio.file.Files.writeString(pts,
      "Generated: x\nheader2\n1.0,2.0,3.0,4.5,0,0,0,0.1,0.2,293.0,7\n")
    val p = GralExport.readPoints(spark, pts.toString).collect()(0)
    assert(p.getDouble(0) == 1.0 && p.getDouble(3) == 4.5 && p.getInt(4) == 7)

    val lns = dir.resolve("line.dat")
    java.nio.file.Files.writeString(lns,
      "g\ng\ng\ng\nName,Section,...\n" +
        "unnamed,0,7,0.0,0.0,2.0,3.0,0.0,2.0,0.5,-3.0,0,0,6.0,0,0,0,0\n")
    val l = GralExport.readLines(spark, lns.toString).collect()(0)
    assert(l.getInt(1) == 0 && l.getInt(2) == 7 && l.getDouble(7) == 6.0)

    val cad = dir.resolve("cadastre.dat")
    java.nio.file.Files.writeString(cad,
      "x,y,z,...\n0.0,1.0,2.0,1.0,1.0,3.0,4.0,0,0,0,3,\n")
    val c = GralExport.readCadastre(spark, cad.toString).collect()(0)
    assert(c.getDouble(1) == 1.0 && c.getDouble(4) == 4.0 && c.getInt(5) == 3)
  }

  test("per-category EmissionInfo + building heights (gral.py:197-286)") {
    import GralExport.EmissionInfo
    val grid = graft.model.RegularGrid(4, 4, 0.0, 0.0, 10.0, 10.0)
    // building height 6 in cell (ix=0, iy=0) = id 0, 2 in (1,1) = id 5
    val bh = spark.createDataFrame(Seq((0L, 6.0), (5L, 2.0)))
      .toDF("cell_id", "bh")
    val infos = Seq(
      "chimneys" -> EmissionInfo(height = 10.0, heightOverBuildings = true,
        speed = 7.0, width = 1.25, temperature = 300.0),
      "ground" -> EmissionInfo(height = 0.5, heightOverBuildings = false))
    val pts = spark.createDataFrame(Seq(
      (5.0, 5.0, 4.0, "chimneys", 1), // in cell 0 -> z = 10 + 6
      (15.0, 15.0, 8.0, "chimneys", 1), // in cell 5 -> z = 10 + 2
      (5.0, 5.0, 2.0, "ground", 2))) // hob=false -> z = 0.5
      .toDF("x", "y", "value", "category", "source_group")
    val rows = GralExport.pointRowsInfo(spark, pts, infos, grid, bh)
      .collect().map(_.getString(0)).toSet
    assert(rows == Set(
      "5.0,5.0,16.0,4.0,0,0,0,7.0,1.25,300.0,1",
      "15.0,15.0,12.0,8.0,0,0,0,7.0,1.25,300.0,1",
      "5.0,5.0,0.5,2.0,0,0,0,5.0,0.5,353.0,2"))
    // a line from cell 0 to cell 5: endpoint z carry their own cells
    val lines = spark.createDataFrame(Seq(
      (1L, Seq(5.0, 15.0), Seq(5.0, 15.0), 12.0, "chimneys", 1)))
      .toDF("line_id", "xs", "ys", "value", "category", "source_group")
      .select(col("line_id"), col("xs").cast("array<double>").as("xs"),
        col("ys").cast("array<double>").as("ys"), col("value"),
        col("category"), col("source_group"))
    val l = GralExport.lineRowsInfo(spark, lines, infos, grid, bh)
      .collect().map(_.getString(0))
    assert(l.toSeq == Seq(
      "unnamed,0,1,5.0,5.0,16.0,15.0,15.0,12.0,1.25,-3.0,0,0,12.0,0,0,0,0"))
  }
}
