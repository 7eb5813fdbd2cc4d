package graft

import graft.model.RegularGrid
import graft.sinks.GeoPackage
import org.apache.spark.sql.functions._

/** K7 as a REAL GeoPackage (reference export_to_geopackage,
  * emiproc/exports/geopackage.py:9-60): layer-per-category + gridded
  * layer with "_"-joined tuple columns, round-tripped through our own
  * reader AND read by python3's stdlib sqlite3 — an independent real
  * SQLite engine. */
class GeoPackageSpec extends SparkSpec {

  private val grid = RegularGrid(3, 2, 0.0, 0.0, 1024.0, 1024.0)

  private def pointsLayer = {
    import spark.implicits._
    Seq(
      (1L, graft.sources.Wkb.encodePoint(10.0, 20.0), 44.0, "stack A"),
      (2L, graft.sources.Wkb.encodePoint(-5.5, 7.25), 11.5, "stack B"))
      .toDF("fid", "geom", "CO2", "name")
  }

  private def inv = basicInv.where(col("cell_id") < 6)

  private def writeGpkg(): String = {
    val path = java.nio.file.Files.createTempDirectory("gpkg").toString + "/inv.gpkg"
    GeoPackage.exportToGeopackage(
      spark, path,
      gdfs = Map("point_sources" -> pointsLayer),
      gridded = Some(GeoPackage.griddedLayer(spark, inv, grid)),
      geometryTypes = Map("point_sources" -> "POINT"))
    path
  }

  test("round-trip through our own reader: layers, tuple columns, geometry") {
    val path = writeGpkg()
    val layers = GeoPackage.readGeopackage(spark, path)
    assert(layers.map(_.name).sorted == Seq("gridded_emissions", "point_sources"))
    val gridded = layers.find(_.name == "gridded_emissions").get
    assert(gridded.geometryType == "POLYGON" && gridded.srsId == 4326)
    // the reference's "_".join(col) tuple-column naming (geopackage.py:56-58)
    assert(gridded.df.columns.toSeq ==
      Seq("fid", "geom", "adf_CH4", "adf_CO2", "liku_CO2", "test_NH3"))
    val r = gridded.df.where(col("fid") === 3).collect().head // cell_id 2
    assert(r.getAs[Double]("adf_CH4") == 5.0 && r.getAs[Double]("adf_CO2") == 2.0)
    // geometry survives: cell 2 = (ix=1, iy=0) → x in [1024, 2048), y in [0, 1024)
    val g = graft.sources.Wkb.decode(r.getAs[Array[Byte]]("geom"))
    assert(g.kind == "polygon")
    assert(g.parts.head.xs.min == 1024.0 && g.parts.head.xs.max == 2048.0)
    assert(g.parts.head.ys.min == 0.0 && g.parts.head.ys.max == 1024.0)
    val pts = layers.find(_.name == "point_sources").get.df.orderBy("fid").collect()
    assert(pts.map(_.getAs[String]("name")).toSeq == Seq("stack A", "stack B"))
    val p2 = graft.sources.Wkb.decode(pts(1).getAs[Array[Byte]]("geom"))
    assert(p2.parts.head.xs.head == -5.5 && p2.parts.head.ys.head == 7.25)
  }

  test("a real SQLite engine reads the GeoPackage (python3 stdlib sqlite3)") {
    val out = try {
      val path = writeGpkg()
      val script =
        s"""import sqlite3
           |c = sqlite3.connect("$path")
           |assert c.execute("PRAGMA integrity_check").fetchone()[0] == "ok"
           |assert c.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
           |layers = dict(c.execute(
           |    "SELECT table_name, geometry_type_name FROM gpkg_geometry_columns"))
           |assert layers == {"point_sources": "POINT",
           |                  "gridded_emissions": "POLYGON"}, layers
           |ct = c.execute("SELECT table_name, data_type, srs_id, min_x, max_x, max_y "
           |               "FROM gpkg_contents ORDER BY table_name").fetchall()
           |assert ct[0] == ("gridded_emissions", "features", 4326, 0.0, 3072.0, 2048.0), ct
           |assert ct[1][3] == -5.5 and ct[1][4] == 10.0, ct
           |srs = [r[0] for r in c.execute("SELECT srs_id FROM gpkg_spatial_ref_sys ORDER BY srs_id")]
           |assert srs == [-1, 0, 4326], srs
           |tot = c.execute("SELECT sum(adf_CH4), sum(test_NH3), count(*) "
           |                "FROM gridded_emissions").fetchone()
           |assert tot == (25.0, 15.0, 5), tot
           |gp = c.execute("SELECT geom FROM point_sources WHERE fid=1").fetchone()[0]
           |assert gp[:2] == b"GP" and gp[3] == 3, gp[:4]
           |print("PYOK")
           |""".stripMargin
      runPython(script)
    } catch {
      case e: java.io.IOException => assume(false, s"python3 unavailable: $e"); ""
    }
    assert(out.contains("PYOK"), out)
  }

  test("gridded name colliding with a category raises, like the reference") {
    val e = intercept[IllegalArgumentException] {
      GeoPackage.exportToGeopackage(
        spark, "/tmp/never.gpkg",
        gdfs = Map("gridded_emissions" -> pointsLayer),
        gridded = Some(GeoPackage.griddedLayer(spark, inv, grid)))
    }
    assert(e.getMessage.contains("already exists in inventory categories"))
  }

  private def runPython(script: String): String = {
    val f = java.nio.file.Files.createTempFile("gpkg", ".py")
    java.nio.file.Files.write(f, script.getBytes("UTF-8"))
    try {
      val p = new ProcessBuilder("python3", f.toString)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      require(p.waitFor() == 0, out)
      out
    } finally java.nio.file.Files.delete(f)
  }
}
