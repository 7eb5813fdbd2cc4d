package graft

import org.apache.spark.sql.functions._
import graft.model.RegularGrid
import graft.ops.SpatialJoin
import graft.sources.Shapefile
import graft.sinks.IconExport

/** The full ICON-OEM chain on real file formats: shapefile country
  * polygons → per-cell mask → timezone regions → per-region rolled
  * scaling factors → per-cell hourly factors (what OEM consumes). Ties
  * S13 + R19/R20 + K3 together the way the reference pipeline does
  * (utilities.get_country_mask → icon.make_icon_time_profiles). */
class IconFlowSpec extends SparkSpec {

  test("ICON grid FILE -> polygon table -> conservative remap (byte-level fixture)") {
    import graft.sources.{IconGridFile, NetcdfClassic}
    import graft.sinks.NetcdfWriter
    import graft.sinks.NetcdfWriter.WriteVar
    import NetcdfClassic.{NcDim, NcDouble, NcInt}
    // unit square split into two triangles, authored as a classic grid
    // file with the reference's variable layout (grids.py:858-872):
    // vlon/vlat vertex coords, vertex_of_cell (nv=3, cell=2) 1-BASED
    val vlonD = Array(0.0, 1.0, 1.0, 0.0)
    val vlatD = Array(0.0, 0.0, 1.0, 1.0)
    val bytes = NetcdfWriter.write(
      dims = Seq(NcDim("cell", 2), NcDim("vertex", 4), NcDim("nv", 3)),
      gatts = Nil,
      vars = Seq(
        WriteVar("clon", Seq("cell"), NcDouble, doubles = Array(2.0 / 3, 1.0 / 3)),
        WriteVar("clat", Seq("cell"), NcDouble, doubles = Array(1.0 / 3, 2.0 / 3)),
        WriteVar("vlon", Seq("vertex"), NcDouble, doubles = vlonD),
        WriteVar("vlat", Seq("vertex"), NcDouble, doubles = vlatD),
        WriteVar("cell_area", Seq("cell"), NcDouble, doubles = Array(0.5, 0.5)),
        // (k, n) row-major: cell 0 = vertices 1,2,3; cell 1 = 1,3,4
        WriteVar("vertex_of_cell", Seq("nv", "cell"), NcInt,
          doubles = Array(1, 1, 2, 3, 3, 4).map(_.toDouble))))
    val path = java.nio.file.Files.createTempFile("icon_grid", ".nc")
    java.nio.file.Files.write(path, bytes)

    // planar fixture: coordinates already in target units
    val mesh = IconGridFile.read(spark, path.toString, toDegrees = false)
    val rows = mesh.orderBy("poly_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getSeq[Double](rows(0).fieldIndex("xs")) == Seq(0.0, 1.0, 1.0))
    assert(rows(0).getSeq[Double](rows(0).fieldIndex("ys")) == Seq(0.0, 0.0, 1.0))
    assert(rows(1).getSeq[Double](rows(1).fieldIndex("xs")) == Seq(0.0, 1.0, 0.0))
    assert(rows(0).getDouble(rows(0).fieldIndex("cell_area")) == 0.5)

    // radians -> degrees path (the real-file default, np.rad2deg)
    val degreed = IconGridFile.parse(bytes)
    assert(math.abs(degreed.head.xs(1) - math.toDegrees(1.0)) < 1e-12)

    // the mesh table plugs into the irregular remap: each triangle gets
    // half of the single source cell's mass
    val g1 = RegularGrid(1, 1, 0.0, 0.0, 1.0, 1.0)
    val emi = spark.createDataFrame(Seq((0L, "a", "CO2", 8.0)))
      .toDF("cell_id", "category", "substance", "value")
    val out = SpatialJoin.remapAcrossPolygons(
      spark, emi, SpatialJoin.gridAsPolygons(spark, g1),
      mesh.select("poly_id", "xs", "ys"), tileSize = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(out(0L) - 4.0) < 1e-12)
    assert(math.abs(out(1L) - 4.0) < 1e-12)
  }

  test("shapefile -> polygonMask -> tz regions -> rolled per-cell SFs") {
    import ShapeFixtures._
    // AAA covers x in [0,2] (UTC), BBB x in [2,4] (UTC+2)
    val shp = buildShp(Seq(
      Seq((0.0, 0.0), (0.0, 4.0), (2.0, 4.0), (2.0, 0.0)),
      Seq((2.0, 0.0), (2.0, 4.0), (4.0, 4.0), (4.0, 0.0))))
    val dbf = buildDbf("ISO_A3", Seq("AAA", "BBB"), 3)
    val countries = Shapefile.countryPolygons(
      spark, writeTmp(".shp", shp), writeTmp(".dbf", dbf))

    val grid = RegularGrid(4, 4, 0.0, 0.0, 1.0, 1.0)
    val mask = SpatialJoin.polygonMask(spark, grid, countries)

    val regionTable = spark.createDataFrame(Seq(
      ("AAA", 0, 10, 0), ("BBB", 1, 10, 2)))
      .toDF("country", "region_id", "tpid", "tz_shift")
    val catsubs = spark.createDataFrame(Seq(("A", "F", "co2")))
      .toDF("category", "substance", "var")
    val indexes = spark.createDataFrame(Seq(("A", "F", 10, 1)))
      .toDF("category", "substance", "tpid", "profile_id")
    val daily = spark.range(24).select(
      lit(1).as("profile_id"), lit("hour_of_day").as("kind"),
      col("id").cast("int").as("pos"), (col("id") * 1.0).as("ratio"))

    val assembled = IconExport.assembleTimeProfiles(
      spark, catsubs, indexes,
      regionTable.select("region_id", "tpid", "tz_shift"), daily)

    // per-cell hourly factors: mask ⋈ regions ⋈ assembled
    val perCell = mask
      .join(regionTable, "country")
      .join(assembled, "region_id")
      .select(col("cell_id"), col("pos"), col("sf"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap

    // cell (0,0) is AAA (no shift): sf at pos 5 = ratio(5)*24
    assert(perCell((0L, 5)) == 5.0 * 24)
    // cell (3,3) id 15 is BBB (shift 2): out[p] = in[(p+2)%24]
    assert(perCell((15L, 0)) == 2.0 * 24)
    assert(perCell((15L, 23)) == 1.0 * 24)
    // every grid cell got 24 factors
    assert(perCell.size == 16 * 24)
  }
}
