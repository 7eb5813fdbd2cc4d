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
