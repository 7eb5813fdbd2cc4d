package graft

import org.apache.spark.sql.functions._
import graft.sources.{LoaderFixtures, NcAdapter, WrfGrid}
import graft.sinks.Exports

/** K4 WRF_Grid corner reconstruction + per-cell-area export on the
  * committed wrfinput fixture (emiproc/exports/wrf.py:23-126 and the
  * reference's tests/exports/test_export_wrf.py expectations). */
class WrfGridSpec extends SparkSpec {

  private lazy val wrf = WrfGrid.read(spark, "fixtures/wrfinput.nc")

  test("wrfinput parse: shape, x-major ids, attribute block") {
    assert(wrf.nx == 3 && wrf.ny == 2)
    val atts = wrf.atts.toMap
    assert(atts("DX") == "1000.0" && atts.contains("GFDDA_INTERVAL_M"))
    assert(wrf.cells.count() == 6)
  }

  test("corner reconstruction matches the sheared-grid closed form") {
    // cell (ix=1, iy=1): center lon = 10 + 0.2 + 0.02, lat = 45.2;
    // parallelogram corners BL,BR,TR,TL with the 0.02°/row shear
    val r = wrf.cells.where(col("cell_id") === (1L * 2 + 1)).collect()(0)
    val xs = r.getSeq[Double](1); val ys = r.getSeq[Double](2)
    val (lon0, lat0) = (10.22, 45.2)
    def approx(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(approx(xs(0), lon0 - 0.11) && approx(ys(0), lat0 - 0.1)) // BL
    assert(approx(xs(1), lon0 + 0.09) && approx(ys(1), lat0 - 0.1)) // BR
    assert(approx(xs(2), lon0 + 0.11) && approx(ys(2), lat0 + 0.1)) // TR
    assert(approx(xs(3), lon0 - 0.09) && approx(ys(3), lat0 + 0.1)) // TL
    // shear keeps the parallelogram area at 0.2 x 0.2 deg^2
    val expArea = 0.04 * math.cos(lat0 * math.Pi / 180.0) * 111.32 * 111.32
    assert(math.abs(r.getDouble(3) / expArea - 1.0) < 1e-12)
  }

  test("wrfChemiExport on the WRF grid: per-cell areas, attrs propagated") {
    val hpy = 365.25 * 24.0
    // one emission in cell 3 (the cell checked above); kg/y such that
    // value/(hpy * area) = 5 moles/km2/h with molar mass 1000 g/mol
    val area3 = wrf.cells.where(col("cell_id") === 3)
      .collect()(0).getDouble(3)
    val emi = spark.createDataFrame(Seq(
      (3L, "cat", "CO2", 5.0 * hpy * area3)))
      .toDF("cell_id", "category", "substance", "value")
    val sf = spark.emptyDataFrame
      .sparkSession.createDataFrame(Seq.empty[(String, String, Int, Double)])
      .toDF("category", "substance", "hour_of_day", "sf")
    val dir = java.nio.file.Files.createTempDirectory("wrfgrid").toString
    val files = Exports.wrfChemiExport(spark, emi, wrf,
      Seq("CO2" -> 1000.0), sf, "2018-01-01 00:00:00", 1, dir,
      "E_{substance}_{category}")
    assert(files == Seq("wrfchemi_d01_2018-01-01_00:00:00"))
    val nc = NcAdapter.open(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/${files.head}")))
    // wrfinput attributes ride along (wrf.py:219) + the emiproc marker
    val gatts = nc.globalAtts.toMap
    assert(gatts("DX") == "1000.0" && gatts.contains("GFDDA_INTERVAL_M"))
    assert(gatts.contains("emiproc"))
    // cell 3 = (ix=1, iy=1) -> plane index iy*nx + ix = 4
    val plane = nc.doubles("E_CO2_cat")
    assert(math.abs(plane(4) - 5.0) < 1e-9)
    assert(plane.count(_ != 0.0) == 1)
    assert(nc.strings("Times") == Seq("2018-01-01_00:00:00"))
  }
}
