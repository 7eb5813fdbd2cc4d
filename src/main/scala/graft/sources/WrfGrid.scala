package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** K4 — the WRF model grid from a `wrfinput` file (reference `WRF_Grid`,
  * emiproc/exports/wrf.py:23-126): a pseudo-regular grid given only in
  * WGS84 coordinates. Cell corners are reconstructed exactly as the
  * reference does — centers from `XLONG`/`XLAT`, the U-staggered
  * (`XLONG_U`/`XLAT_U`, nx+1 columns) and V-staggered (`XLONG_V`/
  * `XLAT_V`, ny+1 rows) edge coordinates turned into per-cell offsets,
  * corner = center + d_left/right + d_bottom/top (wrf.py:66-118).
  *
  * Cell ids follow the emiproc x-major convention (`x.T.reshape(-1)`,
  * wrf.py:55-57): `cell_id = ix·ny + iy` — identical to the engine's
  * RegularGrid ids, so [[graft.sinks.Exports.wrfChemiExport]]'s unstack
  * applies unchanged.
  *
  * `cells` is the polygon table `(cell_id, xs, ys, area_km2)` the general
  * polygon machinery consumes (remapAcrossPolygons to move an inventory
  * onto the WRF grid, polygonMask, …). Areas are the spherical
  * small-cell approximation: planar shoelace in degrees scaled by
  * cos(center latitude) × (111.32 km/deg)² — the reference projects via
  * pyproj instead; for the ≤ few-km cells WRF uses, the relative error
  * is far below the emission-factor uncertainty, and the approximation
  * is engine-portable arithmetic.
  *
  * The file decodes on the driver (grid-scale, like every loader) and
  * the cell table parallelizes; global attributes are preserved so the
  * export can propagate them (wrf.py:219 `assign_attrs`).
  */
object WrfGrid {

  final case class WrfGridData(
      nx: Int, ny: Int, atts: Seq[(String, String)], cells: DataFrame)

  private val KmPerDeg = 111.32

  def read(spark: SparkSession, path: String): WrfGridData = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val f = NcAdapter.open(bytes)
    def grid2d(name: String): (Array[Double], Int, Int) = {
      val shape = f.shape(name)
      require(shape.length == 3 && shape.head == 1,
        s"$name: expected (Time=1, south_north, west_east)-like, got $shape")
      (f.doubles(name), shape(1), shape(2))
    }
    val (cLon, ny, nx) = grid2d("XLONG")
    val (cLat, ny2, nx2) = grid2d("XLAT")
    require(ny2 == ny && nx2 == nx, "XLAT/XLONG shape mismatch")
    val (uLon, nyU, nxU) = grid2d("XLONG_U")
    val (uLat, _, _) = grid2d("XLAT_U")
    require(nyU == ny && nxU == nx + 1, s"XLONG_U: got ($nyU, $nxU)")
    val (vLon, nyV, nxV) = grid2d("XLONG_V")
    val (vLat, _, _) = grid2d("XLAT_V")
    require(nyV == ny + 1 && nxV == nx, s"XLONG_V: got ($nyV, $nxV)")

    // arrays are row-major [iy, ix]; cell ids x-major ix*ny + iy
    def c(a: Array[Double], iy: Int, ix: Int) = a(iy * nx + ix)
    def u(a: Array[Double], iy: Int, ix: Int) = a(iy * (nx + 1) + ix)
    def v(a: Array[Double], iy: Int, ix: Int) = a(iy * nx + ix)

    val rows = for (ix <- 0 until nx; iy <- 0 until ny) yield {
      val lon0 = c(cLon, iy, ix); val lat0 = c(cLat, iy, ix)
      val dLonL = u(uLon, iy, ix) - lon0
      val dLonR = u(uLon, iy, ix + 1) - lon0
      val dLatL = u(uLat, iy, ix) - lat0
      val dLatR = u(uLat, iy, ix + 1) - lat0
      val dLonB = v(vLon, iy, ix) - lon0
      val dLonT = v(vLon, iy + 1, ix) - lon0
      val dLatB = v(vLat, iy, ix) - lat0
      val dLatT = v(vLat, iy + 1, ix) - lat0
      // BL, BR, TR, TL (wrf.py:96-118)
      val xs = Array(lon0 + dLonL + dLonB, lon0 + dLonR + dLonB,
        lon0 + dLonR + dLonT, lon0 + dLonL + dLonT)
      val ys = Array(lat0 + dLatL + dLatB, lat0 + dLatR + dLatB,
        lat0 + dLatR + dLatT, lat0 + dLatL + dLatT)
      var shoelace = 0.0
      var i = 0
      while (i < 4) {
        val j = (i + 1) % 4
        shoelace += xs(i) * ys(j) - xs(j) * ys(i)
        i += 1
      }
      val areaKm2 = math.abs(shoelace) / 2.0 *
        math.cos(lat0 * math.Pi / 180.0) * KmPerDeg * KmPerDeg
      (ix.toLong * ny + iy, xs.toSeq, ys.toSeq, areaKm2)
    }
    val cells = spark.createDataFrame(rows)
      .toDF("cell_id", "xs", "ys", "area_km2")
    WrfGridData(nx, ny, f.globalAtts, cells)
  }
}
