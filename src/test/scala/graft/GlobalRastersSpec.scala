package graft

import graft.sources.{GfasLoader, GlobalRasters, NetcdfClassic}

/** EDGAR-directory and Saunois-monthly loaders on byte-level fixtures. */
class GlobalRastersSpec extends SparkSpec {

  import NetcdfClassic._
  import NcFixtures._

  private def fluxFile(values: Seq[Float]): Array[Byte] =
    build(
      Seq(("latitude", 2), ("longitude", 3)),
      Seq(
        V("latitude", Seq(0), NcDouble, Seq("units" -> "degrees_north"),
          doubles(10.0, 12.0), 16),
        V("longitude", Seq(1), NcDouble, Seq("units" -> "degrees_east"),
          doubles(100.0, 102.0, 104.0), 24),
        V("flux", Seq(0, 1), NcFloat, Seq("long_name" -> "emission flux"),
          b => values.foreach(b.putFloat), 4 * values.length)))

  test("EDGAR directory scan: filename catsub, flux x area x SEC_PER_YR") {
    val dir = java.nio.file.Files.createTempDirectory("edgar")
    java.nio.file.Files.write(dir.resolve("CO2_ENE.nc"),
      fluxFile(Seq(1f, 0f, 0f, 0f, 0f, 0f)))
    java.nio.file.Files.write(dir.resolve("CH4_TRO.nc"),
      fluxFile(Seq(0f, 0f, 0f, 0f, 0f, 2f)))
    val (grid, inv) = GlobalRasters.readEdgarDir(spark, dir.toString)
    assert(grid.nx == 3 && grid.ny == 2)
    val rows = inv.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    // flux row-major (lat, lon): value 1 at (lat0, lon0) -> cell 0
    val a0 = GfasLoader.sphericalCellArea(9.0, 11.0, 2.0)
    assert(math.abs(rows((0L, "ENE", "CO2")) /
      (1.0 * a0 * GfasLoader.SecPerYear) - 1.0) < 1e-6)
    // value 2 at (lat1, lon2) -> cell 2*2+1 = 5
    val a1 = GfasLoader.sphericalCellArea(11.0, 13.0, 2.0)
    assert(math.abs(rows((5L, "TRO", "CH4")) /
      (2.0 * a1 * GfasLoader.SecPerYear) - 1.0) < 1e-6)
    assert(rows.size == 2)
  }

  test("distributed EDGAR read: one task per file, identical to driver-side scan") {
    import org.apache.spark.sql.functions.{col, countDistinct, spark_partition_id, struct}
    val dir = java.nio.file.Files.createTempDirectory("edgarBig")
    val subs = Seq("CO2", "CH4", "N2O", "NOX")
    val cats = Seq("ENE", "TRO")
    for (s <- subs; c <- cats) {
      val values = (0 until 6).map(k => if ((k + s.length + c.hashCode.abs) % 3 == 0) 0f
        else (k + 1).toFloat * (s.length + 1))
      java.nio.file.Files.write(dir.resolve(s"${s}_$c.nc"), fluxFile(values))
    }
    val (grid, driverInv) = GlobalRasters.readEdgarDir(spark, dir.toString)
    val dist = GlobalRasters.readEdgarDirDistributed(spark, dir.toString, grid)

    // exactly one file (= one (substance, category)) per input partition, 8 partitions
    val parts = dist
      .groupBy(spark_partition_id().as("pid"))
      .agg(countDistinct(struct(col("category"), col("substance"))).as("nfiles"))
      .collect()
    assert(parts.length == 8, s"expected 8 non-empty partitions, got ${parts.length}")
    assert(parts.forall(_.getLong(1) == 1L), "a partition holds rows of >1 file")

    // row-identical to the driver-side reader (same FP order end-to-end)
    assert(collectSet(dist) == collectSet(driverInv))
    assert(driverInv.count() > 0)
  }

  test("monthly loader reads the same inventory from an HDF5 container") {
    import Hdf5Fixtures.{Group => H5G, f32 => h5f32, f64 => h5f64}
    // (12, 2, 2): 3 in January and 1.5 in February at (lat0, lon0)
    val flux = new Array[Float](12 * 4)
    flux(0) = 3f; flux(4) = 1.5f
    val file = Hdf5Fixtures.build(H5G(Seq(
      "latitude" -> h5f64(Seq(2), Seq(10.0, 12.0)),
      "longitude" -> h5f64(Seq(2), Seq(100.0, 102.0)),
      "flux" -> h5f32(Seq(12, 2, 2), flux.toSeq,
        chunkDims = Some(Seq(4, 2, 2)), filters = Seq(1)))))
    val p = java.nio.file.Files.createTempFile("monthly", ".h5")
    java.nio.file.Files.write(p, file)
    val inv = GlobalRasters.readMonthly(spark, p.toString, "wetlands")
    val ann = inv.annual.collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val a0 = GfasLoader.sphericalCellArea(9.0, 11.0, 2.0)
    assert(ann.keySet == Set(0L))
    assert(math.abs(ann(0L) / ((3.0 * 31 + 1.5 * 28) * 1e-3 * a0) - 1.0) < 1e-6)
    val mon = inv.monthly.collect()
      .map(r => (r.getLong(2), r.getInt(3)) -> r.getDouble(4)).toMap
    assert(mon == Map((0L, 0) -> 3.0, (0L, 1) -> 1.5))
  }

  test("mixed classic + netCDF-4/HDF5 directory parses identically on both paths") {
    import Hdf5Fixtures.{AStr, Group => H5Group, f32 => h5f32, f64 => h5f64}
    val dir = java.nio.file.Files.createTempDirectory("edgarMixed")
    val vals1 = Seq(1f, 0f, 3f, 4f, 5f, 6f)
    val vals2 = Seq(2f, 4f, 0f, 8f, 10f, 12f)
    // same grid, one classic container + one HDF5 container
    java.nio.file.Files.write(dir.resolve("CO2_ENE.nc"), fluxFile(vals1))
    java.nio.file.Files.write(dir.resolve("CH4_TRO.nc"), Hdf5Fixtures.build(H5Group(Seq(
      "latitude" -> h5f64(Seq(2), Seq(10.0, 12.0)).copy(attrs = Seq(
        "units" -> AStr("degrees_north"))),
      "longitude" -> h5f64(Seq(3), Seq(100.0, 102.0, 104.0)).copy(attrs = Seq(
        "units" -> AStr("degrees_east"))),
      "flux" -> h5f32(Seq(2, 3), vals2, chunkDims = Some(Seq(2, 2)), filters = Seq(1))))))

    val (grid, drv) = GlobalRasters.readEdgarDir(spark, dir.toString)
    val dist = GlobalRasters.readEdgarDirDistributed(spark, dir.toString, grid)
    assert(grid.nx == 3 && grid.ny == 2)
    assert(collectSet(dist) == collectSet(drv))
    val bySub = drv.collect().groupBy(_.getAs[String]("substance"))
    assert(bySub.keySet == Set("CO2", "CH4"))
    // zero cells dropped in both containers
    assert(bySub("CO2").length == 5 && bySub("CH4").length == 5)
  }

  test("monthly loader: day-weighted annual total + month-of-year series") {
    // (time=12, lev=1, lat=2, lon=2); fluxes only at (lat0, lon0):
    // 3 g/m2/day in January, 1.5 in February
    val perMonth = 4
    val data = new Array[Float](12 * perMonth)
    data(0) = 3f
    data(perMonth) = 1.5f
    val bytes = build(
      Seq(("time", 12), ("lev", 1), ("latitude", 2), ("longitude", 2)),
      Seq(
        V("latitude", Seq(2), NcDouble, Nil, doubles(10.0, 12.0), 16),
        V("longitude", Seq(3), NcDouble, Nil, doubles(100.0, 102.0), 16),
        V("flux", Seq(0, 1, 2, 3), NcFloat, Nil,
          b => data.foreach(b.putFloat), 4 * data.length)))
    val path = java.nio.file.Files.createTempFile("saunois", ".nc")
    java.nio.file.Files.write(path, bytes)
    val inv = GlobalRasters.readMonthly(spark, path.toString, "wetlands")
    val area = GfasLoader.sphericalCellArea(9.0, 11.0, 2.0)
    val exp = (3.0 * 31 + 1.5 * 28) * 1e-3 * area
    val ann = inv.annual.collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ann.size == 1)
    assert(math.abs(ann(0L) / exp - 1.0) < 1e-6)
    val months = inv.monthly.collect()
      .map(r => (r.getLong(2), r.getInt(3)) -> r.getDouble(4)).toMap
    assert(months((0L, 0)) == 3.0 && months((0L, 1)) == 1.5)
    assert(months.size == 2)
  }

  test("readSaunois: one category per file stem, concatenated (saunois.py:38-56)") {
    val inv = GlobalRasters.readSaunois(spark, Seq(
      "fixtures/saunois/wetland.nc", "fixtures/saunois/rice.nc"))
    val ann = inv.annual.collect()
      .map(r => (r.getString(1), r.getLong(0)) -> r.getDouble(3)).toMap
    // both categories present, every cell emits (3 of 12 months are 0)
    assert(ann.keys.map(_._1).toSet == Set("wetland", "rice"))
    assert(ann.size == 12)
    // hand-computed cell (i=0, j=0) of wetland (seed 1): flux(t) =
    // (t+1)/8 except t ∈ {3,7,11} zeroed; Σ flux·days = 205.25 g/m²/y
    val area = GfasLoader.sphericalCellArea(9.5, 10.5, 1.0)
    assert(math.abs(ann(("wetland", 0L)) / (205.25e-3 * area) - 1.0) < 1e-12)
    assert(inv.monthly.where("substance = 'CH4'").count() == 12 * 9)
  }

  test("readWetCharts: model select, NaN-skipping mean, fillna, ratios (wetcharts.py:35-106)") {
    val path = "fixtures/wetcharts.nc"
    // model selection by coordinate VALUE (.sel semantics)
    val sel = GlobalRasters.readWetCharts(spark, path, model = Some(2913))
    val selAnn = sel.annual.collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // all-zero cell (i=0, j=0) = cell 0 emits nothing
    assert(!selAnn.contains(0L) && selAnn.size == 5)
    // hand-computed cell (i=1, j=0) = cell 1: flux(t) = (t%4)·0.25 + 2,
    // Σ = 28.5, value = 28.5/12 × area × 1e-6 × 365.25
    val area1 = GfasLoader.sphericalCellArea(45.5, 46.0, 0.5)
    assert(math.abs(
      selAnn(1L) / (28.5 / 12.0 * area1 * 1e-6 * 365.25) - 1.0) < 1e-12)
    // NaN-skipping model mean: cell (i=0, j=1) = cell 2 has NaN holes in
    // model 1601 at t ∈ {4, 9} → those months mean only models 2913/2914
    val mean = GlobalRasters.readWetCharts(spark, path)
    val meanAnn = mean.annual.collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val area0 = GfasLoader.sphericalCellArea(45.0, 45.5, 0.5)
    assert(math.abs(
      meanAnn(2L) / (29.0 / 12.0 * area0 * 1e-6 * 365.25) - 1.0) < 1e-12)
    // monthly output is normalized ratios
    val ratios = mean.monthly.where("cell_id = 2").collect()
      .map(r => r.getInt(3) -> r.getDouble(4)).toMap
    assert(ratios.size == 12 && math.abs(ratios(4) - 2.25 / 29.0) < 1e-15)
    // unknown model id raises like the reference
    val err = intercept[IllegalArgumentException] {
      GlobalRasters.readWetCharts(spark, path, model = Some(9999))
    }
    assert(err.getMessage.contains("9999"))
  }
}
