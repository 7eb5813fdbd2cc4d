package graft

import graft.sources.Hdf5Classic
import Hdf5Fixtures._

/** Byte-level checks of the pure-JVM HDF5 reader against hand-authored
  * files following the public format spec (see [[Hdf5Fixtures]]). */
class Hdf5Spec extends SparkSpec {

  test("contiguous float64 dataset round-trips exactly") {
    val vals = Seq(1.5, -2.25, 3.0, 0.0, 42.0, -0.125)
    val file = build(Group(Seq("temp" -> f64(Seq(2, 3), vals))))
    val h5 = Hdf5Classic.open(file)
    val ds = h5.readDataset("/temp")
    assert(ds.dims == Seq(2, 3))
    assert(ds.data.toSeq == vals)
  }

  test("nested groups list and resolve like the reference's GFED tree") {
    val file = build(Group(Seq(
      "emissions" -> Group(Seq(
        "01" -> Group(Seq(
          "DM" -> f32(Seq(2, 2), Seq(1f, 2f, 3f, 4f)),
          "partitioning" -> Group(Seq(
            "DM_SAVA" -> f32(Seq(2, 2), Seq(0.5f, 1f, 0.25f, 0f)),
            "DM_TEMF" -> f32(Seq(2, 2), Seq(0.5f, 0f, 0.75f, 1f)))))),
        "02" -> Group(Seq(
          "DM" -> f32(Seq(2, 2), Seq(5f, 6f, 7f, 8f)))))),
      "ancill" -> Group(Seq(
        "grid_cell_area" -> f64(Seq(2, 2), Seq(10.0, 10.0, 20.0, 20.0)))))))
    val h5 = Hdf5Classic.open(file)
    assert(h5.list("/") == Seq("ancill", "emissions"))
    assert(h5.list("/emissions") == Seq("01", "02"))
    assert(h5.list("/emissions/01") == Seq("DM", "partitioning"))
    assert(h5.list("/emissions/01/partitioning") == Seq("DM_SAVA", "DM_TEMF"))
    assert(h5.readDataset("/emissions/01/partitioning/DM_SAVA").data.toSeq ==
      Seq(0.5, 1.0, 0.25, 0.0))
    assert(h5.readDataset("/ancill/grid_cell_area").data.toSeq ==
      Seq(10.0, 10.0, 20.0, 20.0))
    assert(h5.exists("/emissions/02/DM"))
    assert(!h5.exists("/emissions/03"))
  }

  test("chunked float32 with shuffle+deflate and edge clipping") {
    // 5x7 dataset in 2x3 chunks: edge chunks are partial both ways
    val vals = (0 until 35).map(i => (i * 0.25f) - 2f)
    val file = build(Group(Seq(
      "flux" -> f32(Seq(5, 7), vals,
        chunkDims = Some(Seq(2, 3)), filters = Seq(2, 1)))))
    val ds = Hdf5Classic.open(file).readDataset("/flux")
    assert(ds.dims == Seq(5, 7))
    assert(ds.data.toSeq == vals.map(_.toDouble))
  }

  test("chunked with deflate only and with fletcher32 checksum stripped") {
    val vals = (0 until 24).map(i => i * 1.5f)
    val fileD = build(Group(Seq(
      "a" -> f32(Seq(4, 6), vals, chunkDims = Some(Seq(4, 4)), filters = Seq(1)))))
    assert(Hdf5Classic.open(fileD).readDataset("/a").data.toSeq == vals.map(_.toDouble))
    // fletcher32 applied LAST on write (after deflate) is the libhdf5 norm
    val fileF = build(Group(Seq(
      "b" -> f32(Seq(4, 6), vals, chunkDims = Some(Seq(3, 3)), filters = Seq(1, 3)))))
    assert(Hdf5Classic.open(fileF).readDataset("/b").data.toSeq == vals.map(_.toDouble))
  }

  test("int32 dataset and clear errors on unsupported format features") {
    val file = build(Group(Seq("n" -> i32(Seq(3), Seq(7, -8, 9)))))
    assert(Hdf5Classic.open(file).readDataset("/n").data.toSeq == Seq(7.0, -8.0, 9.0))
    val bad = file.clone()
    bad(8) = 4 // superblock version byte (v2/v3 are supported new-format)
    val e = intercept[IllegalArgumentException](Hdf5Classic.open(bad))
    assert(e.getMessage.contains("superblock version"))
    intercept[IllegalArgumentException](
      Hdf5Classic.open("nope".getBytes ++ new Array[Byte](2000)))
  }

  test("attributes: strings, scalars and vectors decode; exotic skipped") {
    val file = build(Group(
      Seq("flux" -> f32(Seq(2, 2), Seq(1f, 2f, 3f, 4f)).copy(attrs = Seq(
        "units" -> AStr("kg m-2 s-1"),
        "scale_factor" -> ANum(Seq(0.5)),
        "valid_range" -> ANum(Seq(-1.0, 1.0))))),
      attrs = Seq("Conventions" -> AStr("CF-1.8"))))
    val h5 = Hdf5Classic.open(file)
    val as = h5.attributes("/flux").map(a => a.name -> a).toMap
    assert(as("units").text == "kg m-2 s-1")
    assert(as("scale_factor").nums == Seq(0.5))
    assert(as("valid_range").nums == Seq(-1.0, 1.0))
    assert(h5.attributes("/").map(_.name) == Seq("Conventions"))
  }

  test("NetCDF-4 raster: parseRaster dispatches on the HDF5 magic") {
    // a CF raster as netCDF-4 would store it: 1-D coords with units
    // attributes, a chunked+deflated (lat, lon) flux with packing + fill
    val file = build(Group(Seq(
      "y" -> f64(Seq(2), Seq(10.0, 12.0)).copy(attrs = Seq(
        "units" -> AStr("degrees_north"))),
      "x" -> f64(Seq(3), Seq(100.0, 102.0, 104.0)).copy(attrs = Seq(
        "units" -> AStr("degrees_east"))),
      "co2_flux" -> f32(Seq(2, 3), Seq(1f, 2f, 9999f, 4f, 5f, 6f),
        chunkDims = Some(Seq(2, 2)), filters = Seq(1)).copy(attrs = Seq(
        "_FillValue" -> ANum(Seq(9999.0)),
        "scale_factor" -> ANum(Seq(0.5)),
        "add_offset" -> ANum(Seq(100.0)))))))
    assert(graft.sources.NetcdfRaster.isHdf5(file))
    val (grid, rows) = graft.sources.NetcdfRaster.parseRaster(file)
    assert(grid.nx == 3 && grid.ny == 2 && grid.dx == 2.0 && grid.dy == 2.0)
    val m = rows.map(r => (r._1, r._2) -> r._4).toMap
    assert(rows.forall(_._3 == "co2_flux"))
    assert(m.size == 5) // fill value dropped
    assert(m((0, 0)) == 100.5 && m((1, 0)) == 101.0)
    assert(!m.contains((2, 0)))
    assert(m((0, 1)) == 102.0 && m((2, 1)) == 103.0)
  }

  test("large group spills across one SNOD correctly (many children)") {
    val kids = (0 until 40).map(i => f"v$i%02d" -> f64(Seq(1), Seq(i.toDouble)))
    val h5 = Hdf5Classic.open(build(Group(kids)))
    assert(h5.list("/") == kids.map(_._1).sorted)
    assert(h5.readDataset("/v17").data.toSeq == Seq(17.0))
  }
}
