package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ICON grid file reader — the reference's `ICONGrid`
  * (emiproc/grids.py:837-900): the unstructured triangular mesh comes
  * from a NetCDF grid file holding cell centers `clon`/`clat`, vertex
  * coordinates `vlon`/`vlat` (all radians), the 1-based incidence matrix
  * `vertex_of_cell` of shape (nv=3, cell), and optionally `cell_area`.
  * Corners of cell n are `vlon[vertex_of_cell[:, n] - 1]`
  * (grids.py:869-872), converted to degrees.
  *
  * Files parse through the container-independent [[NcAdapter]]
  * (classic CDF-1/2 or NetCDF-4/HDF5, dispatched on the magic);
  * the result is the engine's standard polygon table `(poly_id, xs, ys
  * [, clon, clat, cell_area])` feeding
  * [[graft.ops.SpatialJoin.polyPolyWeights]] /
  * [[graft.ops.SpatialJoin.remapAcrossPolygons]] directly. The grid file
  * is mesh-sized (≪ fact data) — driver-side parse, like the reference.
  */
object IconGridFile {

  final case class IconCell(
      poly_id: Long,
      xs: Seq[Double], ys: Seq[Double],
      clon: Double, clat: Double,
      cell_area: Double)

  /** Pure parse: grid-file bytes → one row per cell. `toDegrees` mirrors
    * the reference's `np.rad2deg` (grids.py:860-863); disable for planar
    * test meshes authored directly in target units. */
  def parse(bytes: Array[Byte], toDegrees: Boolean = true): Seq[IconCell] = {
    // container-independent: classic CDF-1/2 or NetCDF-4/HDF5 dispatch
    val f = NcAdapter.open(bytes)
    def deg(a: Array[Double]): Array[Double] =
      if (toDegrees) a.map(math.toDegrees) else a
    val clon = deg(f.doubles("clon"))
    val clat = deg(f.doubles("clat"))
    val vlon = deg(f.doubles("vlon"))
    val vlat = deg(f.doubles("vlat"))
    val voc = f.doubles("vertex_of_cell")
    val shape = f.shape("vertex_of_cell") // (nv, cell)
    require(shape.length == 2, s"vertex_of_cell: expected 2-D, got $shape")
    val nv = shape.head
    val ncell = shape(1)
    require(clon.length == ncell, s"clon length ${clon.length} != ncell $ncell")
    val areas =
      if (f.hasVar("cell_area")) f.doubles("cell_area")
      else Array.fill(ncell)(Double.NaN)
    (0 until ncell).map { n =>
      val vids = (0 until nv).map(k => voc(k * ncell + n).toInt - 1) // 1-based
      IconCell(n.toLong,
        vids.map(vlon), vids.map(vlat),
        clon(n), clat(n), areas(n))
    }
  }

  /** Read a classic-format ICON grid file into the polygon table. */
  def read(spark: SparkSession, path: String, toDegrees: Boolean = true): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    spark.createDataFrame(parse(bytes, toDegrees))
  }
}
