package graft.sources

/** Container-independent view of a NetCDF-shaped file: the operations
  * the inventory loaders need (variable list, CF attributes, numeric
  * and char-matrix reads), dispatched on the magic number to either the
  * classic CDF-1/2 parser ([[NetcdfClassic]]) or the HDF5/NetCDF-4
  * parser ([[Hdf5Classic]]). Loaders written against this trait (TNO,
  * and anything raster-shaped via [[NetcdfRaster.parseRaster]]'s own
  * dispatch) accept either container unchanged — the reference reaches
  * both through xarray, so container independence is part of its
  * user-visible surface.
  */
trait NcAdapter {
  /** data variable names (HDF5: root-group datasets) */
  def varNames: Seq[String]
  def hasVar(name: String): Boolean
  /** text attribute of a variable, "" when absent */
  def attText(variable: String, att: String): String
  /** global (file-level) attributes as (name, text) */
  def globalAtts: Seq[(String, String)]
  /** full variable as row-major doubles */
  def doubles(name: String): Array[Double]
  /** variable shape (record dim resolved), without reading the data */
  def shape(name: String): Seq[Int]
  /** a 2-D (n, strlen) NC_CHAR variable as n trimmed strings */
  def strings(name: String): Seq[String]
}

object NcAdapter {

  def open(bytes: Array[Byte]): NcAdapter =
    if (NetcdfRaster.isHdf5(bytes)) new H5Adapter(bytes)
    else new ClassicAdapter(bytes)

  private final class ClassicAdapter(bytes: Array[Byte]) extends NcAdapter {
    import NetcdfClassic._
    private val f = readHeader(bytes)
    def varNames: Seq[String] = f.vars.map(_.name)
    def hasVar(name: String): Boolean = f.vars.exists(_.name == name)
    def attText(variable: String, att: String): String =
      f.vars.find(_.name == variable)
        .flatMap(_.atts.find(_.name == att)).map(_.text).getOrElse("")
    def globalAtts: Seq[(String, String)] = f.gatts.map(a => a.name -> a.text)
    def doubles(name: String): Array[Double] = readVarDoubles(bytes, f, name)
    def shape(name: String): Seq[Int] = f.shape(f.variable(name))
    def strings(name: String): Seq[String] = readVarStrings(bytes, f, name)
  }

  private final class H5Adapter(bytes: Array[Byte]) extends NcAdapter {
    private val h5 = Hdf5Classic.open(bytes)
    private val names = h5.list("/")
    def varNames: Seq[String] = names
    def hasVar(name: String): Boolean = names.contains(name)
    def attText(variable: String, att: String): String =
      h5.attributes(s"/$variable").find(_.name == att).map(_.text).getOrElse("")
    def globalAtts: Seq[(String, String)] =
      h5.attributes("/").map(a => a.name -> a.text)
    def doubles(name: String): Array[Double] = h5.readDataset(s"/$name").data
    def shape(name: String): Seq[Int] = h5.datasetDims(s"/$name")
    def strings(name: String): Seq[String] = {
      val ds = h5.readDataset(s"/$name")
      val (n, m) = ds.dims match {
        case Seq(a, b) => (a, b)
        case Seq(a) => (a, 1)
        case other => throw new IllegalArgumentException(
          s"$name: unsupported char shape $other")
      }
      (0 until n).map { i =>
        new String(
          Array.tabulate(m)(j => ds.data(i * m + j).toInt.toByte), "UTF-8")
          .takeWhile(_ != 0).trim
      }
    }
  }
}
