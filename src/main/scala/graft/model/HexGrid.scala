package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hexagonal-cell grid — the reference's `HexGrid`
  * (emiproc/grids.py:495-628): regular center lattice with every other
  * row (orientedNorth) or column shifted by half a step, six-corner
  * polygons from the fixed offset pattern with `h = 1/√3`.
  *
  * Like [[RegularGrid]] the cell table is ANALYTIC: centers and all six
  * corners are pure Column arithmetic over `spark.range(ncells)` — no
  * persisted geometry, no shuffle; the polygon table feeds
  * [[graft.ops.SpatialJoin.polyPolyWeights]] like any other
  * `(poly_id, xs, ys)` set. Cell order is x-major (`poly_id = ix·ny +
  * iy`), matching the reference's column-major flatten
  * (grids.py:602-604 `flatten(order="F")` of the (ny, nx) meshgrid).
  *
  * Every hex has exact shoelace area dx·dy (the offset pattern tiles the
  * plane), so conservation checks stay dyadic-friendly when dx/dy are.
  */
final case class HexGrid(
    nx: Int,
    ny: Int,
    xmin: Double,
    ymin: Double,
    dx: Double,
    dy: Double,
    orientedNorth: Boolean = true) {

  require(nx > 0 && ny > 0 && dx > 0 && dy > 0, s"degenerate grid: $this")

  def ncells: Long = nx.toLong * ny
  def cellArea: Double = dx * dy // exact shoelace area of the 6-corner cell

  private def idiv(c: Column, n: Long): Column = call_function("div", c, lit(n))

  /** Center columns of a poly_id column, including the odd-row (north) /
    * odd-column shift (grids.py:595-599). */
  def centerX(polyId: Column): Column = {
    val ix = idiv(polyId, ny)
    val iy = pmod(polyId, lit(ny.toLong))
    val base = lit(xmin + dx / 2) + ix * dx
    if (orientedNorth) base + when(pmod(iy, lit(2L)) === 1, dx / 2).otherwise(0.0)
    else base
  }
  def centerY(polyId: Column): Column = {
    val ix = idiv(polyId, ny)
    val iy = pmod(polyId, lit(ny.toLong))
    val base = lit(ymin + dy / 2) + iy * dy
    if (orientedNorth) base
    else base + when(pmod(ix, lit(2L)) === 1, dy / 2).otherwise(0.0)
  }

  /** The reference's corner offset pattern (grids.py:606-621):
    * h = 1/√3; x offsets [0,1,1,0,-1,-1]·dx/2, y offsets
    * [2-h, h, -h, -(2-h), -h, h]·dy/2 — swapped when not north. */
  private val h = 1.0 / math.sqrt(3.0)
  private val offX: Seq[Double] = Seq(0, 1, 1, 0, -1, -1).map(_.toDouble)
  private val offY: Seq[Double] = Seq(2 - h, h, -h, -(2 - h), -h, h)

  /** Polygon table `(poly_id, xs, ys)` — six corners per cell. */
  def cells(spark: SparkSession): DataFrame = {
    val (ox, oy) = if (orientedNorth) (offX, offY) else (offY, offX)
    spark.range(ncells)
      .select(
        col("id").as("poly_id"),
        array(ox.map(o => centerX(col("id")) + lit(o * dx / 2)): _*).as("xs"),
        array(oy.map(o => centerY(col("id")) + lit(o * dy / 2)): _*).as("ys"))
  }
}

object HexGrid {

  /** From a spacing (center distance within a row = inscribed-circle
    * diameter): dx = spacing, dy = spacing·√3/2 for north orientation,
    * swapped otherwise (grids.py:546-549). */
  def fromSpacing(
      xmin: Double, ymin: Double,
      nx: Int, ny: Int,
      spacing: Double,
      orientedNorth: Boolean = true): HexGrid = {
    val corr = spacing * math.sqrt(3.0) / 2
    val (dx, dy) = if (orientedNorth) (spacing, corr) else (corr, spacing)
    HexGrid(nx, ny, xmin, ymin, dx, dy, orientedNorth)
  }

  /** From bounds + spacing: cell counts by ceil division
    * (grids.py:556-565), bounds re-derived from the counts. */
  def fromBoundsSpacing(
      xmin: Double, ymin: Double, xmax: Double, ymax: Double,
      spacing: Double,
      orientedNorth: Boolean = true): HexGrid = {
    val corr = spacing * math.sqrt(3.0) / 2
    val (dx, dy) = if (orientedNorth) (spacing, corr) else (corr, spacing)
    val nx = math.ceil((xmax - xmin) / dx).toInt
    val ny = math.ceil((ymax - ymin) / dy).toInt
    HexGrid(nx, ny, xmin, ymin, dx, dy, orientedNorth)
  }

  /** From bounds + counts: dx/dy = extent / count (grids.py:570-575). */
  def fromBoundsCounts(
      xmin: Double, ymin: Double, xmax: Double, ymax: Double,
      nx: Int, ny: Int,
      orientedNorth: Boolean = true): HexGrid =
    HexGrid(nx, ny, xmin, ymin, (xmax - xmin) / nx, (ymax - ymin) / ny,
      orientedNorth)
}
