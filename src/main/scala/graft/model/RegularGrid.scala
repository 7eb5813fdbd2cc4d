package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analytic axis-aligned regular grid.
  *
  * Mirrors the reference's `RegularGrid` (reference: emiproc/grids.py:192-492)
  * but stays *analytic*: cell boxes are pure arithmetic over `cell_id`, so the
  * cell table is generated from `spark.range` (never persisted, never
  * shuffled) and bounding-box predicates become partition-prunable range
  * predicates on `cell_id`. `cell_id = iy * nx + ix` (row-major, like the
  * reference's `cells_as_polylist` ordering at emiproc/grids.py:157-164).
  *
  * At 100 TB scale the grid is the *small* analytic side: a 6.48M-cell EDGAR
  * grid is ~50 MB as (id,4 doubles) — broadcastable; weight tables stay
  * sparse (O(cells × small fanout)).
  */
final case class RegularGrid(
    nx: Int,
    ny: Int,
    xmin: Double,
    ymin: Double,
    dx: Double,
    dy: Double) {

  require(nx > 0 && ny > 0 && dx > 0 && dy > 0, s"degenerate grid: $this")

  def ncells: Long = nx.toLong * ny
  def xmax: Double = xmin + nx * dx
  def ymax: Double = ymin + ny * dy
  def cellArea: Double = dx * dy

  /** Cell table `(cell_id, xmin, ymin, xmax, ymax)` — analytic, from range. */
  def cells(spark: SparkSession): DataFrame = {
    val ix = col("id") % nx
    val iy = floor(col("id") / nx)
    spark
      .range(ncells)
      .select(
        col("id").as("cell_id"),
        (lit(xmin) + ix * dx).as("xmin"),
        (lit(ymin) + iy * dy).as("ymin"),
        (lit(xmin) + (ix + 1) * dx).as("xmax"),
        (lit(ymin) + (iy + 1) * dy).as("ymax"))
  }

  /** Column expressions mapping a cell_id column to its box bounds. */
  def cellXmin(cellId: org.apache.spark.sql.Column) =
    lit(xmin) + (cellId % nx) * dx
  def cellYmin(cellId: org.apache.spark.sql.Column) =
    lit(ymin) + floor(cellId / nx) * dy
  def cellXmax(cellId: org.apache.spark.sql.Column) = cellXmin(cellId) + dx
  def cellYmax(cellId: org.apache.spark.sql.Column) = cellYmin(cellId) + dy

  /** Analytic clip: the sub-grid covering [bxmin,bxmax)×[bymin,bymax)
    * (reference: emiproc/grids.py:379-426 `clip_box` — clipping a regular
    * grid yields a regular grid, no geometry needed). */
  def clipBox(bxmin: Double, bymin: Double, bxmax: Double, bymax: Double): RegularGrid = {
    val ix0 = math.max(0, math.floor((bxmin - xmin) / dx).toInt)
    val iy0 = math.max(0, math.floor((bymin - ymin) / dy).toInt)
    val ix1 = math.min(nx, math.ceil((bxmax - xmin) / dx).toInt)
    val iy1 = math.min(ny, math.ceil((bymax - ymin) / dy).toInt)
    RegularGrid(ix1 - ix0, iy1 - iy0, xmin + ix0 * dx, ymin + iy0 * dy, dx, dy)
  }

  /** Predicate on a cell_id column: cell box intersects the given box.
    * On a regular grid this is pure arithmetic on cell_id (no geometry),
    * i.e. what Catalyst can push to the scan. */
  def intersectsBox(
      cellId: org.apache.spark.sql.Column,
      bxmin: Double, bymin: Double, bxmax: Double, bymax: Double) =
    cellXmin(cellId) < bxmax && cellXmax(cellId) > bxmin &&
      cellYmin(cellId) < bymax && cellYmax(cellId) > bymin
}
