package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analytic axis-aligned regular grid.
  *
  * Mirrors the reference's `RegularGrid` (reference: emiproc/grids.py:192-492)
  * but stays *analytic*: cell boxes are pure arithmetic over `cell_id`, so the
  * cell table is generated from `spark.range` (never persisted, never
  * shuffled) and bounding-box predicates become partition-prunable range
  * predicates on `cell_id`.
  *
  * Cell ordering is **x-major**, `cell_id = ix * ny + iy`, matching the
  * reference's `cells_as_polylist` iteration order (emiproc/grids.py:157-164:
  * `for i in range(nx) for j in range(ny)`) and its `centers` construction
  * (`np.repeat(lon_range, ny)`), so gridded data round-trips the reference's
  * flattening without a transpose.
  *
  * All index math on `cell_id` uses exact integer division (`div`), never
  * double-precision `floor(x / n)` — cell ids are Longs and the engine
  * advertises 100 TB scale, where `floor`-of-double is off-by-one past 2^53.
  *
  * At 100 TB scale the grid is the *small* analytic side: a 6.48M-cell EDGAR
  * grid is ~50 MB as (id, 4 doubles) — broadcastable; weight tables stay
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

  /** Exact integer division of a Long column (SQL `div`, not double floor). */
  private def idiv(c: Column, n: Long): Column = call_function("div", c, lit(n))

  /** x index of a cell_id column (x-major: ix = cell_id div ny). */
  def ixOf(cellId: Column): Column = idiv(cellId, ny)

  /** y index of a cell_id column (x-major: iy = cell_id mod ny). */
  def iyOf(cellId: Column): Column = pmod(cellId, lit(ny.toLong))

  /** cell_id from integer index columns (x-major). */
  def cellIdOf(ix: Column, iy: Column): Column = ix * ny + iy

  /** Cell table `(cell_id, xmin, ymin, xmax, ymax)` — analytic, from range. */
  def cells(spark: SparkSession): DataFrame = {
    spark
      .range(ncells)
      .select(
        col("id").as("cell_id"),
        cellXmin(col("id")).as("xmin"),
        cellYmin(col("id")).as("ymin"),
        cellXmax(col("id")).as("xmax"),
        cellYmax(col("id")).as("ymax"))
  }

  /** Column expressions mapping a cell_id column to its box bounds. */
  def cellXmin(cellId: Column): Column = lit(xmin) + ixOf(cellId) * dx
  def cellYmin(cellId: Column): Column = lit(ymin) + iyOf(cellId) * dy
  def cellXmax(cellId: Column): Column = cellXmin(cellId) + dx
  def cellYmax(cellId: Column): Column = cellYmin(cellId) + dy

  /** Cell center coordinates (reference: emiproc/grids.py `centers`). */
  def cellXc(cellId: Column): Column = cellXmin(cellId) + dx / 2
  def cellYc(cellId: Column): Column = cellYmin(cellId) + dy / 2

  /** Analytic clip: the sub-grid covering [bxmin,bxmax)×[bymin,bymax)
    * (reference: emiproc/grids.py:379-426 `clip_box`). Throws a clear error
    * when the box does not overlap the grid, like the reference's
    * "Bounding box does not intersect with grid". Boundary inclusion here is
    * floor/ceil on box edges; the reference uses searchsorted(left)-1 — a
    * cell whose edge exactly touches the box boundary is EXCLUDED here
    * (zero-area overlap), which differs from the reference's inclusive edge
    * pick; document + test, don't silently inherit.
    */
  def clipBox(bxmin: Double, bymin: Double, bxmax: Double, bymax: Double): RegularGrid = {
    if (bxmax <= xmin || bxmin >= xmax || bymax <= ymin || bymin >= ymax)
      throw new IllegalArgumentException(
        s"Bounding box ($bxmin,$bymin,$bxmax,$bymax) does not intersect with grid $this")
    val ix0 = math.max(0, math.floor((bxmin - xmin) / dx).toInt)
    val iy0 = math.max(0, math.floor((bymin - ymin) / dy).toInt)
    val ix1 = math.min(nx, math.ceil((bxmax - xmin) / dx).toInt)
    val iy1 = math.min(ny, math.ceil((bymax - ymin) / dy).toInt)
    if (ix1 <= ix0 || iy1 <= iy0)
      throw new IllegalArgumentException(
        s"Bounding box ($bxmin,$bymin,$bxmax,$bymax) does not intersect with grid $this")
    RegularGrid(ix1 - ix0, iy1 - iy0, xmin + ix0 * dx, ymin + iy0 * dy, dx, dy)
  }

  /** Predicate on a cell_id column: cell box intersects the given box.
    * On a regular grid this is pure arithmetic on cell_id (no geometry),
    * i.e. what Catalyst can push to the scan. */
  def intersectsBox(
      cellId: Column,
      bxmin: Double, bymin: Double, bxmax: Double, bymax: Double): Column =
    cellXmin(cellId) < bxmax && cellXmax(cellId) > bxmin &&
      cellYmin(cellId) < bymax && cellYmax(cellId) > bymin
}
