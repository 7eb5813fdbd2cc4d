package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.BoxPolyClipAreaExpr
import graft.model.RegularGrid

/** Crop / weight-map against an arbitrary simple polygon — the general
  * form of the reference's `crop_with_shape` / `geoserie_intersection`
  * (emiproc/inventories/utils.py:120-261, emiproc/regrid.py:349-418):
  * each cell's weight is the fraction of its area inside the polygon;
  * `keepOutside` inverts (1 − w); zero-weight cells are dropped
  * (`drop_unused`). Narrow map over the cell table — the polygon is a
  * broadcast-free literal inside the expression.
  */
object PolygonCrop {

  /** `(cell_id, weight)` for cells overlapping the polygon; weight =
    * area(cell ∩ poly) / area(cell), or / area(poly) with
    * `normalizeByPoly` (the reference's polygon-source weight view). */
  def cellWeights(
      spark: SparkSession,
      grid: RegularGrid,
      poly: Seq[(Double, Double)],
      normalizeByPoly: Boolean = false): DataFrame = {
    val area = BoxPolyClipAreaExpr.clipAreaCol(
      col("xmin"), col("ymin"), col("xmax"), col("ymax"), poly)
    val denom =
      if (normalizeByPoly) math.abs(shoelace(poly))
      else grid.cellArea
    grid.cells(spark)
      .withColumn("weight", area / denom)
      .where(col("weight") > 0)
      .select("cell_id", "weight")
  }

  /** Above this vertex count the O(V) Sutherland–Hodgman clip is
    * amortized per distinct CELL through the broadcast weight table;
    * at or below it the clip is evaluated inline per emission row. */
  val InlineClipMaxVertices = 64

  /** Crop an inventory by the polygon: value × inside-fraction, boundary
    * cells partial, zero-weight cells dropped; `keepOutside` keeps the
    * complement instead.
    *
    * Scale shape: for small polygons (≤ [[InlineClipMaxVertices]]
    * vertices — study boxes, admin outlines) the clip weight is computed
    * INLINE on each row's analytic cell box: a narrow codegen'd map with
    * no weight table, no broadcast, no join — zero-shuffle at ANY grid
    * size, where the broadcast weight table would grow with the grid
    * (hundreds of millions of rows for a continent polygon on a 100×
    * grid). Many-vertex polygons keep the per-cell weight table
    * (clip cost amortizes over rows sharing a cell). Both paths use the
    * same expressions on the same inputs — numerically identical. */
  def cropWithPolygon(
      spark: SparkSession,
      emissions: DataFrame,
      grid: RegularGrid,
      poly: Seq[(Double, Double)],
      keepOutside: Boolean = false): DataFrame = {
    if (poly.length <= InlineClipMaxVertices) {
      val cid = col("cell_id")
      val area = BoxPolyClipAreaExpr.clipAreaCol(
        grid.cellXmin(cid), grid.cellYmin(cid),
        grid.cellXmax(cid), grid.cellYmax(cid), poly)
      val inside = area / grid.cellArea
      val frac = if (keepOutside) lit(1.0) - inside else inside
      emissions
        .withColumn("value", col("value") * frac)
        .where(col("value") =!= 0.0)
    } else {
      val w = cellWeights(spark, grid, poly)
      val joined = emissions.join(broadcast(w), Seq("cell_id"), "left")
      val inside = coalesce(col("weight"), lit(0.0))
      val frac = if (keepOutside) lit(1.0) - inside else inside
      joined
        .withColumn("value", col("value") * frac)
        .drop("weight")
        .where(col("value") =!= 0.0)
    }
  }

  /** Crop POINT sources by the polygon with the reference's boundary
    * rule (emiproc/inventories/utils.py:225-241): inside kept, exactly-
    * on-boundary halved, outside dropped; `keepOutside` keeps the
    * complement (boundary still halved). `points` needs (x, y, value). */
  def cropPointSources(
      points: DataFrame,
      poly: Seq[(Double, Double)],
      keepOutside: Boolean = false): DataFrame = {
    val code = graft.functions.PointInPolyExpr.classifyCol(col("x"), col("y"), poly)
    val w =
      if (keepOutside)
        when(code === 0, 1.0).when(code === 1, 0.5).otherwise(0.0)
      else
        when(code === 2, 1.0).when(code === 1, 0.5).otherwise(0.0)
    points
      .withColumn("_w", w)
      .where(col("_w") > 0)
      .withColumn("value", col("value") * col("_w"))
      .drop("_w")
  }

  private def shoelace(poly: Seq[(Double, Double)]): Double =
    poly.indices.map { i =>
      val (x1, y1) = poly(i)
      val (x2, y2) = poly((i + 1) % poly.length)
      x1 * y2 - x2 * y1
    }.sum / 2.0
}
