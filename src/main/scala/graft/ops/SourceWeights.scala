package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.RegularGrid

/** Weight mappings for point and line (segment) sources onto a regular
  * grid — the reference's point/line paths of `calculate_weights_mapping`
  * (emiproc/regrid.py:262-285 and the split/renormalize rules verified by
  * tests/test_weights_mapping.py):
  *
  *  - a POINT intersecting n cells (edge → 2, corner → 4) contributes
  *    1/n to each (Point(1,1) between four unit squares → 1/4 each);
  *  - a LINE contributes its in-cell length fraction to each cell; when
  *    a segment lies exactly on a shared cell edge both cells count it
  *    fully and the per-source sum (> 1) is renormalized — exactly the
  *    reference's `weights /= weights.sum()` duplicate rule;
  *  - sources outside the grid drop out (no rows).
  *
  * Everything is closed-form arithmetic on the analytic grid (parametric
  * Liang–Barsky clipping for segments) — no geometry library, fully
  * codegen'd, narrow except one per-source window/aggregate whose key
  * cardinality grows with the source table (skew-safe at scale).
  */
object SourceWeights {

  private val Big = 1e18

  /** `points(source_id, x, y)` → `(source_id, cell_id, weight)`. */
  def pointWeights(points: DataFrame, grid: RegularGrid): DataFrame = {
    val fx = (col("x") - grid.xmin) / grid.dx
    val fy = (col("y") - grid.ymin) / grid.dy
    // offset 0 = cell right/above the grid line through the point;
    // offset 1 = cell left/below, valid only when the point lies exactly
    // on a grid line (f integral) — that's the multi-cell "intersects".
    val cand = points
      .withColumn("fx", fx)
      .withColumn("fy", fy)
      .select(col("*"), explode(array(lit(0), lit(1))).as("ox"))
      .select(col("*"), explode(array(lit(0), lit(1))).as("oy"))
      .withColumn("ix", floor(col("fx")).cast("long") - col("ox"))
      .withColumn("iy", floor(col("fy")).cast("long") - col("oy"))
      .where(
        (col("ox") === 0 || col("fx") === floor(col("fx"))) &&
          (col("oy") === 0 || col("fy") === floor(col("fy"))) &&
          col("ix").between(0, grid.nx - 1) && col("iy").between(0, grid.ny - 1))
    val n = Window.partitionBy("source_id")
    cand
      .withColumn("weight", lit(1.0) / count(lit(1)).over(n))
      .select(
        col("source_id"),
        (col("ix") * grid.ny + col("iy")).as("cell_id"),
        col("weight"))
  }

  /** Parametric t-interval of the segment inside [lo, hi] on one axis:
    * returns (tmin, tmax); degenerate axis (s == 0) maps to (±Big) by
    * in-range membership (boundary inclusive — a segment ON a cell edge
    * intersects both neighbors, the reference's duplicate-line case). */
  private def axisInterval(p: Column, s: Column, lo: Column, hi: Column): (Column, Column) = {
    val t0 = (lo - p) / s
    val t1 = (hi - p) / s
    val tin = when(s === 0, when(p >= lo && p <= hi, lit(-Big)).otherwise(lit(Big)))
      .otherwise(least(t0, t1))
    val tout = when(s === 0, when(p >= lo && p <= hi, lit(Big)).otherwise(lit(-Big)))
      .otherwise(greatest(t0, t1))
    (tin, tout)
  }

  /** `segments(source_id, x1, y1, x2, y2)` → `(source_id, cell_id,
    * weight)`; weight = clipped-length / segment-length, renormalized to
    * sum 1 when grid-edge duplication pushes the sum above 1. */
  def lineWeights(segments: DataFrame, grid: RegularGrid): DataFrame = {
    val fx1 = (col("x1") - grid.xmin) / grid.dx
    val fy1 = (col("y1") - grid.ymin) / grid.dy
    val fx2 = (col("x2") - grid.xmin) / grid.dx
    val fy2 = (col("y2") - grid.ymin) / grid.dy

    def candSeq(a: Column, b: Column, n: Int): Column = {
      val lo = greatest(lit(0L), floor(least(a, b)).cast("long") - 1)
      val hi = least(lit(n - 1L), floor(greatest(a, b)).cast("long"))
      when(hi >= lo, sequence(lo, hi)).otherwise(array().cast("array<bigint>"))
    }

    val withIdx = segments
      .withColumn("fx1", fx1).withColumn("fy1", fy1)
      .withColumn("fx2", fx2).withColumn("fy2", fy2)
      .select(col("*"), explode(candSeq(col("fx1"), col("fx2"), grid.nx)).as("ix"))
      .select(col("*"), explode(candSeq(col("fy1"), col("fy2"), grid.ny)).as("iy"))

    val sx = col("fx2") - col("fx1")
    val sy = col("fy2") - col("fy1")
    val (txin, txout) = axisInterval(col("fx1"), sx, col("ix").cast("double"), col("ix") + lit(1.0))
    val (tyin, tyout) = axisInterval(col("fy1"), sy, col("iy").cast("double"), col("iy") + lit(1.0))
    val tEn = greatest(txin, tyin, lit(0.0))
    val tEx = least(txout, tyout, lit(1.0))

    val clipped = withIdx
      .withColumn("w", greatest(tEx - tEn, lit(0.0)))
      .where(col("w") > 0)
    val perSource = Window.partitionBy("source_id")
    clipped
      .withColumn("wsum", sum("w").over(perSource))
      .withColumn("weight", when(col("wsum") > 1.0, col("w") / col("wsum")).otherwise(col("w")))
      .select(
        col("source_id"),
        (col("ix") * grid.ny + col("iy")).as("cell_id"),
        col("weight"))
  }

  /** Fold shaped sources into a gridded inventory — the reference's
    * `remap_inventory` gdfs path (emiproc/regrid.py:523-552): weight each
    * source's value onto cells and ADD into the emission table. */
  def addPointSources(
      emissions: DataFrame,
      points: DataFrame, // (source_id, category, substance, value, x, y)
      grid: RegularGrid): DataFrame = {
    val w = pointWeights(points.select("source_id", "x", "y"), grid)
    val gridded = points
      .join(w, "source_id")
      .select(
        col("cell_id"), col("category"), col("substance"),
        (col("value") * col("weight")).as("value"))
    Grouping.addInventories(emissions, gridded)
  }
}
