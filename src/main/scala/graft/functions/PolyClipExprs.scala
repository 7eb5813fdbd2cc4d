package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Per-row polygon clip kernels where the polygon comes from ARRAY
  * COLUMNS (not a query-constant literal like [[BoxPolyClipAreaExpr]]) —
  * the refine stage of the tile-bucketed spatial join
  * ([[graft.ops.SpatialJoin]]), the general form of the reference's
  * sjoin+intersection weight computation (emiproc/regrid.py:232-301).
  *
  * CodegenFallback: these run AFTER tile/bbox pruning on the surviving
  * candidate pairs only, never over the raw fact table.
  */
object PolyClipKernel {

  /** area(subject ∩ clip) where `clip` is CONVEX: Sutherland–Hodgman
    * clipping of the subject by each clip-edge half-plane (orientation
    * normalized to CCW first), then the shoelace area. Exact for simple
    * subject polygons; subject orientation-insensitive (abs area). */
  def convexClipArea(
      sx: Array[Double], sy: Array[Double],
      cxs: Array[Double], cys: Array[Double]): Double = {
    // normalize clip orientation to CCW so "inside" is the left side
    var signed = 0.0
    var i = 0
    val m = cxs.length
    while (i < m) {
      val j = (i + 1) % m
      signed += cxs(i) * cys(j) - cxs(j) * cys(i)
      i += 1
    }
    val (kx, ky) = if (signed >= 0) (cxs, cys) else (cxs.reverse, cys.reverse)

    var px = sx
    var py = sy
    i = 0
    while (i < m && px.length >= 3) {
      val j = (i + 1) % m
      val ex0 = kx(i); val ey0 = ky(i)
      val edx = kx(j) - ex0; val edy = ky(j) - ey0
      // f(x,y) = cross(edge, p - edgeStart) >= 0 keeps the left side
      val nx = Array.newBuilder[Double]
      val ny = Array.newBuilder[Double]
      val n = px.length
      var k = 0
      while (k < n) {
        val l = (k + 1) % n
        val di = edx * (py(k) - ey0) - edy * (px(k) - ex0)
        val dj = edx * (py(l) - ey0) - edy * (px(l) - ex0)
        if (di >= 0) { nx += px(k); ny += py(k) }
        if ((di > 0 && dj < 0) || (di < 0 && dj > 0)) {
          val t = di / (di - dj)
          nx += px(k) + t * (px(l) - px(k))
          ny += py(k) + t * (py(l) - py(k))
        }
        k += 1
      }
      px = nx.result(); py = ny.result()
      i += 1
    }
    shoelace(px, py)
  }

  /** abs shoelace area of a vertex list. */
  def shoelace(px: Array[Double], py: Array[Double]): Double = {
    if (px.length < 3) return 0.0
    var a = 0.0
    var i = 0
    val n = px.length
    while (i < n) {
      val j = (i + 1) % n
      a += px(i) * py(j) - px(j) * py(i)
      i += 1
    }
    math.abs(a) / 2.0
  }
}

/** area(box ∩ polygon) with the polygon taken from per-row array columns
  * `(bxmin, bymin, bxmax, bymax, xs, ys)` — the grid-cell refine kernel of
  * the spatial join (axis-aligned box clip is the fast special case of
  * the convex clip; delegates to [[BoxPolyClipAreaExpr.clipArea]]). */
case class PolyClipAreaExpr(override val children: Seq[Expression])
  extends Expression with CodegenFallback {

  require(children.length == 6, "expects (bxmin, bymin, bxmax, bymax, xs, ys)")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "poly_clip_area"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.contains(null)) null
    else {
      val Seq(x0, y0, x1, y1) = vals.take(4).map(_.asInstanceOf[Double])
      val px = vals(4).asInstanceOf[ArrayData].toDoubleArray()
      val py = vals(5).asInstanceOf[ArrayData].toDoubleArray()
      if (px.length < 3 || px.length != py.length) 0.0
      else BoxPolyClipAreaExpr.clipArea(x0, y0, x1, y1, px, py)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PolyClipAreaExpr =
    copy(children = newChildren)
}

object PolyClipAreaExpr {
  def col(bxmin: Column, bymin: Column, bxmax: Column, bymax: Column,
      xs: Column, ys: Column): Column =
    GraftBridge.column(PolyClipAreaExpr(
      Seq(bxmin, bymin, bxmax, bymax, xs, ys).map(GraftBridge.expression)))
}

/** area(subject ∩ convexClip) for two per-row vertex-array polygons
  * `(sxs, sys, cxs, cys)`; the clip side must be convex (grid cells,
  * ICON triangles, hex cells all are). */
case class ConvexClipAreaExpr(override val children: Seq[Expression])
  extends Expression with CodegenFallback {

  require(children.length == 4, "expects (sxs, sys, cxs, cys)")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "convex_clip_area"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.contains(null)) null
    else {
      val Seq(sx, sy, cx, cy) = vals.map(_.asInstanceOf[ArrayData].toDoubleArray())
      if (sx.length < 3 || cx.length < 3 ||
        sx.length != sy.length || cx.length != cy.length) 0.0
      else PolyClipKernel.convexClipArea(sx, sy, cx, cy)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ConvexClipAreaExpr =
    copy(children = newChildren)
}

object ConvexClipAreaExpr {
  def col(sxs: Column, sys: Column, cxs: Column, cys: Column): Column =
    GraftBridge.column(ConvexClipAreaExpr(
      Seq(sxs, sys, cxs, cys).map(GraftBridge.expression)))
}

/** [[PointInPolyExpr]] with the polygon from per-row array columns
  * `(x, y, xs, ys)`: 2 = interior, 1 = boundary, 0 = outside. */
case class PointInPolyArrayExpr(override val children: Seq[Expression])
  extends Expression with CodegenFallback {

  require(children.length == 4, "expects (x, y, xs, ys)")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "point_in_poly_arr"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.contains(null)) null
    else {
      val x = vals(0).asInstanceOf[Double]
      val y = vals(1).asInstanceOf[Double]
      val px = vals(2).asInstanceOf[ArrayData].toDoubleArray()
      val py = vals(3).asInstanceOf[ArrayData].toDoubleArray()
      if (px.length < 3 || px.length != py.length) 0
      else PointInPolyExpr.classify(x, y, px, py)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PointInPolyArrayExpr =
    copy(children = newChildren)
}

object PointInPolyArrayExpr {
  def col(x: Column, y: Column, xs: Column, ys: Column): Column =
    GraftBridge.column(PointInPolyArrayExpr(
      Seq(x, y, xs, ys).map(GraftBridge.expression)))
}

/** abs shoelace area of a per-row vertex-array polygon `(xs, ys)`. */
case class PolyAreaExpr(override val children: Seq[Expression])
  extends Expression with CodegenFallback {

  require(children.length == 2, "expects (xs, ys)")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "poly_area"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.contains(null)) null
    else {
      val Seq(px, py) = vals.map(_.asInstanceOf[ArrayData].toDoubleArray())
      if (px.length < 3 || px.length != py.length) 0.0
      else PolyClipKernel.shoelace(px, py)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PolyAreaExpr =
    copy(children = newChildren)
}

object PolyAreaExpr {
  def col(xs: Column, ys: Column): Column =
    GraftBridge.column(PolyAreaExpr(Seq(xs, ys).map(GraftBridge.expression)))
}
