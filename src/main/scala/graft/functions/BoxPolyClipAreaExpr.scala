package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType}

/** area(box ∩ polygon) for an axis-aligned box (xmin,ymin,xmax,ymax
  * columns) against a FIXED simple polygon — Sutherland–Hodgman clipping
  * of the polygon by the box's four half-planes, then the shoelace area.
  * The polygon is a literal baked into the expression (query-constant
  * crop shape), so per-row work is O(vertices).
  *
  * This is the preference-order case (c)/(d): whole-operator geometry
  * Spark's builtin functions cannot express; the kernel is a tiny exact
  * algorithm rather than a geometry library. CodegenFallback — the crop
  * is one narrow map over the cell table, never the hot aggregate path.
  *
  * Reference semantics: emiproc `geoserie_intersection`
  * (emiproc/regrid.py:349-418) / polygon weights of
  * `calculate_weights_mapping` (emiproc/regrid.py:246-260), verified
  * against the reference's hand-computed triangle×square weight tables
  * (tests/test_weights_mapping.py:57-97).
  */
case class BoxPolyClipAreaExpr(
    override val children: Seq[Expression],
    polyX: Seq[Double],
    polyY: Seq[Double])
  extends Expression with CodegenFallback {

  require(children.length == 4, "expects (xmin, ymin, xmax, ymax)")
  require(polyX.length >= 3 && polyX.length == polyY.length, "need >= 3 vertices")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "box_poly_clip_area"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.contains(null)) null
    else {
      val Seq(x0, y0, x1, y1) = vals.map(_.asInstanceOf[Double])
      BoxPolyClipAreaExpr.clipArea(x0, y0, x1, y1, polyX.toArray, polyY.toArray)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoxPolyClipAreaExpr =
    copy(children = newChildren)
}

object BoxPolyClipAreaExpr {

  /** Sutherland–Hodgman: clip polygon (px, py) by the four half-planes of
    * the box, accumulate with the shoelace formula. Exact for simple
    * polygons; orientation-insensitive (abs area). */
  def clipArea(
      bx0: Double, by0: Double, bx1: Double, by1: Double,
      px: Array[Double], py: Array[Double]): Double = {
    // half-planes: keep(x,y) >= 0
    val planes: Array[(Double, Double) => Double] = Array(
      (x, _) => x - bx0,
      (x, _) => bx1 - x,
      (_, y) => y - by0,
      (_, y) => by1 - y)
    var cx = px
    var cy = py
    planes.foreach { f =>
      if (cx.length >= 3) {
        val nx = Array.newBuilder[Double]
        val ny = Array.newBuilder[Double]
        val n = cx.length
        var i = 0
        while (i < n) {
          val j = (i + 1) % n
          val di = f(cx(i), cy(i))
          val dj = f(cx(j), cy(j))
          if (di >= 0) { nx += cx(i); ny += cy(i) }
          if ((di > 0 && dj < 0) || (di < 0 && dj > 0)) {
            val t = di / (di - dj)
            nx += cx(i) + t * (cx(j) - cx(i))
            ny += cy(i) + t * (cy(j) - cy(i))
          }
          i += 1
        }
        cx = nx.result(); cy = ny.result()
      }
    }
    if (cx.length < 3) 0.0
    else {
      var a = 0.0
      var i = 0
      val n = cx.length
      while (i < n) {
        val j = (i + 1) % n
        a += cx(i) * cy(j) - cx(j) * cy(i)
        i += 1
      }
      math.abs(a) / 2.0
    }
  }

  /** Column API: clip area of (xmin,ymin,xmax,ymax) columns vs polygon. */
  def clipAreaCol(
      xmin: Column, ymin: Column, xmax: Column, ymax: Column,
      poly: Seq[(Double, Double)]): Column =
    GraftBridge.column(BoxPolyClipAreaExpr(
      Seq(xmin, ymin, xmax, ymax).map(GraftBridge.expression),
      poly.map(_._1), poly.map(_._2)))
}
