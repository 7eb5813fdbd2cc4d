package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Point-vs-polygon classification for a FIXED simple polygon:
  * 2 = interior, 1 = exactly on the boundary, 0 = outside — the
  * `intersects(shape)` / `intersects(shape.boundary)` pair the
  * reference's point-source crop uses
  * (emiproc/inventories/utils.py:225-241). Even-odd ray casting plus an
  * exact on-segment test; O(vertices) per row. */
case class PointInPolyExpr(
    override val children: Seq[Expression],
    polyX: Seq[Double],
    polyY: Seq[Double])
  extends Expression with CodegenFallback {

  require(children.length == 2, "expects (x, y)")
  require(polyX.length >= 3 && polyX.length == polyY.length, "need >= 3 vertices")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "point_in_poly"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.contains(null)) null
    else {
      val Seq(x, y) = vals.map(_.asInstanceOf[Double])
      PointInPolyExpr.classify(x, y, polyX.toArray, polyY.toArray)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PointInPolyExpr =
    copy(children = newChildren)
}

object PointInPolyExpr {

  /** 2 = interior, 1 = boundary, 0 = outside. */
  def classify(x: Double, y: Double, px: Array[Double], py: Array[Double]): Int = {
    val n = px.length
    var inside = false
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val (x1, y1, x2, y2) = (px(i), py(i), px(j), py(j))
      // exact on-segment test: collinear and within the segment's bbox
      val cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
      if (cross == 0.0 &&
        x >= math.min(x1, x2) && x <= math.max(x1, x2) &&
        y >= math.min(y1, y2) && y <= math.max(y1, y2)) return 1
      // even-odd ray cast (rightward ray)
      if ((y1 > y) != (y2 > y)) {
        val xin = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
        if (x < xin) inside = !inside
      }
      i += 1
    }
    if (inside) 2 else 0
  }

  def classifyCol(x: Column, y: Column, poly: Seq[(Double, Double)]): Column =
    GraftBridge.column(PointInPolyExpr(
      Seq(x, y).map(GraftBridge.expression), poly.map(_._1), poly.map(_._2)))
}
