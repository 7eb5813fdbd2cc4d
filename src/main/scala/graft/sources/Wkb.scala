package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Well-Known-Binary geometry codec (the public OGC SFA layout) for the
  * 2-D types the inventory surface needs: Point (1), LineString (2),
  * Polygon (3), MultiPolygon (6), both byte orders on read, NDR on
  * write. This is the geometry interchange of the reference's
  * DuckDB-backed inventory (`ST_AsWKB`, emiproc/inventories/zurich/
  * duck.py:46-53) and of standard GeoParquet columns.
  *
  * Decoded form: one [[Part]] per ring — `(part, ring, xs, ys)` with
  * ring 0 the outer shell and higher rings holes, the same vertex-array
  * representation every spatial operator consumes.
  */
object Wkb {

  final case class Part(part: Int, ring: Int, xs: Array[Double], ys: Array[Double])

  final case class Geom(kind: String, parts: Seq[Part])

  def decode(bytes: Array[Byte]): Geom = {
    val b = ByteBuffer.wrap(bytes)
    decodeOne(b)
  }

  private def decodeOne(b: ByteBuffer): Geom = {
    b.order(if (b.get() == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    b.getInt match {
      case 1 =>
        Geom("point", Seq(Part(0, 0, Array(b.getDouble), Array(b.getDouble))))
      case 2 =>
        val (xs, ys) = readRing(b)
        Geom("linestring", Seq(Part(0, 0, xs, ys)))
      case 3 =>
        Geom("polygon", readPolygonRings(b, 0))
      case 6 =>
        val n = b.getInt
        Geom("multipolygon", (0 until n).flatMap { i =>
          val sub = decodeOne(b)
          require(sub.kind == "polygon", s"multipolygon member ${sub.kind}")
          sub.parts.map(p => p.copy(part = i))
        })
      case other =>
        throw new IllegalArgumentException(s"unsupported WKB type $other")
    }
  }

  private def readRing(b: ByteBuffer): (Array[Double], Array[Double]) = {
    val n = b.getInt
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    var i = 0
    while (i < n) { xs(i) = b.getDouble; ys(i) = b.getDouble; i += 1 }
    (xs, ys)
  }

  private def readPolygonRings(b: ByteBuffer, part: Int): Seq[Part] = {
    val nRings = b.getInt
    (0 until nRings).map { r =>
      val (xs, ys) = readRing(b)
      Part(part, r, xs, ys)
    }
  }

  /** Encode a polygon (outer ring + holes) as NDR WKB. Rings are closed
    * by the caller (first == last vertex, the SFA convention). */
  def encodePolygon(rings: Seq[(Array[Double], Array[Double])]): Array[Byte] = {
    val size = 1 + 4 + 4 + rings.map(r => 4 + 16 * r._1.length).sum
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(3).putInt(rings.length)
    rings.foreach { case (xs, ys) =>
      b.putInt(xs.length)
      var i = 0
      while (i < xs.length) { b.putDouble(xs(i)); b.putDouble(ys(i)); i += 1 }
    }
    b.array()
  }

  def encodePoint(x: Double, y: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    b.array()
  }

  def encodeMultiPolygon(
      polys: Seq[Seq[(Array[Double], Array[Double])]]): Array[Byte] = {
    val bodies = polys.map(encodePolygon)
    val b = ByteBuffer.allocate(1 + 4 + 4 + bodies.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(6).putInt(polys.length)
    bodies.foreach(b.put)
    b.array()
  }
}
