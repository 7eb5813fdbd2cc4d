package graft

import org.apache.spark.sql.functions._
import graft.sources.OsmJson

/** S14 OSM Overpass-JSON reader on the committed fixture
  * (emiproc/utils/osm.py:18-179 semantics). */
class OsmSpec extends SparkSpec {

  private lazy val out =
    OsmJson.read(spark, "fixtures/osm.json").collect().map { r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getInt(4),
        r.getString(5), r.getString(6),
        r.getSeq[Double](7), r.getSeq[Double](8))
    }

  test("tagged node -> point; untagged geometry nodes dropped from output") {
    val pts = out.filter(r => r._2 == "node")
    assert(pts.map(_._1).toSeq == Seq(1L))
    val p = pts.head
    assert(p._6 == "point" && p._7 == Seq(8.5401) && p._8 == Seq(47.3782))
  }

  test("open way -> line with ordered coords; closed way -> polygon") {
    val line = out.find(r => r._1 == 100L).get
    assert(line._6 == "line")
    assert(line._7 == Seq(8.50, 8.51, 8.52))
    val poly = out.find(r => r._1 == 101L).get
    assert(poly._6 == "polygon")
    assert(poly._7 == Seq(8.53, 8.535, 8.535, 8.53))
    assert(out.count(r => r._2 == "way") == 2) // helper ways 102-104 untagged
  }

  test("relation with holes: split outer stitched closed, inner ring kept, " +
    "node member -> point, missing ref skipped") {
    val rel = out.filter(r => r._2 == "relation").sortBy(_._4)
    assert(rel.length == 3)
    val Seq(outer, inner, label) = rel.toSeq
    // outer: way 102 [30,31,32] ++ way 103 [32,33,30].tail -> closed pentagon
    assert(outer._5 == "outer" && outer._6 == "polygon")
    assert(outer._7 == Seq(8.55, 8.56, 8.56, 8.55, 8.55))
    assert(outer._8 == Seq(47.38, 47.38, 47.39, 47.39, 47.38))
    // inner hole ring closes on its own
    assert(inner._5 == "inner" && inner._6 == "polygon")
    assert(inner._7 == Seq(8.553, 8.557, 8.555, 8.553))
    // node member passes through as a point part
    assert(label._6 == "point" && label._7 == Seq(8.5401))
  }

  test("toRingPolys: inner roles become holes; mask area nets them out") {
    import graft.model.RegularGrid
    // synthetic elements: a 2x2 closed way at [0,2]^2 with a [0.5,1.5]^2
    // inner relation hole — net area 4 - 1 = 3 over a 4x4 unit grid
    val nodes = (0 until 8).map { i =>
      val (x, y) = i match {
        case 0 => (0.0, 0.0); case 1 => (2.0, 0.0)
        case 2 => (2.0, 2.0); case 3 => (0.0, 2.0)
        case 4 => (0.5, 0.5); case 5 => (1.5, 0.5)
        case 6 => (1.5, 1.5); case 7 => (0.5, 1.5)
      }
      s"""{"type": "node", "id": ${i + 1}, "lon": $x, "lat": $y}"""
    }
    val json =
      s"""{"elements": [
         |  ${nodes.mkString(",\n  ")},
         |  {"type": "way", "id": 50, "nodes": [1, 2, 3, 4, 1],
         |   "tags": {"landuse": "forest"}},
         |  {"type": "way", "id": 51, "nodes": [5, 6, 7, 8, 5]},
         |  {"type": "relation", "id": 60,
         |   "members": [{"type": "way", "ref": 50, "role": "outer"},
         |               {"type": "way", "ref": 51, "role": "inner"}],
         |   "tags": {"type": "multipolygon"}}
         |]}""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("osmring")
    java.nio.file.Files.write(dir.resolve("rel.json"), json.getBytes("UTF-8"))
    val parts = OsmJson.read(spark, dir.resolve("rel.json").toString)
    val rel60 = OsmJson.toRingPolys(parts.where(col("id") === 60))
    val rings = rel60.collect().map(r => r.getInt(1)).sorted
    assert(rings.toSeq == Seq(0, 1)) // outer shell + inner hole
    val total = graft.ops.SpatialJoin.polyGridWeightsRings(
      spark, RegularGrid(4, 4, 0.0, 0.0, 1.0, 1.0), rel60)
      .agg(sum("area")).head.getDouble(0)
    assert(math.abs(total - 3.0) < 1e-12) // 2x2 shell minus 1x1 hole
  }

  test("relation name and python-dict tag rendering match the reference") {
    val rel = out.find(r => r._2 == "relation").get
    val names = OsmJson.read(spark, "fixtures/osm.json")
      .where(col("el_type") === "relation")
      .select("name", "tags").distinct().collect()
    assert(names.length == 1)
    assert(names(0).getString(0) == "Stadtpark")
    // entries key-sorted (Spark JSON maps don't preserve document order)
    assert(names(0).getString(1) ==
      "{'landuse': 'park', 'name': 'Stadtpark', 'type': 'multipolygon'}")
  }

  test("unmatched way flushes the open chain to an incomplete line") {
    // relation whose two ways cannot stitch: chain flushes as line,
    // second way dropped (osm.py:123-127)
    val dir = java.nio.file.Files.createTempDirectory("osm")
    val json =
      """{"elements": [
        |  {"type": "node", "id": 1, "lon": 1.0, "lat": 1.0},
        |  {"type": "node", "id": 2, "lon": 2.0, "lat": 1.0},
        |  {"type": "node", "id": 3, "lon": 3.0, "lat": 1.0},
        |  {"type": "node", "id": 4, "lon": 4.0, "lat": 1.0},
        |  {"type": "way", "id": 10, "nodes": [1, 2]},
        |  {"type": "way", "id": 11, "nodes": [3, 4]},
        |  {"type": "relation", "id": 20,
        |   "members": [{"type": "way", "ref": 10, "role": "outer"},
        |               {"type": "way", "ref": 11, "role": "outer"}],
        |   "tags": {"type": "multipolygon"}}
        |]}""".stripMargin
    val p = dir.resolve("broken.json")
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    val parts = OsmJson.read(spark, p.toString).collect()
      .map(r => (r.getInt(4), r.getString(6), r.getSeq[Double](7)))
    // the open [1,2] chain flushes as an incomplete line; the unmatched
    // way itself is dropped, exactly as osm.py:123-127 does
    assert(parts.toSet == Set((0, "line", Seq(1.0, 2.0))))
  }
}
