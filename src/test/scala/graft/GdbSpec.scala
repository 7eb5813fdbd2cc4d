package graft

import org.apache.spark.sql.functions._
import graft.sources.FileGdb
import graft.sources.FileGdb._
import GdbFixtures._

/** FileGDB reader against independently-authored byte fixtures
  * (the public reverse-engineered .gdbtable spec; see FIXTURES.md §7). */
class GdbSpec extends SparkSpec {

  private def tmp(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("gdb")

  test("table round-trip: types, nulls, point/polyline/polygon shapes") {
    val fields = Seq(
      FField("OBJECTID", TObjectId),
      FField("Emission_CO2", TFloat64, nullable = true),
      FField("label", TString, nullable = true),
      FField("count", TInt32),
      FField("SHAPE", TGeometry, nullable = true))
    val rows = Seq(
      Seq(FNull, FDouble(12.5), FString("pt"), FInt(7),
        FShape(1, Seq(Seq((3.25, 4.5))))),
      Seq(FNull, FNull, FNull, FInt(8),
        FShape(3, Seq(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 5.0))))),
      Seq(FNull, FDouble(-2.0), FString("poly"), FInt(9),
        FShape(5, Seq(
          Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)),
          Seq((1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0))))))
    val dir = tmp()
    val (t, tx) = buildTable(fields, rows)
    java.nio.file.Files.write(dir.resolve("t.gdbtable"), t)
    java.nio.file.Files.write(dir.resolve("t.gdbtablx"), tx)

    val (rf, rr) = FileGdb.readTable(dir.resolve("t.gdbtable").toString)
    assert(rf.map(_.name) == fields.map(_.name))
    assert(rf.map(_.ftype) == fields.map(_.ftype))
    assert(rr.size == 3)
    assert(rr(0)("OBJECTID") == 1L && rr(0)("Emission_CO2") == 12.5)
    assert(rr(0)("label") == "pt" && rr(0)("count") == 7L)
    val pt = rr(0)("SHAPE").asInstanceOf[Shape]
    assert(pt.shapeType == 1)
    assert(math.abs(pt.xs.head.head - 3.25) < 1e-9)
    assert(math.abs(pt.ys.head.head - 4.5) < 1e-9)
    assert(rr(1)("Emission_CO2") == null && rr(1)("label") == null)
    val line = rr(1)("SHAPE").asInstanceOf[Shape]
    assert(line.shapeType == 3 && line.xs.head.size == 3)
    assert(line.xs.head.map(x => math.round(x * 1e6) / 1e6.toDouble) ==
      Seq(0.0, 10.0, 10.0))
    val poly = rr(2)("SHAPE").asInstanceOf[Shape]
    assert(poly.shapeType == 5 && poly.xs.size == 2) // outer + hole
    assert(poly.xs(1).size == 5)
  }

  test("catalog listing excludes GDB_ system tables; readLayer explodes parts") {
    val layerFields = Seq(
      FField("OBJECTID", TObjectId),
      FField("Emission_CO2", TFloat64, nullable = true),
      FField("SHAPE", TGeometry, nullable = true))
    val dir = tmp().resolve("test.gdb")
    buildGdb(dir, Seq(
      ("c1301_Traffic", layerFields, Seq(
        Seq(FNull, FDouble(100.0),
          FShape(3, Seq(Seq((0.0, 0.0), (8.0, 6.0))))),
        Seq(FNull, FDouble(50.0),
          FShape(3, Seq(
            Seq((0.0, 0.0), (4.0, 0.0)), Seq((0.0, 2.0), (4.0, 2.0))))))),
      ("c2201_Heating", layerFields, Seq(
        Seq(FNull, FDouble(7.0), FShape(1, Seq(Seq((2.0, 3.0)))))))))

    val layers = FileGdb.listLayers(dir.toString)
    assert(layers.map(_._2) == Seq("c1301_Traffic", "c2201_Heating"))

    val df = FileGdb.readLayer(spark, dir.toString, "c1301_Traffic")
    val rows = df.orderBy("OBJECTID", "part").collect()
    assert(rows.length == 3) // 1 single-part + 1 two-part line
    assert(rows(0).getAs[Double]("Emission_CO2") == 100.0)
    assert(rows(1).getAs[Int]("part") == 0 && rows(2).getAs[Int]("part") == 1)
    assert(rows(2).getSeq[Double](rows(2).fieldIndex("ys")) == Seq(2.0, 2.0))

    val pts = FileGdb.readLayer(spark, dir.toString, "c2201_Heating").collect()
    assert(pts.length == 1 && pts(0).getAs[Int]("geom_type") == 1)
  }

  test("gdb line layer composes with bufferLines -> polyGridWeights (S6 chain)") {
    import graft.ops.SpatialJoin
    import graft.model.RegularGrid
    val layerFields = Seq(
      FField("OBJECTID", TObjectId),
      FField("Emission_NOx", TFloat64, nullable = true),
      FField("SHAPE", TGeometry, nullable = true))
    val dir = tmp().resolve("lines.gdb")
    buildGdb(dir, Seq(
      ("c1301_Lines", layerFields, Seq(
        Seq(FNull, FDouble(60.0),
          FShape(3, Seq(Seq((1.0, 2.0), (7.0, 2.0)))))))))
    val lines = FileGdb.readLayer(spark, dir.toString, "c1301_Lines")
      .select(col("OBJECTID").as("line_id"), col("xs"), col("ys"))
    val buffered = SpatialJoin.bufferLines(lines, width = 2.0)
    val w = SpatialJoin.polyGridWeights(
      spark, RegularGrid(8, 4, 0.0, 0.0, 1.0, 1.0),
      buffered.select(col("poly_id"), col("xs"), col("ys")))
    // square-cap buffer of the len-6 line: rect [-1,9]x[0,4] (cap extends
    // by width, half-height = width) -> grid-clipped area 8x4 = 32
    val total = w.agg(sum("area")).collect()(0).getDouble(0)
    assert(math.abs(total - 32.0) < 1e-9)
    assert(w.count() == 32) // every covered unit cell fully inside
  }
}
