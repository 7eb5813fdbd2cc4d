package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PolyClipKernel
import graft.model.RegularGrid
import graft.ops.SpatialJoin

/** The general polygon spatial join against the reference's hand-computed
  * weight tables (tests/test_weights_mapping.py:14-97) and the tile-join
  * invariants (each overlapping pair exactly once, any tile size). */
class SpatialJoinSpec extends SparkSpec {

  // the reference's 4 triangles (tests/test_weights_mapping.py:22-29)
  private val triangles = Seq(
    Seq((0.5, 0.5), (0.5, 1.5), (1.5, 1.5)),
    Seq((0.5, 0.5), (1.5, 0.5), (1.5, 1.5)),
    Seq((2.5, 0.5), (1.5, 1.5), (1.5, 0.5)),
    Seq((2.5, 0.5), (2.5, 1.5), (1.5, 1.5)))

  private val grid = RegularGrid(3, 2, 0.0, 0.0, 1.0, 1.0)
  // reference squares 0..4 = our x-major cells 0,1,2,3,5
  private val squareToCell = Map(0 -> 0L, 1 -> 1L, 2 -> 2L, 3 -> 3L, 4 -> 5L)

  private def triDf: DataFrame =
    spark.createDataFrame(
      triangles.zipWithIndex.map { case (t, i) =>
        (i.toLong, t.map(_._1).toArray, t.map(_._2).toArray)
      }).toDF("poly_id", "xs", "ys")

  test("polyGridWeights reproduces the reference square->triangle table") {
    // expected_weights (tests/test_weights_mapping.py:57-78)
    val expected = Map(
      (0, 0) -> 0.125, (1, 0) -> 0.25, (3, 0) -> 0.125,
      (0, 1) -> 0.125, (2, 1) -> 0.25, (3, 1) -> 0.125,
      (2, 2) -> 0.25, (3, 2) -> 0.125,
      (3, 3) -> 0.125, (4, 3) -> 0.25)
    val w = SpatialJoin.polyGridWeights(spark, grid, triDf)
      .collect().map(r => (r.getLong(1), r.getLong(0)) -> r.getDouble(3)).toMap
    for (sq <- 0 to 4; t <- 0 to 3) {
      val got = w.getOrElse((squareToCell(sq), t.toLong), 0.0)
      val exp = expected.getOrElse((sq, t), 0.0)
      assert(math.abs(got - exp) < 1e-12, s"square $sq triangle $t: $got != $exp")
    }
  }

  test("polyGridWeights normalizeByPoly reproduces weights_triangle_to_square") {
    val expected = Map(
      (0, 0) -> 0.25, (0, 1) -> 0.5, (0, 3) -> 0.25,
      (1, 0) -> 0.25, (1, 2) -> 0.5, (1, 3) -> 0.25,
      (2, 2) -> 0.5, (2, 3) -> 0.25,
      (3, 3) -> 0.25, (3, 4) -> 0.5)
    val w = SpatialJoin.polyGridWeights(spark, grid, triDf, normalizeByPoly = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    for (sq <- 0 to 4; t <- 0 to 3) {
      val got = w.getOrElse((t.toLong, squareToCell(sq)), 0.0)
      val exp = expected.getOrElse((t, sq), 0.0)
      assert(math.abs(got - exp) < 1e-12, s"triangle $t square $sq: $got != $exp")
    }
  }

  test("polyPolyWeights over grid-as-polygons equals polyGridWeights") {
    val cellsAsPolys = SpatialJoin.gridAsPolygons(spark, grid)
    val viaTiles = SpatialJoin.polyPolyWeights(
      triDf, cellsAsPolys, tileSize = 1.0, normalize = "none")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val direct = SpatialJoin.polyGridWeights(spark, grid, triDf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(viaTiles.keySet == direct.keySet)
    viaTiles.foreach { case (k, a) =>
      assert(math.abs(a - direct(k)) < 1e-12, s"$k: $a != ${direct(k)}")
    }
  }

  test("tilePairs emits each overlapping pair exactly once, any tile size") {
    // polygons spanning several tiles — the reference-point rule must
    // dedup the multi-tile matches
    val a = spark.createDataFrame(Seq(
      (1L, Array(0.2, 9.8, 9.8, 0.2), Array(0.2, 0.2, 5.7, 5.7)),
      (2L, Array(6.0, 14.0, 14.0, 6.0), Array(4.0, 4.0, 12.0, 12.0))))
      .toDF("poly_id", "xs", "ys")
    val b = spark.createDataFrame(Seq(
      (10L, Array(3.0, 8.0, 8.0, 3.0), Array(1.0, 1.0, 9.0, 9.0)),
      (20L, Array(100.0, 101.0, 101.0, 100.0), Array(0.0, 0.0, 1.0, 1.0))))
      .toDF("poly_id", "xs", "ys")
    for (t <- Seq(1.0, 2.5, 4.0, 16.0)) {
      val pairs = SpatialJoin.tilePairs(a, b, t)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.length == pairs.distinct.length, s"dup pairs at tile=$t")
      assert(pairs.toSet == Set((1L, 10L), (2L, 10L)), s"wrong pairs at tile=$t")
    }
  }

  test("convex clip kernel: diamond x square, containment, disjoint") {
    // unit diamond centered at (1,1) clipped by the unit square [0,1]^2:
    // quarter of the diamond -> area 1/8... the diamond |x-1|+|y-1|<=0.5
    // has area 0.5; the square catches exactly a quarter = 0.125
    val dx = Array(1.0, 1.5, 1.0, 0.5)
    val dy = Array(0.5, 1.0, 1.5, 1.0)
    val sq = (Array(0.0, 1.0, 1.0, 0.0), Array(0.0, 0.0, 1.0, 1.0))
    assert(math.abs(
      PolyClipKernel.convexClipArea(dx, dy, sq._1, sq._2) - 0.125) < 1e-12)
    // clip orientation-insensitivity: CW clip gives the same area
    val sqCw = (Array(0.0, 0.0, 1.0, 1.0), Array(0.0, 1.0, 1.0, 0.0))
    assert(math.abs(
      PolyClipKernel.convexClipArea(dx, dy, sqCw._1, sqCw._2) - 0.125) < 1e-12)
    // containment
    assert(math.abs(PolyClipKernel.convexClipArea(
      dx, dy, Array(-5.0, 5.0, 5.0, -5.0), Array(-5.0, -5.0, 5.0, 5.0)) - 0.5) < 1e-12)
    // disjoint
    assert(PolyClipKernel.convexClipArea(
      dx, dy, Array(8.0, 9.0, 9.0, 8.0), Array(8.0, 8.0, 9.0, 9.0)) == 0.0)
  }

  test("polygonMask argmax + fractions on overlapping countries") {
    val g = RegularGrid(4, 4, 0.0, 0.0, 1.0, 1.0)
    val countries = spark.createDataFrame(Seq(
      ("AA", Array(0.0, 3.0, 3.0, 0.0), Array(0.0, 0.0, 4.0, 4.0)),
      ("BB", Array(2.5, 4.0, 4.0, 2.5), Array(0.0, 0.0, 4.0, 4.0))))
      .toDF("country", "xs", "ys")
    val mask = SpatialJoin.polygonMask(spark, g, countries)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // x-major 4x4: column ix=2 cells overlap AA 1.0 vs BB 0.5 -> AA;
    // ix=3 cells only BB
    assert(mask(g.ncells.toInt - 1) == "BB") // cell (3,3)
    assert(mask(2L * 4 + 1) == "AA") // cell (2,1): AA wins 1.0 vs 0.5
    assert(mask(0L) == "AA")
    val fr = SpatialJoin.polygonMask(spark, g, countries, fractions = true)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(fr((9L, "AA")) == 1.0) // cell (2,1) ix=2
    assert(fr((9L, "BB")) == 0.5)
    assert(!fr.contains((13L, "AA"))) // ix=3 outside AA
  }

  test("hole-aware mask: an enclave country excludes its host (Lesotho rule)") {
    val g = RegularGrid(4, 4, 0.0, 0.0, 1.0, 1.0)
    // AA: 4x4 shell with a hole over [1,2.5]x[1,1.5]; BB fills the hole
    val countries = spark.createDataFrame(Seq(
      ("AA", 0, Array(0.0, 4.0, 4.0, 0.0), Array(0.0, 0.0, 4.0, 4.0)),
      ("AA", 1, Array(1.0, 2.5, 2.5, 1.0), Array(1.0, 1.0, 1.5, 1.5)),
      ("BB", 0, Array(1.0, 2.5, 2.5, 1.0), Array(1.0, 1.0, 1.5, 1.5))))
      .toDF("country", "ring", "xs", "ys")
    val fr = SpatialJoin.polygonMask(spark, g, countries, fractions = true)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    // cell (1,1) = id 1*4+1 = 5: hole covers [1,2]x[1,1.5] of it ->
    // AA net 0.5, BB 0.5; cell (2,1) = id 9: hole covers [2,2.5]x[1,1.5]
    // -> AA 0.75, BB 0.25; untouched cell keeps AA 1.0
    assert(math.abs(fr((5L, "AA")) - 0.5) < 1e-12)
    assert(math.abs(fr((5L, "BB")) - 0.5) < 1e-12)
    assert(math.abs(fr((9L, "AA")) - 0.75) < 1e-12)
    assert(math.abs(fr((9L, "BB")) - 0.25) < 1e-12)
    assert(fr((0L, "AA")) == 1.0 && !fr.contains((0L, "BB")))
    // argmax: the 0.75 cell goes to AA, the balanced cell ties to AA
    // (area tie-break by name); a cell where the hole dominates -> BB
    val g2 = RegularGrid(4, 4, 0.0, 0.0, 1.0, 1.0)
    val c2 = spark.createDataFrame(Seq(
      ("AA", 0, Array(0.0, 4.0, 4.0, 0.0), Array(0.0, 0.0, 4.0, 4.0)),
      ("AA", 1, Array(1.0, 2.0, 2.0, 1.0), Array(1.0, 1.0, 2.0, 2.0)),
      ("BB", 0, Array(1.0, 2.0, 2.0, 1.0), Array(1.0, 1.0, 2.0, 2.0))))
      .toDF("country", "ring", "xs", "ys")
    val mask = SpatialJoin.polygonMask(spark, g2, c2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // cell (1,1) is EXACTLY the hole: AA net 0 drops out, BB wins —
    // the single-ring path would have tied AA at full area
    assert(mask(5L) == "BB")
    assert(mask(0L) == "AA")
  }

  test("ring weights: a two-shell multipolygon sums its parts") {
    val g = RegularGrid(4, 1, 0.0, 0.0, 1.0, 1.0)
    // two disjoint half-cell shells of the same polygon in cells 0 and 2
    val mp = spark.createDataFrame(Seq(
      ("MM", 0, Array(0.0, 0.5, 0.5, 0.0), Array(0.0, 0.0, 1.0, 1.0)),
      ("MM", 0, Array(2.0, 2.5, 2.5, 2.0), Array(0.0, 0.0, 1.0, 1.0))))
      .toDF("poly_id", "ring", "xs", "ys")
    val w = SpatialJoin.polyGridWeightsRings(spark, g, mp)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(w == Map(0L -> 0.5, 2L -> 0.5))
    // normalizeByPoly divides by the summed part area (1.0 total)
    val wn = SpatialJoin.polyGridWeightsRings(spark, g, mp, normalizeByPoly = true)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(wn == Map(0L -> 0.5, 2L -> 0.5))
  }

  test("remap onto an ICON-style triangle mesh: halves cells, conserves mass") {
    val g = RegularGrid(3, 2, 0.0, 0.0, 1.0, 1.0)
    val tris = SpatialJoin.triangulateGrid(spark, g)
    assert(tris.count() == 12)
    val emi = basicInv
    val out = SpatialJoin.remapAcrossPolygons(
      spark, emi, SpatialJoin.gridAsPolygons(spark, g), tris, tileSize = 1.0)
    val total = emi.groupBy().sum("value").collect()(0).getDouble(0)
    val remapped = out.groupBy().sum("value").collect()(0).getDouble(0)
    assert(math.abs(total - remapped) < 1e-9)
    // each cell splits 50/50 between its two triangles
    val byTri = out.where(col("category") === "adf" && col("substance") === "CH4")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // cell 1 has adf/CH4 = 4.0 -> triangles 2 and 3 get 2.0 each
    assert(math.abs(byTri(2L) - 2.0) < 1e-12)
    assert(math.abs(byTri(3L) - 2.0) < 1e-12)
  }

  test("bufferLines: square-cap rectangles match shapely buffer areas") {
    import graft.functions.PolyAreaExpr
    val lines = spark.createDataFrame(Seq(
      (1L, Array(0.0, 10.0), Array(0.0, 0.0)), // horizontal
      (2L, Array(0.0, 3.0), Array(0.0, 4.0)), // diagonal, len 5
      (3L, Array(0.0, 2.0, 2.0), Array(0.0, 0.0, 2.0)))) // two segments
      .toDF("line_id", "xs", "ys")
    val buf = SpatialJoin.bufferLines(lines, width = 2.0)
    val areas = buf
      .select(col("poly_id"), col("seg"),
        PolyAreaExpr.col(col("xs"), col("ys")).as("a"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // square-cap single segment: (len + 2w) * 2w
    assert(math.abs(areas((1L, 0)) - 14.0 * 4.0) < 1e-9)
    assert(math.abs(areas((2L, 0)) - 9.0 * 4.0) < 1e-9)
    assert(math.abs(areas((3L, 0)) - 6.0 * 4.0) < 1e-9)
    assert(math.abs(areas((3L, 1)) - 6.0 * 4.0) < 1e-9)
    // horizontal buffer bbox: x in [-2, 12], y in [-2, 2]
    val h = buf.where(col("poly_id") === 1).collect()(0)
    val xs = h.getSeq[Double](2); val ys = h.getSeq[Double](3)
    assert(xs.min == -2.0 && xs.max == 12.0)
    assert(ys.min == -2.0 && ys.max == 2.0)
  }

  test("remapToPolygons conserves mass for zones covering the grid") {
    val g = RegularGrid(3, 2, 0.0, 0.0, 1.0, 1.0)
    val zones = spark.createDataFrame(Seq(
      (0L, Array(0.0, 1.5, 1.5, 0.0), Array(0.0, 0.0, 2.0, 2.0)),
      (1L, Array(1.5, 3.0, 3.0, 1.5), Array(0.0, 0.0, 2.0, 2.0))))
      .toDF("poly_id", "xs", "ys")
    val emi = basicInv // cells 0..4 live on the 3x2 grid
    val out = SpatialJoin.remapToPolygons(spark, emi, g, zones)
    val total = emi.groupBy().sum("value").collect()(0).getDouble(0)
    val remapped = out.groupBy().sum("value").collect()(0).getDouble(0)
    assert(math.abs(total - remapped) < 1e-9)
  }
}
