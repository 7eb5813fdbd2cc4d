package graft

import org.apache.spark.sql.functions._
import graft.model.RegularGrid
import graft.ops.{Grouping, Regrid}

/** Weight-table oracles + conservation invariants — FIXTURES.md §1.4/§5
  * (reference tests/test_weights_mapping.py, tests/test_remap_inv.py:28-31). */
class RegridSpec extends SparkSpec {

  test("2x2 unit grid onto one 2x2 cell: all weights 1, same dst") {
    val src = RegularGrid(2, 2, 0.0, 0.0, 1.0, 1.0)
    val dst = RegularGrid(1, 1, 0.0, 0.0, 2.0, 2.0)
    val w = Regrid.weights(spark, src, dst).collect()
    assert(w.length == 4)
    assert(w.forall(_.getDouble(2) == 1.0))
    assert(w.forall(_.getLong(1) == 0L))
  }

  test("half-offset coarse grid: dyadic quarter weights, sum to 1 per src") {
    // src 2x2 unit cells; dst 2x2 cells of size 1 offset by (0.5, 0.5) over
    // (-0.5..1.5)^2 — every src cell splits into 4 quarters.
    val src = RegularGrid(2, 2, 0.0, 0.0, 1.0, 1.0)
    val dst = RegularGrid(3, 3, -0.5, -0.5, 1.0, 1.0)
    val w = Regrid.weights(spark, src, dst)
    val perSrc = w.groupBy("src_cell").agg(sum("weight").as("s")).collect()
    assert(perSrc.forall(_.getDouble(1) == 1.0))
    assert(w.collect().forall(_.getDouble(2) == 0.25))
  }

  test("weights bounded in (0,1] and per-src sums == 1 when dst covers src") {
    val src = RegularGrid(8, 8, 0.0, 0.0, 1.0, 1.0)
    val dst = RegularGrid(5, 5, -1.0, -1.0, 2.0, 2.0)
    val rows = Regrid.weights(spark, src, dst).collect()
    assert(rows.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1.0))
    val bySrc = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(2)).sum)
    bySrc.foreach { case (_, s) => assert(math.abs(s - 1.0) < 1e-12) }
  }

  test("remap conserves per-(cat,sub) totals when dst covers src") {
    val src = Tables.srcGrid
    val dst = Tables.dstGrid
    val emi = basicInv // cells 0..4 exist on the 64x64 grid
    val out = Regrid.remapInventory(spark, emi, src, dst)
    val diff = Grouping.conservationDiff(emi, out).collect()
    diff.foreach(r => assert(math.abs(r.getDouble(4)) < 1e-9, r.toString))
  }

  test("cachedWeights computes once then reads the parquet view") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wcache").toString
    val src = RegularGrid(4, 4, 0.0, 0.0, 1.0, 1.0)
    val dst = RegularGrid(2, 2, 0.0, 0.0, 2.0, 2.0)
    val w1 = Regrid.cachedWeights(spark, src, dst, dir).collect()
    val w2 = Regrid.cachedWeights(spark, src, dst, dir).collect() // cache hit
    assert(w1.length == 16 && w2.length == 16)
    assert(w1.map(_.toSeq).toSet == w2.map(_.toSeq).toSet)
    val direct = Regrid.weights(spark, src, dst).collect().map(_.toSeq).toSet
    assert(direct == w1.map(_.toSeq).toSet)
  }

  test("remapDirect == weight-table remap on an uneven grid pair") {
    val src = RegularGrid(8, 8, 0.0, 0.0, 1.0, 1.0)
    val dst = RegularGrid(5, 5, -1.0, -1.0, 2.0, 2.0)
    val emi = basicInv
    val direct = Regrid.remapDirect(emi, src, dst).collect().map(_.toSeq).toSet
    val joined = Regrid.remap(emi, Regrid.weights(spark, src, dst))
      .collect().map(_.toSeq).toSet
    assert(direct == joined)
  }

  test("cropBox scales boundary cells by overlap fraction and drops outside") {
    val grid = RegularGrid(2, 1, 0.0, 0.0, 1.0, 1.0) // cells [0,1]x[0,1], [1,2]x[0,1]
    val emi = spark.createDataFrame(Seq(
      (0L, "c", "s", 10.0), (1L, "c", "s", 10.0)))
      .toDF("cell_id", "category", "substance", "value")
    // box covers right half of cell 0 and none of cell 1's area? No:
    // box (0.5,0)-(1.5,1) covers half of each.
    val out = Regrid.cropBox(emi, grid, 0.5, 0.0, 1.5, 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out == Map(0L -> 5.0, 1L -> 5.0))
  }

  test("clipBox keeps intersecting cells, excludes zero-area touch") {
    val grid = RegularGrid(4, 1, 0.0, 0.0, 1.0, 1.0)
    val emi = spark.createDataFrame(
      (0L until 4L).map(c => (c, "c", "s", 1.0)))
      .toDF("cell_id", "category", "substance", "value")
    // box (1.5,0)-(3.0,1): intersects cells 1 and 2; touches cell 3 at x=3.
    val kept = Regrid.clipBox(emi, grid, 1.5, 0.0, 3.0, 1.0)
      .select("cell_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  // R14 combine_inventories (emiproc/inventories/utils.py:687-711)

  test("combineInventories conserves mass: total = inside-crop + outside-crop") {
    val tri = Seq((0.0, 0.0), (64.0, 0.0), (0.0, 64.0))
    val inside = basicInv
    val outside = basicInv.withColumn("value", col("value") * 3.0)
    val combined = Regrid.combineInventories(
      spark, inside, Tables.srcGrid, outside, Tables.srcGrid, tri, Tables.dstGrid)
    val inPart = graft.ops.PolygonCrop.cropWithPolygon(
      spark, inside, Tables.srcGrid, tri)
    val outPart = graft.ops.PolygonCrop.cropWithPolygon(
      spark, outside, Tables.srcGrid, tri, keepOutside = true)
    val expect = totalsBySub(inPart.unionByName(outPart))
    val got = totalsBySub(combined)
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - expect(k)) < 1e-9, k.toString) }
  }

  test("combineInventories with identical halves equals a plain remap") {
    // w + (1 - w) = 1 per cell, so stitching an inventory with itself must
    // reproduce the straight remap of that inventory (seam invisibility).
    val tri = Seq((0.0, 0.0), (64.0, 0.0), (0.0, 64.0))
    val emi = basicInv
    val combined = Regrid.combineInventories(
      spark, emi, Tables.srcGrid, emi, Tables.srcGrid, tri, Tables.dstGrid)
    val direct = Regrid.remapInventory(spark, emi, Tables.srcGrid, Tables.dstGrid)
    val got = combined.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    val exp = direct.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - exp(k)) < 1e-9, k.toString) }
  }
}
