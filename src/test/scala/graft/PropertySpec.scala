package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.model.RegularGrid
import graft.ops.{Grouping, Regrid, Speciation}
import graft.profiles.Profiles

/** Property-style invariants over seeded random inputs — the reference's
  * oracle families (SURVEY §5 / FIXTURES.md §5): mass conservation,
  * weight bounds, ratio normalization, speciation totals. */
class PropertySpec extends SparkSpec {

  private val rnd = new Random(42)

  private def randomGridPair(): (RegularGrid, RegularGrid) = {
    val src = RegularGrid(2 + rnd.nextInt(6), 2 + rnd.nextInt(6), 0.0, 0.0, 1.0, 1.0)
    // dst covers src with margin; dyadic offset/size so sums stay exact
    val off = -1.0 - rnd.nextInt(3) * 0.25
    val d = 1.0 + rnd.nextInt(3) * 0.5
    val nx = math.ceil((src.xmax - off + 1.0) / d).toInt
    val ny = math.ceil((src.ymax - off + 1.0) / d).toInt
    (src, RegularGrid(nx, ny, off, off, d, d))
  }

  private def randomInv(g: RegularGrid) = {
    val rows = (0 until 30).map { _ =>
      (rnd.nextLong(g.ncells), s"c${rnd.nextInt(3)}", s"s${rnd.nextInt(2)}",
        (1 + rnd.nextInt(100)).toDouble)
    }
    spark.createDataFrame(rows).toDF("cell_id", "category", "substance", "value")
  }

  test("property: weights in (0,1], per-src sum == 1 under covering dst") {
    (1 to 6).foreach { _ =>
      val (src, dst) = randomGridPair()
      val rows = Regrid.weights(spark, src, dst).collect()
      assert(rows.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1.0 + 1e-12))
      rows.groupBy(_.getLong(0)).foreach { case (_, ws) =>
        assert(math.abs(ws.map(_.getDouble(2)).sum - 1.0) < 1e-9)
      }
    }
  }

  test("property: remap conserves per-(cat,sub) mass") {
    (1 to 6).foreach { _ =>
      val (src, dst) = randomGridPair()
      val emi = randomInv(src)
      val diff = Grouping.conservationDiff(
        emi, Regrid.remapInventory(spark, emi, src, dst)).collect()
      diff.foreach(r => assert(math.abs(r.getDouble(4)) < 1e-9))
    }
  }

  test("property: normalize yields ratios summing to 1, preserving support") {
    (1 to 6).foreach { _ =>
      val rows = (0 until 40).map { i =>
        (rnd.nextInt(5), i, (1 + rnd.nextInt(50)).toDouble)
      }
      val p = spark.createDataFrame(rows).toDF("profile_id", "pos", "w")
      val sums = Profiles.normalize(p)
        .groupBy("profile_id").agg(sum("ratio")).collect()
      sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12))
    }
  }

  test("property: speciation daughters sum to parent x ratio-sum") {
    (1 to 6).foreach { _ =>
      val emi = randomInv(RegularGrid(4, 4, 0, 0, 1, 1))
      val r1 = 0.25 * (1 + rnd.nextInt(3))
      val r2 = 0.25 * (1 + rnd.nextInt(3))
      val out = Speciation.speciate(spark, emi, Seq(
        ("c0", "s0", "d1", r1), ("c0", "s0", "d2", r2)))
      val tin = totalsBySub(emi).getOrElse(("c0", "s0"), 0.0)
      val t = totalsBySub(out)
      val daughters = t.getOrElse(("c0", "d1"), 0.0) + t.getOrElse(("c0", "d2"), 0.0)
      assert(math.abs(daughters - tin * (r1 + r2)) < 1e-9)
    }
  }
}
