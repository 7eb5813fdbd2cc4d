package graft

import graft.ops.{CountryMask, Speciation}
import graft.model.RegularGrid

class SpeciationSpec extends SparkSpec {

  test("speciate splits mapped pairs and passes others through") {
    val out = Speciation.speciate(spark, basicInv, Seq(
      ("adf", "CO2", "CO2b", 0.25), ("adf", "CO2", "CO2f", 0.75)))
    val t = totalsBySub(out)
    assert(t(("adf", "CO2b")) == 2.5)
    assert(t(("adf", "CO2f")) == 7.5)
    assert(!t.contains(("adf", "CO2")))
    assert(t(("liku", "CO2")) == 10.0) // untouched
    assert(t(("adf", "CH4")) == 25.0)
  }

  test("speciation daughters sum to parent x sum(ratios), even != 1") {
    // molar-mass style ratios summing to 1.1
    val out = Speciation.speciate(spark, basicInv, Seq(
      ("test", "NH3", "N", 0.6), ("test", "NH3", "H3", 0.5)))
    val t = totalsBySub(out)
    assert(math.abs(t(("test", "N")) + t(("test", "H3")) - 15.0 * 1.1) < 1e-9)
  }

  test("speciateNox applies 30/46 molar ratio to NO") {
    val emi = spark.createDataFrame(Seq((0L, "c", "NOx", 46.0)))
      .toDF("cell_id", "category", "substance", "value")
    val t = totalsBySub(Speciation.speciateNox(spark, emi, "NOx", no2Fraction = 0.5))
    assert(t(("c", "NO2")) == 23.0)
    assert(t(("c", "NO")) == 46.0 * 0.5 * 30.0 / 46.0) // = 15
  }

  test("mergeSubstances is the inverse of a ratio-1 speciation") {
    val spec = Speciation.speciate(spark, basicInv, Seq(
      ("adf", "CO2", "CO2b", 0.25), ("adf", "CO2", "CO2f", 0.75)))
    val merged = Speciation.mergeSubstances(spark, spec, "CO2", Seq("CO2b", "CO2f"))
    assert(totalsBySub(merged)(("adf", "CO2")) == 10.0)
  }

  test("bandMask argmax picks dominant band with deterministic ties") {
    val grid = RegularGrid(1, 4, 0.0, 0.0, 1.0, 1.0) // 4 cells stacked in y
    val mask = CountryMask.bandMask(spark, grid, Seq(
      ("A", 0.0, 2.5), ("B", 2.5, 4.0)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // cells y=[0,1),[1,2) fully A; [2,3) is 0.5/0.5 -> tie -> 'A' (asc);
    // [3,4) fully B
    assert(mask == Map(0L -> "A", 1L -> "A", 2L -> "A", 3L -> "B"))
  }

  test("bandMask fractions sum to 1 per covered cell") {
    val grid = RegularGrid(1, 4, 0.0, 0.0, 1.0, 1.0)
    val fr = CountryMask.bandMask(spark, grid,
      Seq(("A", 0.0, 2.5), ("B", 2.5, 4.0)), fractions = true)
    val sums = fr.groupBy("cell_id").sum("fraction").collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12))
  }
}
