package graft

import graft.ops.{CountryMask, Speciation}
import graft.model.RegularGrid
import org.apache.spark.sql.functions.col

class SpeciationSpec extends SparkSpec {

  test("mergeSubstancesMap: no-drop keeps sources, rename preserves totals, " +
    "target-as-source raises (test_speciation.py:312-371)") {
    val emi = spark.createDataFrame(Seq(
      (0L, "c", "CO2", 10.0), (0L, "c", "CH4", 2.0), (0L, "c", "NOx", 1.0)))
      .toDF("cell_id", "category", "substance", "value")
    val noDrop = Speciation.mergeSubstancesMap(spark, emi,
      Map("GHG" -> Seq("CO2", "CH4")), drop = false)
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    assert(noDrop == Map(
      "CO2" -> 10.0, "CH4" -> 2.0, "NOx" -> 1.0, "GHG" -> 12.0))
    val renamed = Speciation.mergeSubstancesMap(spark, emi,
      Map("co2" -> Seq("CO2")))
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    assert(renamed == Map("co2" -> 10.0, "CH4" -> 2.0, "NOx" -> 1.0))
    intercept[IllegalArgumentException](Speciation.mergeSubstancesMap(
      spark, emi, Map("GHG" -> Seq("CO2", "CH4"), "GHG2" -> Seq("GHG"))))
    intercept[IllegalArgumentException](Speciation.mergeSubstancesMap(
      spark, emi, Map("CO2" -> Seq("CO2", "CH4"), "GHG2" -> Seq("CO2"))))
    // a merged group may reuse its own name (merge INTO an existing one)
    val self = Speciation.mergeSubstancesMap(spark, emi,
      Map("CO2" -> Seq("CO2", "CH4")))
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    assert(self == Map("CO2" -> 12.0, "NOx" -> 1.0))
  }

  test("mergeSubstancesMap edge semantics: pre-existing target is " +
    "OVERWRITTEN not summed; absent source raises (speciation.py:504-569)") {
    val emi = spark.createDataFrame(Seq(
      (0L, "c", "GHG", 99.0), (0L, "c", "CO2", 10.0), (0L, "c", "CH4", 2.0)))
      .toDF("cell_id", "category", "substance", "value")
    // reference: inv_df["GHG"] = CO2 + CH4 assigns the column — the old
    // GHG value 99 must vanish, never be summed into 12
    val drop = Speciation.mergeSubstancesMap(spark, emi,
      Map("GHG" -> Seq("CO2", "CH4")))
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    assert(drop == Map("GHG" -> 12.0))
    // drop = false: sources kept, old GHG still overwritten — and no
    // duplicate (cell, category, substance) keys
    val noDrop = Speciation.mergeSubstancesMap(spark, emi,
      Map("GHG" -> Seq("CO2", "CH4")), drop = false)
      .collect().map(r => r.getString(2) -> r.getDouble(3))
    assert(noDrop.map(_._1).sorted.toSeq == Seq("CH4", "CO2", "GHG"))
    assert(noDrop.toMap == Map("CO2" -> 10.0, "CH4" -> 2.0, "GHG" -> 12.0))
    // pandas KeyError parity: a source absent from the inventory raises
    val err = intercept[IllegalArgumentException](
      Speciation.mergeSubstancesMap(spark, emi,
        Map("X" -> Seq("CO2", "N2O"))))
    assert(err.getMessage.contains("N2O"))
    // validate = false skips the presence scan (the 100 TB path): the
    // absent source then just contributes nothing
    val lax = Speciation.mergeSubstancesMap(spark, emi,
      Map("X" -> Seq("CO2", "N2O")), validate = false)
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    assert(lax == Map("X" -> 10.0, "GHG" -> 99.0, "CH4" -> 2.0))
  }

  test("co2BioTable mirrors the reference [r, 1-r] construction; Zurich " +
    "table ships complete") {
    import graft.model.ZurichData
    assert(ZurichData.Co2BioRatios.size == 65)
    assert(ZurichData.Co2BioRatios("c2301_KHKWKehricht_Emissionen_Kanton") == 0.52)
    assert(ZurichData.Co2BioRatios("c1301_Personenwagen_Emissionen_Kanton") == 0.023984)
    assert(ZurichData.Co2BioRatios.values.forall(r => r >= 0.0 && r <= 1.0))
    val t = Speciation.co2BioTable(spark, Map("cat" -> 0.52)).collect()
      .map(r => r.getString(2) -> (r.getString(1), r.getDouble(3))).toMap
    assert(t("CO2_bio") == (("-99", 0.52)))
    assert(t("CO2_fos") == (("-99", 1.0 - 0.52)))
    // applied through speciateFromTable: daughters sum back to parent
    val emi = spark.createDataFrame(Seq((0L, "cat", "CO2", 100.0)))
      .toDF("cell_id", "category", "substance", "value")
    val noFr = spark.createDataFrame(Seq.empty[(Long, String, Double)])
      .toDF("cell_id", "country", "fraction")
    val out = Speciation.speciateFromTable(spark, emi, noFr,
      Speciation.co2BioTable(spark, Map("cat" -> 0.52)), "CO2")
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    assert(out == Map("CO2_bio" -> 52.0, "CO2_fos" -> 48.0))
  }

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

  private def writeCsv(lines: String*): String = {
    val f = java.nio.file.Files.createTempFile("spec_table", ".csv")
    java.nio.file.Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("SpeciationCsv.read: comments skipped, long melt, dims typed") {
    val p = writeCsv(
      "# speciation table",
      "category,country,type,year,SA,SB",
      "# another comment",
      "adf,C1,gridded,2024,0.25,0.75",
      "adf,-99,gridded,2024,0.5,0.5")
    val t = graft.sources.SpeciationCsv.read(spark, p)
    assert(t.columns.toSeq ==
      Seq("category", "country", "type", "year", "new_substance", "ratio"))
    val rows = t.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(3), r.getString(4)) -> r.getDouble(5)).toMap
    assert(rows(("adf", "C1", 2024, "SA")) == 0.25)
    assert(rows(("adf", "-99", 2024, "SB")) == 0.5)
    assert(rows.size == 4)
  }

  test("SpeciationCsv.read: row-sum validation fires, dropZeros removes") {
    val bad = writeCsv("category,SA,SB", "adf,0.5,0.4")
    intercept[IllegalArgumentException] {
      graft.sources.SpeciationCsv.read(spark, bad)
    }
    // check_sum off lets it through
    assert(graft.sources.SpeciationCsv.read(spark, bad, checkSum = false)
      .count() == 2)
    val zeros = writeCsv("category,SA,SB", "adf,1.0,0.0", "blek,0.0,0.0")
    val t = graft.sources.SpeciationCsv.read(spark, zeros, dropZeros = true)
    assert(t.select("category").distinct().collect().map(_.getString(0)).toSeq
      == Seq("adf"))
  }

  test("speciateFromTable: year/type filter, country fold, homeless default") {
    val p = writeCsv(
      "category,country,type,year,SA,SB",
      "adf,C1,gridded,2024,0.25,0.75",
      "adf,C2,gridded,2024,0.75,0.25",
      "adf,-99,gridded,2024,0.5,0.5",
      "adf,C1,gridded,2023,1.0,0.0", // filtered by year
      "adf,C1,shapped,2024,0.0,1.0") // filtered by type
    val table = graft.sources.SpeciationCsv.read(spark, p)
    // cell 0: pure C1; cell 1: half C1 half C2; cells 2-4 homeless
    val fractions = spark.createDataFrame(Seq(
      (0L, "C1", 1.0), (1L, "C1", 0.5), (1L, "C2", 0.5)))
      .toDF("cell_id", "country", "fraction")
    val out = Speciation.speciateFromTable(spark, basicInv, fractions, table,
      substance = "CO2", year = Some(2024), typ = Some("gridded"))
    val rows = out.where(col("category") === "adf").collect()
      .map(r => (r.getLong(0), r.getString(2)) -> r.getDouble(3)).toMap
    // cell 1 value=1: SA = 0.5*0.25 + 0.5*0.75 = 0.5
    assert(rows((1L, "SA")) == 0.5)
    assert(rows((1L, "SB")) == 0.5)
    // cell 2 homeless value=2 -> default 0.5/0.5
    assert(rows((2L, "SA")) == 1.0)
    // liku/CO2 has no adf... liku rows pass through untouched (no table
    // entry for liku) -- divergence from reference's raise, documented
    val m = totalsBySub(out)
    assert(m(("liku", "CO2")) == 0 + 1 + 2 + 3 + 4)
    assert(m(("adf", "CH4")) == 3 + 4 + 5 + 6 + 7)
    assert(!m.contains(("adf", "CO2")))
    // mass conserved for speciated rows (ratios sum to 1)
    assert(math.abs(m(("adf", "SA")) + m(("adf", "SB")) - (0 + 1 + 2 + 3 + 4)) < 1e-9)
  }
}
