package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{AsciiRaster, ProfilesCsv}
import graft.sinks.Exports
import graft.model.RegularGrid
import graft.multimodal.Multimodal

class IoSpec extends SparkSpec {

  private def tmpFile(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-io")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("temporal profile CSV reads in all three dialects, normalized") {
    val variants = Seq(
      ("comma.csv", "name,h0,h1,h2\np1,1,2,5\np2,4,4,2\n"),
      ("semi.csv", "# comment line\nname;h0;h1;h2\np1;1;2;5\np2;4;4;2\n"),
      ("tab.csv", "name\th0\th1\th2\np1\t1\t2\t5\np2\t4\t4\t2\n"))
    variants.foreach { case (name, content) =>
      val out = ProfilesCsv.readTemporalProfiles(spark, tmpFile(name, content))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
      assert(out(("p1", 0)) == 0.125, name)
      assert(out(("p1", 2)) == 0.625, name)
      assert(out(("p2", 1)) == 0.4, name)
    }
  }

  test("vertical profile CSV parses height headers and intervals") {
    val path = tmpFile("vert.csv",
      "Category,Substance,20m,92m,100-184\nPP,CO2,0.2,0.5,0.3\n")
    val out = ProfilesCsv.readVerticalProfiles(spark, path)
      .collect().map(r => r.getInt(2) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(out(0) == ((20.0, 0.2)))
    assert(out(1) == ((92.0, 0.5)))
    assert(out(2) == ((184.0, 0.3)))
  }

  test("ascii raster reads header, flips rows, drops nodata") {
    val asc =
      """ncols 3
        |nrows 2
        |xllcorner 10.0
        |yllcorner 20.0
        |cellsize 0.5
        |NODATA_value -9999
        |1 2 3
        |4 -9999 6
        |""".stripMargin
    val (g, df) = AsciiRaster.read(spark, tmpFile("r.asc", asc))
    assert(g == RegularGrid(3, 2, 10.0, 20.0, 0.5, 0.5))
    val vals = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // top row (1 2 3) is iy=1: cells ix*2+1 ; bottom row iy=0
    assert(vals == Map(1L -> 1.0, 3L -> 2.0, 5L -> 3.0, 0L -> 4.0, 4L -> 6.0))
  }

  test("raster export pivots substances wide with cell centers; totals roll up") {
    val grid = RegularGrid(2, 1, 0.0, 0.0, 1.0, 1.0)
    val emi = spark.createDataFrame(Seq(
      (0L, "a", "CO2", 2.0), (0L, "b", "CO2", 3.0), (1L, "a", "CH4", 4.0)))
      .toDF("cell_id", "category", "substance", "value")
    val wide = Exports.rasterExport(emi, grid)
    val r0 = wide.where(col("cell_id") === 0).collect()(0)
    assert(r0.getAs[Double]("CO2") == 5.0)
    assert(r0.getAs[Double]("CH4") == 0.0)
    assert(r0.getAs[Double]("x") == 0.5)
    val dir = Files.createTempDirectory("graft-sink").resolve("raster").toString
    Exports.rasterExport(emi, grid, Some(dir))
    assert(spark.read.parquet(dir).count() == 2)
    // K9: CF attribute sidecar rides along, parses as JSON, lists vars
    val attrs = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_cf_attrs.json")), "UTF-8")
    assert(attrs.contains("\"Conventions\": \"CF-1.8\""))
    assert(attrs.contains("\"CO2\"") && attrs.contains("\"CH4\""))
    assert(attrs.contains("\"units\": \"kg year-1 cell-1\""))
  }

  test("hourly export writes one partition per hour") {
    val emi = spark.createDataFrame(Seq((0L, "A", "F", 10.0)))
      .toDF("cell_id", "category", "substance", "value")
    val sf = spark.createDataFrame(Seq(("A", "F", 0, 2.0)))
      .toDF("category", "substance", "hour_of_day", "sf")
    val dir = Files.createTempDirectory("graft-sink").resolve("hourly").toString
    Exports.hourlyExport(emi, sf, "2024-01-01 00:00:00", 3, dir)
    val back = spark.read.parquet(dir)
    assert(back.select("ts_str").distinct().count() == 3)
    val v = back.where(col("ts_str") === "2024-01-01 00:00:00")
      .collect()(0).getAs[Double]("value")
    assert(v == 20.0)
  }

  test("monthly flux export pivots months with per-area conversion") {
    val grid = RegularGrid(2, 1, 0.0, 0.0, 1.0, 1.0)
    val emi = spark.createDataFrame(Seq(
      (0L, "CO2", 1, Exports.SecPerYear), (0L, "CO2", 2, 2 * Exports.SecPerYear)))
      .toDF("cell_id", "substance", "month", "value")
    val wide = Exports.monthlyFluxExport(emi, grid).collect()(0)
    assert(math.abs(wide.getAs[Double]("1") - 1.0) < 1e-12)
    assert(math.abs(wide.getAs[Double]("2") - 2.0) < 1e-12)
    assert(wide.getAs[Double]("3") == 0.0)
  }

  test("geoparquet export carries WKT polygons and envelopes") {
    val grid = RegularGrid(1, 1, 0.0, 0.0, 2.0, 2.0)
    val emi = spark.createDataFrame(Seq((0L, "a", "CO2", 1.0)))
      .toDF("cell_id", "category", "substance", "value")
    val out = Exports.geoParquetExport(spark, emi, grid).collect()(0)
    assert(out.getAs[String]("geometry_wkt") ==
      "POLYGON((0.0 0.0, 2.0 0.0, 2.0 2.0, 0.0 2.0, 0.0 0.0))")
    assert(out.getAs[Double]("xmax") == 2.0)
    // the WKB column decodes back to the same box (GeoParquet encoding)
    val g = graft.sources.Wkb.decode(out.getAs[Array[Byte]]("geometry"))
    assert(g.kind == "polygon")
    assert(g.parts.head.xs.toSeq == Seq(0.0, 2.0, 2.0, 0.0, 0.0))
    assert(g.parts.head.ys.toSeq == Seq(0.0, 0.0, 2.0, 2.0, 0.0))
  }

  test("multimodal decode stub: typed mapPartitions batch shape + features") {
    val docs = spark.createDataFrame(Seq((1L, "abcd"), (2L, "")))
      .toDF("doc_id", "text")
    val decoded = Multimodal.decodeFeatures(spark, Multimodal.attachBinary(docs))
      .collect().map(d => d.doc_id -> d).toMap
    assert(decoded(1L).byte_len == 4)
    assert(decoded(1L).width == 16 + 4 % 64)
    assert(decoded(1L).features.sum == 1.0) // normalized histogram
    assert(decoded(2L).features.sum == 0.0)
    val frames = Multimodal.sampleFrames(
      Multimodal.decodeFeatures(spark, Multimodal.attachBinary(
        spark.createDataFrame(Seq((1L, "x" * 250))).toDF("doc_id", "text"))), 2)
      .collect().map(_.getInt(1)).sorted
    assert(frames.toSeq == Seq(0, 2)) // n_frames = 3 -> samples 0,2
  }

  test("swiss totals scaling: normalize x total, point deduction, overdraw raises") {
    import org.apache.spark.sql.functions._
    import graft.sources.SwissRasters
    val raster = spark.createDataFrame(Seq(
      (0L, "a", "CO2", 1.0), (1L, "a", "CO2", 3.0), (0L, "b", "CO2", 5.0)))
      .toDF("cell_id", "category", "substance", "value")
    val totals = spark.createDataFrame(Seq(("a", "CO2", 100.0), ("b", "CO2", 40.0)))
      .toDF("category", "substance", "total")
    val out = SwissRasters.scaleToTotals(raster, totals)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out((0L, "a")) == 25.0 && out((1L, "a")) == 75.0)
    assert(out((0L, "b")) == 40.0)
    val points = spark.createDataFrame(Seq(("a", "CO2", 60.0)))
      .toDF("category", "substance", "total")
    val ded = SwissRasters.deductPointSources(totals, points)
      .collect().map(r => (r.getString(0)) -> r.getDouble(2)).toMap
    assert(ded("a") == 40.0 && ded("b") == 40.0)
    intercept[IllegalArgumentException] {
      SwissRasters.deductPointSources(totals,
        spark.createDataFrame(Seq(("b", "CO2", 41.0)))
          .toDF("category", "substance", "total"))
    }
  }

  test("profile YAML: aliases, flow + block lists, specific days, validation") {
    import graft.sources.ProfilesYaml
    val text =
      """# heating profiles
        |daily: [0.5, 0.5]
        |week:
        |  - 0.25
        |  - 0.75
        |diurn_monday: [0.125, 0.875]  # overrides daily on mondays
        |season: [1.0]
        |unknown_key: [0.5, 0.5]
        |""".stripMargin
    val ps = ProfilesYaml.parse(text)
    assert(ps.map(p => (p.kind, p.specificDay)) == Seq(
      ("hour_of_day", None), ("day_of_week", None),
      ("hour_of_day", Some("monday")), ("month", None)))
    assert(ps.head.ratios == Seq(0.5, 0.5))
    assert(ps(1).ratios == Seq(0.25, 0.75))
    // sum != 1 raises
    intercept[IllegalArgumentException] {
      ProfilesYaml.parse("daily: [0.5, 0.4]")
    }
    // duplicate kind raises (daily + day are the same class)
    intercept[IllegalArgumentException] {
      ProfilesYaml.parse("daily: [0.5, 0.5]\nday: [0.25, 0.75]")
    }
    // DataFrame long form
    val f = java.nio.file.Files.createTempFile("prof", ".yaml")
    java.nio.file.Files.writeString(f, text)
    val df = ProfilesYaml.read(spark, f.toString)
    assert(df.count() == 2 + 2 + 2 + 1)
    assert(df.where("kind = 'hour_of_day' AND specific_day = 'monday'")
      .count() == 2)
    // write side (to_yaml) round-trips through parse
    val out = java.nio.file.Files.createTempFile("prof_out", ".yaml")
    ProfilesYaml.write(ps, out.toString)
    val back = ProfilesYaml.parse(java.nio.file.Files.readString(out))
    assert(back == ps)
  }

  test("icon assembly: tz roll matches np.roll(-shift), hourofyear leap size, " +
    "per-kind file set") {
    import org.apache.spark.sql.functions._
    val catsubs = spark.createDataFrame(Seq(("A", "F", "v1")))
      .toDF("category", "substance", "var")
    val indexes = spark.createDataFrame(Seq(("A", "F", 10, 1)))
      .toDF("category", "substance", "tpid", "profile_id")
    val regions = spark.createDataFrame(Seq((0, 10, 0), (1, 10, 2)))
      .toDF("region_id", "tpid", "tz_shift")
    val daily = spark.range(24).select(
      lit(1).as("profile_id"), lit("hour_of_day").as("kind"),
      col("id").cast("int").as("pos"), (col("id") * 1.0).as("ratio"))
    val out = graft.sinks.IconExport.assembleTimeProfiles(
      spark, catsubs, indexes, regions, daily)
      .collect().map(r => (r.getInt(2), r.getInt(3)) -> r.getDouble(4)).toMap
    // region 0 (no shift): sf[p] = p*24; region 1 (shift 2) is
    // np.roll(sf, -2): out[0] = in[2]
    assert(out((0, 0)) == 0.0)
    assert(out((0, 5)) == 5.0 * 24)
    assert(out((1, 0)) == 2.0 * 24)
    assert(out((1, 23)) == 1.0 * 24) // out[23] = in[(23+2)%24] = in[1]
    // hour_of_year leap sizing: year%4 reference rule
    val hoy = spark.range(10).select(
      lit(1).as("profile_id"), lit("hour_of_year").as("kind"),
      col("id").cast("int").as("pos"), lit(1.0).as("ratio"))
    def sfOf(year: Int): Double =
      graft.sinks.IconExport.assembleTimeProfiles(
        spark, catsubs, indexes,
        spark.createDataFrame(Seq((0, 10, 0))).toDF("region_id", "tpid", "tz_shift"),
        hoy, year = year)
        .select("sf").head().getDouble(0)
    assert(sfOf(2023) == 8760.0)
    assert(sfOf(2024) == 8784.0)
    // per-kind file set
    val dir = java.nio.file.Files.createTempDirectory("oem").toString
    val both = daily.unionByName(spark.range(7).select(
      lit(1).as("profile_id"), lit("day_of_week").as("kind"),
      col("id").cast("int").as("pos"), lit(1.0).as("ratio")))
    graft.sinks.IconExport.writeOemProfiles(
      graft.sinks.IconExport.assembleTimeProfiles(
        spark, catsubs, indexes, regions, both), dir)
    val kinds = new java.io.File(dir).list().filter(_.startsWith("kind=")).sorted
    assert(kinds.toSeq == Seq("kind=day_of_week", "kind=hour_of_day"))
    assert(spark.read.parquet(dir).count() == 2 * (24 + 7))
    // K8 standalone profile export: vertical + temporal side by side
    val k8 = java.nio.file.Files.createTempDirectory("profiles").toString
    val vertical = spark.createDataFrame(Seq((1, 0, 0.25), (1, 1, 0.75)))
      .toDF("profile_id", "level", "r")
    graft.sinks.IconExport.exportInventoryProfiles(
      vertical,
      graft.sinks.IconExport.assembleTimeProfiles(
        spark, catsubs, indexes, regions, daily),
      k8)
    assert(spark.read.parquet(s"$k8/vertical").count() == 2)
    assert(spark.read.parquet(s"$k8/temporal").count() == 2 * 24)
  }
}
