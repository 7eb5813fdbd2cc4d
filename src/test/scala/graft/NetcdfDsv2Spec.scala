package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

import graft.sources.v2.{IdxBbox, NetcdfScan, NetcdfSource}
import graft.sources.{GlobalRasters, NetcdfClassic}

/** `spark.read.format("netcdf")` (DataSource V2) — scan-level pushdown
  * pins: variable predicates must keep unselected variables UNDECODED,
  * file predicates must prune partitions at planning, bbox predicates
  * are fully handled in the reader, and the read path must reproduce
  * the binaryFile ingestion rows bit-exactly. */
class NetcdfDsv2Spec extends SparkSpec {

  import NetcdfClassic._
  import NcFixtures._

  /** 2×3 grid with TWO raster variables. */
  private def twoVarFile(flux: Seq[Float], aux: Seq[Float]): Array[Byte] =
    build(
      Seq(("latitude", 2), ("longitude", 3)),
      Seq(
        V("latitude", Seq(0), NcDouble, Seq("units" -> "degrees_north"),
          doubles(10.0, 12.0), 16),
        V("longitude", Seq(1), NcDouble, Seq("units" -> "degrees_east"),
          doubles(100.0, 102.0, 104.0), 24),
        V("flux", Seq(0, 1), NcFloat, Nil,
          b => flux.foreach(b.putFloat), 4 * flux.length),
        V("aux", Seq(0, 1), NcFloat, Nil,
          b => aux.foreach(b.putFloat), 4 * aux.length)))

  private def writeDir(): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("dsv2nc")
    java.nio.file.Files.write(dir.resolve("CO2_ENE.nc"),
      twoVarFile(Seq(1f, 2f, 3f, 4f, 5f, 6f), Seq(9f, 9f, 9f, 9f, 9f, 9f)))
    java.nio.file.Files.write(dir.resolve("CH4_TRO.nc"),
      twoVarFile(Seq(7f, 8f, 9f, 10f, 11f, 12f), Seq(5f, 5f, 5f, 5f, 5f, 5f)))
    dir
  }

  private def scanOf(df: DataFrame): NetcdfScan =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation if r.scan.isInstanceOf[NetcdfScan] =>
        r.scan.asInstanceOf[NetcdfScan]
    }.getOrElse(fail("no NetcdfScan in the optimized plan"))

  test("netcdf DSv2: long rows match the pure parser, one task per file") {
    val dir = writeDir()
    val df = spark.read.format("netcdf").load(dir.toString)
    val got = df.select("file", "variable", "lon_idx", "lat_idx", "flux")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)) ->
        r.getDouble(4)).toMap
    assert(got.size == 24) // 2 files x 2 vars x 6 cells
    assert(got(("CO2_ENE.nc", "flux", 0, 0)) == 1.0)
    assert(got(("CO2_ENE.nc", "flux", 2, 1)) == 6.0)
    assert(got(("CH4_TRO.nc", "aux", 1, 0)) == 5.0)
    // grid metadata columns carry the parsed regular grid
    val g = df.select("nx", "ny", "xmin", "ymin", "dx", "dy").distinct().collect()
    assert(g.length == 1 &&
      g(0).getInt(0) == 3 && g(0).getInt(1) == 2 &&
      g(0).getDouble(2) == 99.0 && g(0).getDouble(3) == 9.0 &&
      g(0).getDouble(4) == 2.0 && g(0).getDouble(5) == 2.0)
    assert(df.rdd.getNumPartitions == 2) // one InputPartition per file
  }

  test("variable pushdown: unselected variables are never decoded") {
    val dir = writeDir()
    val df = spark.read.format("netcdf").load(dir.toString)
      .where(col("variable") === "flux")
    assert(scanOf(df).variables.contains(Set("flux")))
    NetcdfSource.decodedVariables.set(0L)
    assert(df.count() == 12) // 2 files x 1 var x 6 cells
    assert(NetcdfSource.decodedVariables.get() == 2L,
      "expected exactly one decoded variable per file under the pushed predicate")
    // a predicate naming NO present variable decodes NOTHING
    val none = spark.read.format("netcdf").load(dir.toString)
      .where(col("variable") === "absent")
    NetcdfSource.decodedVariables.set(0L)
    assert(none.count() == 0)
    assert(NetcdfSource.decodedVariables.get() == 0L)
    // the unfiltered scan decodes both variables per file
    NetcdfSource.decodedVariables.set(0L)
    assert(spark.read.format("netcdf").load(dir.toString).count() == 24)
    assert(NetcdfSource.decodedVariables.get() == 4L)
  }

  test("file pushdown prunes partitions at planning") {
    val dir = writeDir()
    val df = spark.read.format("netcdf").load(dir.toString)
      .where(col("file") === "CO2_ENE.nc")
    val scan = scanOf(df)
    assert(scan.files.contains(Set("CO2_ENE.nc")))
    assert(scan.planInputPartitions().length == 1)
    assert(df.select("variable").distinct().count() == 2)
  }

  test("bbox pushdown is fully handled, no residual Filter on the indices") {
    val dir = writeDir()
    val df = spark.read.format("netcdf").load(dir.toString)
      .where(col("variable") === "flux" &&
        col("lon_idx") >= 1 && col("lat_idx") < 1)
    assert(scanOf(df).bbox == IdxBbox(lonGe = Some(1), latLe = Some(0)))
    val rows = df.select("file", "lon_idx", "lat_idx", "flux").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
      .toMap
    assert(rows == Map(
      ("CO2_ENE.nc", 1, 0) -> 2.0, ("CO2_ENE.nc", 2, 0) -> 3.0,
      ("CH4_TRO.nc", 1, 0) -> 8.0, ("CH4_TRO.nc", 2, 0) -> 9.0))
    // variable + index predicates are all fully pushed: the physical
    // plan needs no Filter node at all
    val filters = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(filters.isEmpty, s"residual filters: $filters")
  }

  test("3-D variables fail loudly via DSv2 (no silent drop vs binaryFile path)") {
    val dir = java.nio.file.Files.createTempDirectory("dsv2nc3d")
    val bad3d = build(
      Seq(("latitude", 2), ("longitude", 3), ("time", 2)),
      Seq(
        V("latitude", Seq(0), NcDouble, Seq("units" -> "degrees_north"),
          doubles(10.0, 12.0), 16),
        V("longitude", Seq(1), NcDouble, Seq("units" -> "degrees_east"),
          doubles(100.0, 102.0, 104.0), 24),
        V("flux", Seq(0, 1), NcFloat, Nil,
          b => (1 to 6).foreach(v => b.putFloat(v.toFloat)), 24),
        V("bad", Seq(2, 0, 1), NcFloat, Nil,
          b => (1 to 12).foreach(v => b.putFloat(v.toFloat)), 48)))
    java.nio.file.Files.write(dir.resolve("X_Y.nc"), bad3d)
    // unfiltered read must THROW on the 3-D variable, exactly like the
    // binaryFile path's parseRaster default — not skip it silently
    intercept[Exception] {
      spark.read.format("netcdf").load(dir.toString).count()
    }
    // naming the 2-D variable prunes the poison var's decode entirely
    val n = spark.read.format("netcdf").load(dir.toString)
      .where(col("variable") === "flux").count()
    assert(n == 6)
  }

  test("bbox predicates at the Int extremes stay correct (no overflow)") {
    val dir = writeDir()
    val base = spark.read.format("netcdf").load(dir.toString)
    assert(base.where(col("lon_idx") > Int.MaxValue).count() == 0)
    assert(base.where(col("lat_idx") < Int.MinValue).count() == 0)
    assert(base.where(col("lon_idx") > (Int.MaxValue - 1)).count() == 0)
  }

  test("unsupported globs are rejected with a clear planning error") {
    val dir = writeDir()
    val e = intercept[Throwable] {
      spark.read.format("netcdf").load(s"$dir/CO2_*.nc").count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("unsupported glob")))
    // the supported dir/*.nc form still loads
    assert(spark.read.format("netcdf").load(s"$dir/*.nc").count() == 24)
  }

  test("runtime V2 filtering: filter() prunes partitions before planning") {
    val dir = writeDir()
    val df = spark.read.format("netcdf").load(dir.toString)
    val scan = scanOf(df)
    assert(scan.planInputPartitions().length == 2)
    // the shape DPP hands over: IN(file, 'CO2_ENE.nc')
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    scan.filter(Array(new Predicate("IN", Array(
      Expressions.column("file"),
      Expressions.literal("CO2_ENE.nc")))))
    assert(scan.runtimeFiles.contains(Set("CO2_ENE.nc")))
    assert(scan.planInputPartitions().length == 1)
    // an unrecognized predicate must be IGNORED (no pruning), never drop data
    scan.filter(Array(new Predicate("ALWAYS_TRUE", Array.empty)))
    assert(scan.planInputPartitions().length == 1)
  }

  test("runtime V2 filtering: a selective manifest join decodes only its files") {
    val dir = writeDir()
    import spark.implicits._
    val raster = spark.read.format("netcdf").load(dir.toString)
    // the manifest must be a REAL relation with a "likely selective"
    // filter on top: a LocalRelation folds the filter away before the
    // PartitionPruning rule looks for one, and without that filter the
    // rule never injects the pruning subquery
    val manifestPath = java.nio.file.Files
      .createTempDirectory("dsv2manifest").resolve("m.parquet").toString
    Seq("CO2_ENE.nc", "CH4_TRO.nc").toDF("file")
      .write.mode("overwrite").parquet(manifestPath)
    val manifest = spark.read.parquet(manifestPath)
      .where(col("file") === "CO2_ENE.nc")
    NetcdfSource.decodedVariables.set(0L)
    val out = raster.join(manifest, "file")
    assert(out.count() == 12) // 1 file x 2 vars x 6 cells
    // the pruning subquery ran the manifest first and handed IN(file,
    // 'CO2_ENE.nc') to scan.filter — CH4_TRO.nc never got a partition,
    // so only CO2_ENE.nc's two variables were decoded
    assert(NetcdfSource.decodedVariables.get() == 2L,
      "expected dynamic partition pruning to keep CH4_TRO.nc undecoded")
  }

  test("estimateStatistics reports pruned file bytes, not Long.MaxValue") {
    val dir = writeDir()
    val df = spark.read.format("netcdf").load(dir.toString)
    val full = scanOf(df).estimateStatistics().sizeInBytes().getAsLong
    val oneFile = scanOf(df.where(col("file") === "CO2_ENE.nc"))
      .estimateStatistics().sizeInBytes().getAsLong
    assert(full > 0 && full < Long.MaxValue / 4)
    assert(oneFile * 2 == full) // equal-size fixture files: half the bytes
  }

  test("readEdgarDirV2 == readEdgarDirDistributed on the committed fixture") {
    val dir = "/root/repo/fixtures/edgar"
    val (grid, _) = GlobalRasters.readEdgarDir(spark, dir)
    val v2 = GlobalRasters.readEdgarDirV2(spark, dir, grid).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3))
      .toMap
    val bin = GlobalRasters.readEdgarDirDistributed(spark, dir, grid).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3))
      .toMap
    assert(v2 == bin) // bit-exact doubles: same formula, same FP order
  }

  test("readEdgarDirV2 fails loudly on a grid mismatch") {
    val dir = "/root/repo/fixtures/edgar"
    val (grid, _) = GlobalRasters.readEdgarDir(spark, dir)
    val wrong = grid.copy(xmin = grid.xmin + 1.0)
    val e = intercept[Exception] {
      GlobalRasters.readEdgarDirV2(spark, dir, wrong).count()
    }
    assert(e.getMessage != null)
  }
}
