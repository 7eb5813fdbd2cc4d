package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the canonical pipeline of
    * SURVEY.md §3 entry points 1+2 — scan → group categories → fractional
    * box crop → conservative remap → NOx speciation → polygon-zone
    * extraction (the general spatial join) → rollup totals.
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val emi = Tables.emissions(spark, dir)
    val grouped = ops.Grouping.groupCategories(
      spark, emi, Map("grp_ret" -> Seq("A", "R"), "grp_cur" -> Seq("N")))
    val cropped = ops.Regrid.cropBox(grouped, Tables.srcGrid, 2.5, 2.5, 61.5, 61.5)
    val remapped = ops.Regrid.remapInventory(
      spark, cropped, Tables.srcGrid, Tables.dstGrid)
    val speciated = ops.Speciation.speciateNox(
      spark, remapped, noxSubstance = "O", no2Fraction = 0.25)
    // two polygon zones over the destination grid (a diamond and a rect)
    val zones = spark.createDataFrame(Seq(
      (0L, Seq(30.0, 56.0, 30.0, 4.0), Seq(4.0, 30.0, 56.0, 30.0)),
      (1L, Seq(40.0, 64.0, 64.0, 40.0), Seq(40.0, 40.0, 64.0, 64.0))))
      .toDF("poly_id", "xs", "ys")
      .select(col("poly_id"),
        col("xs").cast("array<double>").as("xs"),
        col("ys").cast("array<double>").as("ys"))
    val zoned = ops.SpatialJoin.remapToPolygons(
      spark, speciated, Tables.dstGrid, zones)
    ops.Grouping.totals(
      zoned.withColumnRenamed("poly_id", "cell_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * Byte-fixture loader queries whose output is scale-factor-independent
    * carry pinned-literal regression oracles ([[OraclePins]]). */
  def oracleSql: Map[String, String] = {
    val inline = Queries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
    // A pinned regression oracle is strictly weaker than an independent
    // relational one: if a query ever gains an inline oracle, the pin
    // must be deleted, not silently shadowed by the ++ merge order.
    val overlap = inline.keySet.intersect(OraclePins.pins.keySet)
    require(overlap.isEmpty,
      s"queries with BOTH an inline oracle and an OraclePins pin: $overlap")
    inline ++ OraclePins.pins
  }
}
