package graft

import org.apache.spark.sql.functions._
import graft.sources.{DuckInventory, Wkb}

/** WKB codec + DuckDB-export inventory loader
  * (emiproc/inventories/zurich/duck.py:23-155 semantics). */
class DuckInventorySpec extends SparkSpec {

  test("WKB round-trip: point, polygon with hole, multipolygon, both endians") {
    val p = Wkb.decode(Wkb.encodePoint(8.5, 47.4))
    assert(p.kind == "point" && p.parts.head.xs.toSeq == Seq(8.5))
    val shell = (Array(0.0, 4.0, 4.0, 0.0, 0.0), Array(0.0, 0.0, 4.0, 4.0, 0.0))
    val hole = (Array(1.0, 2.0, 2.0, 1.0, 1.0), Array(1.0, 1.0, 2.0, 2.0, 1.0))
    val poly = Wkb.decode(Wkb.encodePolygon(Seq(shell, hole)))
    assert(poly.kind == "polygon" && poly.parts.length == 2)
    assert(poly.parts(0).ring == 0 && poly.parts(1).ring == 1)
    assert(poly.parts(1).xs.toSeq == hole._1.toSeq)
    val mp = Wkb.decode(Wkb.encodeMultiPolygon(Seq(Seq(shell), Seq(hole))))
    assert(mp.kind == "multipolygon" && mp.parts.map(_.part).toSeq == Seq(0, 1))
    // big-endian variant of the point parses identically
    val be = java.nio.ByteBuffer.allocate(21)
    be.put(0.toByte).putInt(1).putDouble(8.5).putDouble(47.4)
    val pBe = Wkb.decode(be.array())
    assert(pBe.parts.head.xs.toSeq == Seq(8.5) && pBe.parts.head.ys.toSeq == Seq(47.4))
  }

  private def writeFixture(dir: String): Unit = {
    val traffic = spark.createDataFrame(Seq(
      (2023, Wkb.encodePolygon(Seq((Array(0.0, 2.0, 2.0, 0.0, 0.0),
        Array(0.0, 0.0, 1.0, 1.0, 0.0)))), 10.0, Double.box(1.5)),
      (2023, Wkb.encodePoint(5.0, 5.0), 20.0, null.asInstanceOf[java.lang.Double]),
      (2022, Wkb.encodePoint(9.0, 9.0), 99.0, Double.box(99.0))))
      .toDF("jahr", "geom", "emission_co2", "emission_nox")
    traffic.repartition(1).write.mode("overwrite").parquet(s"$dir/traffic.parquet")
    val heating = spark.createDataFrame(Seq(
      (2023, Wkb.encodePoint(1.0, 1.0), 7.0)))
      .toDF("jahr", "geom", "emission_ch4")
    heating.repartition(1).write.mode("overwrite").parquet(s"$dir/heating.parquet")
    // side tables that must be skipped
    heating.write.mode("overwrite").parquet(s"$dir/heating_ef.parquet")
    heating.write.mode("overwrite").parquet(s"$dir/heating_p.parquet")
  }

  test("readInventoryDir: suffix skip, year filter, prefix strip, null fill") {
    val dir = java.nio.file.Files.createTempDirectory("duckinv").toString
    writeFixture(dir)
    val inv = DuckInventory.read(spark, dir, year = 2023)
    val emi = inv.emissions.collect()
      .map(r => (r.getString(0), r.getString(2)) -> r.getDouble(3))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // 2022 row filtered; nulls fill 0; _ef/_p tables skipped
    assert(emi(("traffic", "co2")) == 30.0)
    assert(emi(("traffic", "nox")) == 1.5)
    assert(emi(("heating", "ch4")) == 7.0)
    assert(inv.emissions.select("category").distinct().count() == 2)
    val geoms = inv.geoms.collect()
    assert(geoms.length == 3) // polygon ring + 2 points (2023 only)
    val kinds = inv.geoms.groupBy("category", "kind").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(kinds(("traffic", "polygon")) == 1 && kinds(("traffic", "point")) == 1)
    // emissions join geoms on (category, source_id) — ids consistent
    val joined = inv.emissions.join(inv.geoms, Seq("category", "source_id"))
    assert(joined.count() == 5) // traffic poly 2 subs + traffic pt 2 + heating 1
  }

  test("byte-identical duplicate rows keep distinct ids and exact totals") {
    // two equal road segments are plausible inventory data; a pure
    // content-hash id would collapse them and the emissions↔geoms join
    // would then square the duplicates (k rows → k² joined), inflating
    // totals — the reference's pandas row index keys each row uniquely
    val dir = java.nio.file.Files.createTempDirectory("duckdup").toString
    val seg = Wkb.encodePolygon(Seq((Array(0.0, 2.0, 2.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 1.0, 0.0))))
    spark.createDataFrame(Seq.fill(3)((2023, seg, 10.0)))
      .toDF("jahr", "geom", "emission_co2")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/roads.parquet")
    val inv = DuckInventory.read(spark, dir, year = 2023)
    assert(inv.emissions.select("source_id").distinct().count() == 3)
    assert(inv.emissions.agg(sum("value")).head.getDouble(0) == 30.0)
    val joined = inv.emissions.join(inv.geoms, Seq("category", "source_id"))
    assert(joined.count() == 3) // k rows, not k²
    assert(joined.agg(sum("value")).head.getDouble(0) == 30.0)
  }

  test("missing geometry column errors like the reference") {
    val dir = java.nio.file.Files.createTempDirectory("duckbad").toString
    spark.createDataFrame(Seq((2023, 1.0)))
      .toDF("jahr", "emission_co2")
      .write.mode("overwrite").parquet(s"$dir/broken.parquet")
    val e = intercept[IllegalArgumentException] {
      DuckInventory.read(spark, dir, year = 2023)
    }
    assert(e.getMessage.contains("Geometry column"))
  }
}
