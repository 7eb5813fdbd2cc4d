package graft

import org.apache.spark.sql.functions._
import graft.sinks.TarShards
import graft.sinks.TarShards.TarEntry

class TarShardsSpec extends SparkSpec {

  private def entries = Seq(
    TarEntry("00000001.txt", "hello world".getBytes("UTF-8")),
    TarEntry("00000001.json", """{"doc_id":1}""".getBytes("UTF-8")),
    TarEntry("00000002.txt", Array.tabulate[Byte](513)(i => (i % 251).toByte)))

  test("tar roundtrip preserves names, order, and exact payload bytes") {
    val back = TarShards.parseTar(TarShards.tarBytes(entries.iterator))
    assert(back.map(_.name) == entries.map(_.name))
    entries.zip(back).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a.bytes, b.bytes), a.name)
    }
  }

  test("tar bytes are deterministic and block-aligned with a 2-block trailer") {
    val a = TarShards.tarBytes(entries.iterator)
    val b = TarShards.tarBytes(entries.iterator)
    assert(java.util.Arrays.equals(a, b))
    assert(a.length % 512 == 0)
    // payload 513 spans 2 blocks: 3 headers + 1 + 1 + 2 data + 2 trailer
    assert(a.length == 512 * 9)
    assert(a.takeRight(1024).forall(_ == 0))
  }

  test("system tar can list our archive (header spec conformance)") {
    val f = java.nio.file.Files.createTempFile("graft", ".tar")
    java.nio.file.Files.write(f, TarShards.tarBytes(entries.iterator))
    val p = new ProcessBuilder("tar", "-tf", f.toString).start()
    val names = scala.io.Source.fromInputStream(p.getInputStream)
      .getLines().toList
    assert(p.waitFor() == 0)
    assert(names == entries.map(_.name).toList)
  }

  test("corrupted header checksum fails loudly") {
    val bytes = TarShards.tarBytes(entries.iterator)
    bytes(0) = 'X' // flip first name byte without fixing the checksum
    val e = intercept[IllegalArgumentException](TarShards.parseTar(bytes))
    assert(e.getMessage.contains("checksum"))
  }

  test("truncated archive fails loudly instead of yielding partial samples") {
    val bytes = TarShards.tarBytes(entries.iterator)
    intercept[IllegalArgumentException](
      TarShards.parseTar(bytes.take(512 + 5))) // header + torn payload
  }

  test("entry names over 100 chars are rejected (ustar limit)") {
    intercept[IllegalArgumentException](
      TarShards.tarBytes(Iterator(TarEntry("x" * 101, Array[Byte](1)))))
  }

  test("writeShards/readShards roundtrip: sorted samples, stable shard files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wds").toString
    val staged = (0 until 40).map { i =>
      (i % 4, f"$i%08d", Map(
        "txt" -> s"doc $i".getBytes("UTF-8"),
        "json" -> s"""{"id":$i}""".getBytes("UTF-8")))
    }.toDF("shard", "key", "files")
    val manifest = TarShards.writeShards(spark, staged, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(manifest == Map(0 -> 10L, 1 -> 10L, 2 -> 10L, 3 -> 10L))
    val back = TarShards.readShards(spark, dir)
    assert(back.count() == 80)
    // within each shard the entries come back in sorted key order
    val keys0 = TarShards.parseTar(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/shard-00000.tar"))).map(_.name)
    assert(keys0 == keys0.sorted)
    // payloads survive byte-for-byte
    val d7 = back.where(col("key") === "00000007" && col("ext") === "txt")
      .select("content").as[Array[Byte]].head()
    assert(new String(d7, "UTF-8") == "doc 7")
  }

  test("readSamples groups adjacent entries into one row per sample") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wds2").toString
    val staged = (0 until 6).map { i =>
      (i % 2, f"$i%04d", Map(
        "txt" -> s"t$i".getBytes("UTF-8"),
        "json" -> s"j$i".getBytes("UTF-8")))
    }.toDF("shard", "key", "files")
    TarShards.writeShards(spark, staged, dir)
    val samples = TarShards.readSamples(spark, dir)
    assert(samples.count() == 6)
    val r = samples.where(col("key") === "0003")
      .select("files").as[Map[String, Array[Byte]]].head()
    assert(r.keySet == Set("txt", "json"))
    assert(new String(r("txt"), "UTF-8") == "t3")
  }

  test("streamSamples delivers the same samples through the file source") {
    val dir = java.nio.file.Files.createTempDirectory("wds3").toString
    import spark.implicits._
    val staged = (0 until 6).map { i =>
      (i % 2, f"$i%04d", Map("txt" -> s"t$i".getBytes("UTF-8")))
    }.toDF("shard", "key", "files")
    TarShards.writeShards(spark, staged, dir)
    val mem = "tss_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = TarShards.streamSamples(spark, dir)
      .select("shard", "key")
      .writeStream.outputMode("append").format("memory").queryName(mem).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(mem).collect().map(r => r.getString(1)).sorted
    assert(got.toSeq == (0 until 6).map(i => f"$i%04d"))
  }
}
