package graft

import graft.sources.Hdf5Classic
import Hdf5Fixtures._
import Hdf5NewFixtures.buildNew

/** Byte-level checks of the NEW-format HDF5 subset (v3 superblock, v2
  * object headers, compact links, v4 layouts with single-chunk /
  * implicit / fixed-array chunk indexes) against hand-authored files —
  * see [[Hdf5NewFixtures]]. Every new-format metadata block carries a
  * REAL Jenkins-lookup3 checksum that the reader verifies, so a framing
  * disagreement between writer and reader fails loudly.
  *
  * The central property: for any fixture tree, `buildNew` output parses
  * IDENTICALLY to `build` (classic) output — the container encoding is
  * invisible to `list`/`attributes`/`datasetDims`/`readDataset`.
  */
class Hdf5NewFormatSpec extends SparkSpec {

  /** Assert classic/new-format parity on every surface for `tree`. */
  private def parity(tree: Group, newBytes: Array[Byte]): Unit = {
    val classic = Hdf5Classic.open(build(tree))
    val nf = Hdf5Classic.open(newBytes)
    def walk(path: String): Unit = {
      val kids = classic.list(path)
      assert(nf.list(path) == kids, s"list($path)")
      assert(nf.attributes(path).map(a => (a.name, a.text, a.nums)).sortBy(_._1) ==
        classic.attributes(path).map(a => (a.name, a.text, a.nums)).sortBy(_._1),
        s"attributes($path)")
      kids.foreach { k =>
        val p = if (path == "/") s"/$k" else s"$path/$k"
        if (isGroup(tree, p)) walk(p)
        else {
          assert(nf.datasetDims(p) == classic.datasetDims(p), s"dims($p)")
          val a = classic.readDataset(p)
          val b = nf.readDataset(p)
          assert(b.dims == a.dims, s"readDataset($p).dims")
          assert(b.data.toSeq == a.data.toSeq, s"readDataset($p).data")
          assert(nf.attributes(p).map(a2 => (a2.name, a2.text, a2.nums)).sortBy(_._1) ==
            classic.attributes(p).map(a2 => (a2.name, a2.text, a2.nums)).sortBy(_._1),
            s"attributes($p)")
        }
      }
    }
    walk("/")
  }

  private def isGroup(tree: Group, path: String): Boolean = {
    val parts = path.split("/").filter(_.nonEmpty)
    var node: Node = tree
    parts.foreach { p =>
      node = node.asInstanceOf[Group].children.find(_._1 == p).get._2
    }
    node.isInstanceOf[Group]
  }

  test("lookup3 matches Bob Jenkins' published self-test vectors") {
    // from the lookup3.c driver: hashlittle("", 0) and
    // hashlittle("Four score and seven years ago", 0)
    assert(Hdf5NewFixtures.checksum(Array.empty[Byte], 0, 0) == 0xdeadbeef)
    val s = "Four score and seven years ago".getBytes("US-ASCII")
    assert(Hdf5NewFixtures.checksum(s, 0, s.length) == 0x17770551)
  }

  test("new-format contiguous + nested groups + v3 attributes ≡ classic") {
    val tree = Group(
      Seq(
        "temp" -> f64(Seq(2, 3), Seq(1.5, -2.25, 3.0, 0.0, 42.0, -0.125)).copy(
          attrs = Seq(
            "units" -> AStr("K"),
            "scale_factor" -> ANum(Seq(0.5)),
            "valid_range" -> ANum(Seq(-1.0, 1.0)))),
        "sub" -> Group(Seq(
          "inner" -> Group(Seq(
            "n" -> i32(Seq(3), Seq(7, -8, 9)))),
          "area" -> f64(Seq(2), Seq(10.0, 20.0))))),
      attrs = Seq("Conventions" -> AStr("CF-1.8")))
    parity(tree, buildNew(tree))
  }

  test("v4 single-chunk index, filtered and unfiltered") {
    val vals = (0 until 12).map(i => i * 0.5f)
    val tree = Group(Seq(
      "plain" -> f32(Seq(3, 4), vals, chunkDims = Some(Seq(3, 4))),
      "packed" -> f32(Seq(3, 4), vals, chunkDims = Some(Seq(3, 4)), filters = Seq(2, 1))))
    parity(tree, buildNew(tree))
  }

  test("v4 implicit index: contiguous unfiltered chunks with edge clipping") {
    val vals = (0 until 35).map(i => (i * 0.25f) - 2f)
    val tree = Group(Seq(
      "flux" -> f32(Seq(5, 7), vals, chunkDims = Some(Seq(2, 3)))
        .copy(v4Index = "implicit")))
    parity(tree, buildNew(tree))
  }

  test("v4 fixed-array index: multi-chunk, shuffle+deflate, edge clipping") {
    val vals = (0 until 35).map(i => (i * 0.25f) - 2f)
    val tree = Group(Seq(
      "flux" -> f32(Seq(5, 7), vals, chunkDims = Some(Seq(2, 3)), filters = Seq(2, 1)),
      "raw" -> f32(Seq(5, 7), vals, chunkDims = Some(Seq(2, 3)))))
    parity(tree, buildNew(tree))
  }

  test("v4 fixed-array PAGED data block (page bits below the chunk count)") {
    // 8x8 in 2x2 chunks = 16 chunks; page bits 2 → 4 entries/page, 4 pages
    val vals = (0 until 64).map(_.toFloat)
    val tree = Group(Seq(
      "a" -> f32(Seq(8, 8), vals, chunkDims = Some(Seq(2, 2))),
      "b" -> f32(Seq(8, 8), vals, chunkDims = Some(Seq(2, 2)), filters = Seq(1))))
    parity(tree, buildNew(tree, faPageBits = 2))
  }

  test("OHDR continuation block (OCHK) parses and checksums verify") {
    val tree = Group(Seq(
      "a" -> f64(Seq(2), Seq(1.0, 2.0)),
      "b" -> f64(Seq(2), Seq(3.0, 4.0)),
      "c" -> Group(Seq("d" -> i32(Seq(1), Seq(5))))))
    parity(tree, buildNew(tree, forceContinuation = true))
  }

  test("corrupted new-format metadata fails the checksum loudly") {
    val tree = Group(Seq("v" -> f64(Seq(2), Seq(1.0, 2.0))))
    val bytes = buildNew(tree)
    // flip one byte inside the root object header (it sits after the
    // dataset payload; the superblock checksum still passes, the root
    // OHDR checksum must not)
    val bad = bytes.clone()
    bad(bad.length - 10) = (bad(bad.length - 10) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] {
      Hdf5Classic.open(bad).list("/")
    }
    assert(e.getMessage.contains("checksum mismatch"))
  }

  test("committed gfed4_nf.hdf5 is byte-identical to the generator output") {
    val p = java.nio.file.Paths.get("fixtures/gfed4_nf.hdf5")
    assume(java.nio.file.Files.exists(p))
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(p), Hdf5NewFixtures.gfed4NfFixture()),
      "fixtures/gfed4_nf.hdf5 differs from the generator — regenerate with: " +
        "sbt \"Test/runMain graft.GenGfed4NfFixture\"")
  }

  test("the GFED4 tree re-encoded new-format reads identically") {
    // the gate fixture's exact tree through the new container — the
    // committed fixtures/gfed4_nf.hdf5 bytes are pinned in
    // LoaderFixturesSpec; here the parity property is checked live
    val classic = Hdf5Classic.open(Hdf5Fixtures.gfed4Fixture())
    val nf = Hdf5Classic.open(Hdf5NewFixtures.gfed4NfFixture())
    assert(nf.list("/emissions") == classic.list("/emissions"))
    assert(nf.readDataset("/emissions/01/DM").data.toSeq ==
      classic.readDataset("/emissions/01/DM").data.toSeq)
    assert(nf.readDataset("/ancill/grid_cell_area").data.toSeq ==
      classic.readDataset("/ancill/grid_cell_area").data.toSeq)
    assert(nf.readDataset("/emissions/02/partitioning/DM_SAVA").data.toSeq ==
      classic.readDataset("/emissions/02/partitioning/DM_SAVA").data.toSeq)
  }
}
