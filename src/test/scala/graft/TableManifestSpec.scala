package graft

import graft.ops.TableManifest
import org.apache.hadoop.fs.Path

/** The manifest file format itself — round-trip, version selection,
  * old-manifest pruning, and crash-artifact invisibility. The lifecycle
  * semantics built on top are pinned in LayoutSpec/Bm25Spec/PqSpec. */
class TableManifestSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def fsAndDir() = {
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    val p = new Path(dir)
    (p.getFileSystem(new org.apache.hadoop.conf.Configuration()), p)
  }

  test("commit/parse round-trip preserves every entry class") {
    val (fs, dir) = fsAndDir()
    val snap = TableManifest.Snapshot(
      0, Some(Seq("gen-0", "gen-3")),
      Set("del-a.parquet"), Set("tail-b.parquet"),
      Seq("staged-1/part-x.parquet"),
      Set("old-stat.parquet", "staged-0/part-y.parquet"))
    TableManifest.commit(fs, dir, snap)
    val got = TableManifest.latest(fs, dir).get
    assert(got.seq == 0)
    assert(got.gens == snap.gens && got.xdel == snap.xdel &&
      got.xtail == snap.xtail && got.stat == snap.stat &&
      got.xstat == snap.xstat)
  }

  test("gens:none (a stats-only manifest) parses as None, distinct from " +
    "an empty gen set") {
    val (fs, dir) = fsAndDir()
    TableManifest.commit(fs, dir, TableManifest.Snapshot(
      0, None, Set.empty, Set.empty, Seq("staged-0/p.parquet"), Set.empty))
    assert(TableManifest.latest(fs, dir).get.gens.isEmpty) // None
    val (fs2, dir2) = fsAndDir()
    TableManifest.commit(fs2, dir2, TableManifest.Snapshot(
      0, Some(Seq.empty), Set.empty, Set.empty, Seq.empty, Set.empty))
    assert(TableManifest.latest(fs2, dir2).get.gens == Some(Seq.empty))
  }

  test("the HIGHEST sequence wins; commits prune manifests older than " +
    "the previous one (reader grace)") {
    val (fs, dir) = fsAndDir()
    def commitGens(gs: String*): Unit = TableManifest.commit(fs, dir,
      TableManifest.Snapshot(0, Some(gs), Set.empty, Set.empty,
        Seq.empty, Set.empty))
    commitGens("gen-0")
    commitGens("gen-0", "gen-1")
    commitGens("gen-2")
    val got = TableManifest.latest(fs, dir).get
    assert(got.seq == 2 && got.gens == Some(Seq("gen-2")))
    val onDisk = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("_manifest")).sorted.toSeq
    assert(onDisk == Seq("_manifest-1", "_manifest-2"),
      s"want latest + previous only, got $onDisk")
  }

  test("a crashed commit (.tmp never renamed) is invisible to latest()") {
    val (fs, dir) = fsAndDir()
    TableManifest.commit(fs, dir, TableManifest.Snapshot(
      0, Some(Seq("gen-0")), Set.empty, Set.empty, Seq.empty, Set.empty))
    val out = fs.create(new Path(dir, "_manifest-7.tmp"), true)
    try out.write("gen:gen-99\n".getBytes("UTF-8")) finally out.close()
    val got = TableManifest.latest(fs, dir).get
    assert(got.seq == 0 && got.gens == Some(Seq("gen-0")),
      "an unrenamed .tmp must never be selected")
  }
}
