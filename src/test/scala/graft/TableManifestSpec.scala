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

  private def snapOf(gs: String*) = TableManifest.Snapshot(
    0, Some(gs), Set.empty, Set.empty, Seq.empty, Set.empty)

  test("single-writer ENFORCED: a racer that committed the same seq " +
    "between this writer's seq read and its rename fails loudly, " +
    "racer's manifest intact") {
    val (fs, dir) = fsAndDir()
    // the racer commits seq 0 first
    TableManifest.commit(fs, dir, snapOf("gen-racer"))
    // this writer's view of the sequence is STALE: its fs hides
    // _manifest-0 from listings (as if latest() ran before the racer's
    // rename) while exists() sees the committed file — the exact TOCTOU
    // the existence probe converts from silent overwrite to loud
    val stale = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
        super.listStatus(f).filterNot(_.getPath.getName == "_manifest-0")
    }
    intercept[java.util.ConcurrentModificationException] {
      TableManifest.commit(stale, dir, snapOf("gen-loser"))
    }
    assert(TableManifest.latest(fs, dir).get.gens == Some(Seq("gen-racer")),
      "the winning commit must survive the loser's failure")
    // the loser's staging tmp was cleaned up
    assert(!fs.listStatus(dir).exists(_.getPath.getName.endsWith(".tmp")))
  }

  test("single-writer ENFORCED on overwriting-rename filesystems: a " +
    "racer renaming onto this writer's committed manifest is detected " +
    "by the read-back verify — one winner, one loud failure") {
    val (fs, dir) = fsAndDir()
    // simulate local/object-store rename semantics where the racer's
    // rename lands right after this writer's: clobber dst post-rename
    val clobbered = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def rename(src: Path, dst: Path): Boolean = {
        val r = super.rename(src, dst)
        val out = super.create(dst, true)
        try out.write("gen:gen-racer\n".getBytes("UTF-8"))
        finally out.close()
        r
      }
    }
    intercept[java.util.ConcurrentModificationException] {
      TableManifest.commit(clobbered, dir, snapOf("gen-loser"))
    }
    assert(TableManifest.latest(fs, dir).get.gens == Some(Seq("gen-racer")),
      "exactly one commit may win")
  }

  test("latest(): an unreadable newest manifest falls back to the " +
    "surviving previous one (the pruning race); all-unreadable throws") {
    val (fs, dir) = fsAndDir()
    TableManifest.commit(fs, dir, snapOf("gen-0"))
    TableManifest.commit(fs, dir, snapOf("gen-1"))
    // a reader that listed both, racing a commit whose pruning deleted
    // _manifest-1 before the open
    val flaky = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream =
        if (f.getName == "_manifest-1")
          throw new java.io.FileNotFoundException(f.toString)
        else super.open(f, bufferSize)
    }
    assert(TableManifest.latest(flaky, dir).get.gens == Some(Seq("gen-0")),
      "must fall back to the surviving lower-sequence manifest")
    // but a table whose ENTIRE manifest set is unreadable fails loudly
    // instead of degrading to the listing fallback
    val dead = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream =
        if (f.getName.startsWith("_manifest"))
          throw new java.io.FileNotFoundException(f.toString)
        else super.open(f, bufferSize)
    }
    intercept[java.io.FileNotFoundException] {
      TableManifest.latest(dead, dir)
    }
  }

  test("ageMs: None without a manifest, ~0 right after a commit") {
    val (fs, dir) = fsAndDir()
    assert(TableManifest.ageMs(fs, dir).isEmpty)
    TableManifest.commit(fs, dir, snapOf("gen-0"))
    val age = TableManifest.ageMs(fs, dir).get
    assert(age >= 0L && age < 60000L, s"fresh manifest aged $age ms")
  }
}
