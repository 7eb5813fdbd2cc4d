package graft

import graft.sinks.Sqlite
import graft.sinks.Sqlite._
import org.scalatest.funsuite.AnyFunSuite

/** The minimal SQLite writer must produce files a real sqlite3 engine
  * opens and reads back identically — validated two ways: our own
  * byte-level reader (round-trip), and the container's python3 stdlib
  * `sqlite3` (a REAL independent SQLite implementation) when available. */
class SqliteSpec extends AnyFunSuite {

  private def buildTest(): (String, Array[Byte]) = {
    val t1 = TableDef("small",
      "CREATE TABLE \"small\" (fid INTEGER PRIMARY KEY, name TEXT UNIQUE, val DOUBLE, data BLOB)",
      rowidAlias = 0,
      indexes = Seq(IndexDef("sqlite_autoindex_small_1", Seq(1))))
    val rows1 = Seq(
      (1L, Seq[V](VInt(1), VText("alpha"), VReal(1.5), VBlob(Array[Byte](1, 2, 3)))),
      (2L, Seq[V](VInt(2), VText("beta"), VReal(-2.25), VNull)),
      (7L, Seq[V](VInt(7), VText("gamma ü"), VReal(0.0), VBlob(Array.empty[Byte]))))
    val t2 = TableDef("big",
      "CREATE TABLE \"big\" (fid INTEGER PRIMARY KEY, k INTEGER, txt TEXT)",
      rowidAlias = 0)
    val rows2 = (1 to 20000).map(i =>
      (i.toLong, Seq[V](VInt(i), VInt(i * 31L), VText(s"row_$i" * 3))))
    val bytes = Sqlite.build(Seq(t1 -> rows1, t2 -> rows2),
      applicationId = 0x47504B47, userVersion = 10300)
    val path = java.nio.file.Files.createTempDirectory("sqlite").toString + "/test.db"
    Sqlite.writeFile(path, bytes)
    (path, bytes)
  }

  test("round-trip through our own reader (multi-level b-tree)") {
    val (path, _) = buildTest()
    val db = Sqlite.openFile(path)
    assert(db.master.collect { case ("table", n, _, _, _) => n } == Seq("small", "big"))
    // the autoindex entry is present with NULL sql (schema format requirement)
    assert(db.master.exists { case (t, n, tbl, _, sql) =>
      t == "index" && n == "sqlite_autoindex_small_1" && tbl == "small" && sql.isEmpty
    })
    val small = db.scan(db.tableRoot("small"))
    assert(small.map(_._1) == Seq(1L, 2L, 7L))
    // rowid-alias column reads back NULL (value lives in the rowid)
    assert(small.head._2.head == VNull)
    assert(small.head._2(1) == VText("alpha"))
    assert(small(1)._2(2) == VReal(-2.25))
    assert(small(2)._2(1) == VText("gamma ü"))
    val big = db.scan(db.tableRoot("big"))
    assert(big.size == 20000)
    assert(big.head._1 == 1L && big.last._1 == 20000L)
    assert(big(12345)._2(1) == VInt(12346L * 31))
  }

  test("a real SQLite engine (python3 stdlib sqlite3) reads the file") {
    val python = Seq("/bin/sh", "-c", "command -v python3").!!.trim
    assume(python.nonEmpty, "python3 not on PATH")
    val (path, _) = buildTest()
    val script =
      s"""import sqlite3, sys
         |c = sqlite3.connect("$path")
         |ic = c.execute("PRAGMA integrity_check").fetchone()[0]
         |assert ic == "ok", ic
         |assert c.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
         |assert c.execute("PRAGMA user_version").fetchone()[0] == 10300
         |rows = c.execute("SELECT fid, name, val, data FROM small ORDER BY fid").fetchall()
         |assert rows[0] == (1, "alpha", 1.5, b"\\x01\\x02\\x03"), rows[0]
         |assert rows[1][1] == "beta" and rows[1][2] == -2.25 and rows[1][3] is None
         |assert rows[2] == (7, "gamma \\u00fc", 0.0, b""), rows[2]
         |n, s = c.execute("SELECT count(*), sum(k) FROM big").fetchone()
         |assert n == 20000 and s == 31 * 20000 * 20001 // 2, (n, s)
         |one = c.execute("SELECT txt FROM big WHERE fid = 777").fetchone()[0]
         |assert one == "row_777" * 3, one
         |# the PK autoindex is usable by the engine
         |via_idx = c.execute(
         |    "SELECT fid FROM small INDEXED BY sqlite_autoindex_small_1 "
         |    "WHERE name = 'beta'").fetchone()[0]
         |assert via_idx == 2, via_idx
         |print("PYOK")
         |""".stripMargin
    val out = runPython(script)
    assert(out.contains("PYOK"), out)
  }

  test("payload over the no-overflow limit fails loudly") {
    val t = TableDef("t", "CREATE TABLE t (fid INTEGER PRIMARY KEY, b BLOB)",
      rowidAlias = 0)
    val big = Array.fill[Byte](5000)(42)
    val e = intercept[IllegalArgumentException] {
      Sqlite.build(Seq(t -> Seq((1L, Seq[V](VInt(1), VBlob(big))))))
    }
    assert(e.getMessage.contains("raise pageSize"))
    // and the documented fix works
    val bytes = Sqlite.build(Seq(t -> Seq((1L, Seq[V](VInt(1), VBlob(big))))),
      pageSize = 16384)
    val db = Sqlite.open(bytes)
    assert(db.scan(db.tableRoot("t")).head._2(1).asInstanceOf[VBlob].v.length == 5000)
  }

  test("seeded fuzz: random typed tables round-trip through a real engine") {
    val rnd = new scala.util.Random(20260813L)
    def randV(): V = rnd.nextInt(5) match {
      case 0 => VNull
      case 1 => VInt(rnd.nextLong() >> rnd.nextInt(56))
      case 2 => VReal(rnd.nextDouble() * math.pow(10, rnd.nextInt(8)))
      case 3 => VText(rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
      case 4 => val b = new Array[Byte](rnd.nextInt(60)); rnd.nextBytes(b); VBlob(b)
    }
    val nCols = 5
    val rows = (1 to 3000).map { i =>
      (i.toLong, Seq[V](VInt(i)) ++ (1 until nCols).map(_ => randV()))
    }
    val t = TableDef("fuzz",
      "CREATE TABLE fuzz (fid INTEGER PRIMARY KEY, c1, c2, c3, c4)",
      rowidAlias = 0)
    val bytes = Sqlite.build(Seq(t -> rows), pageSize = 1024)
    // our reader reproduces every value
    val db = Sqlite.open(bytes)
    val back = db.scan(db.tableRoot("fuzz"))
    assert(back.size == 3000)
    back.zip(rows).foreach { case ((rid, got), (erid, want)) =>
      assert(rid == erid)
      got.zip(want.updated(0, VNull)).foreach {
        case (VBlob(a), VBlob(b)) => assert(java.util.Arrays.equals(a, b))
        case (a, b) => assert(a == b, s"row $rid")
      }
    }
    // and a real engine agrees on the aggregate shape
    val python = Seq("/bin/sh", "-c", "command -v python3").!!.trim
    assume(python.nonEmpty, "python3 not on PATH")
    val path = java.nio.file.Files.createTempDirectory("fuzz").toString + "/fuzz.db"
    Sqlite.writeFile(path, bytes)
    val script =
      s"""import sqlite3
         |c = sqlite3.connect("$path")
         |assert c.execute("PRAGMA integrity_check").fetchone()[0] == "ok"
         |n, lo, hi = c.execute("SELECT count(*), min(fid), max(fid) FROM fuzz").fetchone()
         |assert (n, lo, hi) == (3000, 1, 3000), (n, lo, hi)
         |print("PYOK")
         |""".stripMargin
    assert(runPython(script).contains("PYOK"))
  }

  test("deterministic: same input builds identical bytes") {
    val t = TableDef("t", "CREATE TABLE t (a INTEGER, b TEXT)")
    val rows = Seq((1L, Seq[V](VInt(5), VText("x"))), (2L, Seq[V](VInt(6), VText("y"))))
    val b1 = Sqlite.build(Seq(t -> rows))
    val b2 = Sqlite.build(Seq(t -> rows))
    assert(java.util.Arrays.equals(b1, b2))
  }

  private def runPython(script: String): String = {
    val f = java.nio.file.Files.createTempFile("sq", ".py")
    java.nio.file.Files.write(f, script.getBytes("UTF-8"))
    try Seq("python3", f.toString).!!
    finally java.nio.file.Files.delete(f)
  }

  private implicit class Cmd(cmd: Seq[String]) {
    def !! : String = {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      val rc = p.waitFor()
      require(rc == 0, s"${cmd.mkString(" ")} rc=$rc:\n$out")
      out
    }
  }
}
