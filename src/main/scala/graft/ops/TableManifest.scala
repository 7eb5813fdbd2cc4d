package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** Versioned snapshot manifest for the directory lifecycle tables
  * ([[Layout]]) — the minimal commit protocol that closes the
  * consolidate reader race without a transaction log.
  *
  * The race (documented through r18): optimize/consolidate committed a
  * merged generation then DELETED the inputs, so a reader that resolved
  * its file list before the delete could fail mid-scan with
  * FileNotFoundException — and the pre-delete instant where both old and
  * new generations exist would double-read if listing raced the pass.
  * The manifest closes both sides:
  *
  *  - a maintenance pass writes its output, then commits ONE file,
  *    `_manifest-<seq>` (write `.tmp` + atomic rename), that flips the
  *    visible snapshot: the new generation becomes live and the inputs
  *    retire in the same instant;
  *  - physical deletion of retired entries is DEFERRED to the start of
  *    the NEXT maintenance pass (or an explicit [[Layout.vacuum]]) — a
  *    reader that resolved the previous snapshot keeps scanning files
  *    that still exist, for at least one full maintenance interval (the
  *    Delta/Iceberg retention contract, without their log machinery).
  *
  * Entry semantics are chosen per relation so MULTI-writer appends stay
  * manifest-free (only the single maintenance writer ever commits):
  *
  *  - `gen:<name>` — INCLUSIVE generation set. Generations are created
  *    only by the maintenance writer, so the manifest can own the whole
  *    set; a half-written gen dir is invisible until the commit.
  *  - `xdel:<file>` — EXCLUDED tombstone files (deletes/). Tombstones
  *    are appended by arbitrary writers and must be visible immediately,
  *    so the manifest only ever RETIRES them (applied + superseded).
  *  - `xtail:<file>` — EXCLUDED tail files (tail/), retired by the
  *    optimize pass that compacted them into a generation — in the SAME
  *    commit that admits the generation, so the write-gen/delete-tail
  *    duplicate-read window of the pre-manifest lifecycle is gone too.
  *    Fresh appends are new (UUID-named) files, visible untracked.
  *  - `stat:<relpath>` / `xstat:<relpath>` — the BM25 additive-stats
  *    fold ([[graft.text.Bm25.consolidateIndex]]): the folded row is
  *    staged in a subdirectory (invisible to the direct-file listing),
  *    then one commit ADMITS it (`stat:`) and retires the originals
  *    (`xstat:`) atomically — the r18 append-then-delete double-count
  *    window is gone. Fresh appends are direct files, visible untracked.
  *
  * Directories with no manifest (pre-manifest tables, or plain writes)
  * fall back to live listing — the r18 behavior, unchanged.
  */
private[graft] object TableManifest {

  /** A parsed manifest snapshot. */
  final case class Snapshot(
      seq: Int,
      gens: Option[Seq[String]],
      xdel: Set[String],
      xtail: Set[String],
      stat: Seq[String],
      xstat: Set[String])

  private val Name = "_manifest-(\\d+)".r

  /** The highest-sequence manifest at `dir`, if any. A crashed `.tmp`
    * never matches the name pattern, so only committed manifests are
    * candidates; a candidate that fails to OPEN or READ falls back to
    * the next-lower sequence — a reader racing two successive commits
    * can list a manifest that the newer commit's pruning deletes before
    * the open, and the surviving previous manifest is exactly the
    * one-interval-grace snapshot it is entitled to. If EVERY candidate
    * fails the last error propagates (a table whose whole manifest set
    * is unreadable must fail loudly, not silently degrade to the
    * manifest-less listing fallback and resurrect retired files). */
  def latest(fs: FileSystem, dir: Path): Option[Snapshot] =
    if (!fs.exists(dir)) None
    else {
      val found = manifestFiles(fs, dir).sortBy { case (seq, _) => -seq }
      var i = 0
      var out: Option[Snapshot] = None
      var lastErr: Throwable = null
      while (i < found.length && out.isEmpty) {
        val (seq, p) = found(i)
        try out = Some(parse(fs, p, seq))
        catch { case e: java.io.IOException => lastErr = e }
        i += 1
      }
      if (out.isEmpty && lastErr != null) throw lastErr
      out
    }

  /** (seq, path) of every committed manifest at `dir` (dir must exist). */
  private def manifestFiles(fs: FileSystem, dir: Path): Seq[(Int, Path)] =
    fs.listStatus(dir).toSeq.collect {
      case st if st.isFile =>
        st.getPath.getName match {
          case Name(n) => Some((n.toInt, st.getPath))
          case _ => None
        }
    }.flatten

  /** The newest committed manifest SEQUENCE at `dir` (name-only — no
    * content read), or None without one. Cheap enough for per-call
    * fingerprints ([[ServingCache]]). */
  def latestSeq(fs: FileSystem, dir: Path): Option[Int] =
    if (!fs.exists(dir)) None
    else manifestFiles(fs, dir).map(_._1).maxOption

  /** Milliseconds since the newest manifest at `dir` was committed —
    * None when the table has no manifest. The retention-guard input:
    * a manifest younger than the maintenance interval may still have
    * in-flight readers on the files it retired ([[Layout.vacuum]]). */
  def ageMs(fs: FileSystem, dir: Path): Option[Long] =
    if (!fs.exists(dir)) None
    else manifestFiles(fs, dir).sortBy { case (seq, _) => -seq }.headOption
      .map { case (_, p) =>
        math.max(0L,
          System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime)
      }

  private def parse(fs: FileSystem, p: Path, seq: Int): Snapshot = {
    val text = new String(readFully(fs, p), "UTF-8")
    val lines = text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    val gens = lines.collect { case s if s.startsWith("gen:") => s.drop(4) }
    Snapshot(
      seq,
      // "gens:none" marks a manifest that governs only deletes/stats
      // (no gen entries committed yet) — distinct from an empty set
      if (lines.contains("gens:none")) None else Some(gens),
      lines.collect { case s if s.startsWith("xdel:") => s.drop(5) }.toSet,
      lines.collect { case s if s.startsWith("xtail:") => s.drop(6) }.toSet,
      lines.collect { case s if s.startsWith("stat:") => s.drop(5) },
      lines.collect { case s if s.startsWith("xstat:") => s.drop(6) }.toSet)
  }

  /** Commit a new snapshot: write a uniquely-suffixed
    * `_manifest-<seq+1>.<uuid>.tmp`, close, atomically rename into
    * place, then drop manifests older than the PREVIOUS one (kept so a
    * reader that just listed seq N survives the commit of N+1 — the
    * same one-interval grace as data files).
    *
    * Single maintenance writer ENFORCED, not just contractual: two
    * racing committers compute the same next seq, and the loser fails
    * LOUDLY on every FileSystem — on HDFS its rename-onto-existing
    * returns false (the require below); on local/object-store
    * semantics where rename silently overwrites, the pre-rename
    * existence probe plus the post-rename READ-BACK VERIFY (the
    * committed bytes must be the bytes this writer staged) catch it.
    * The unique tmp suffix keeps the racers from clobbering each
    * other's staging file, and a crashed tmp never matches the
    * manifest name pattern, so it stays invisible. */
  def commit(fs: FileSystem, dir: Path, snap: Snapshot): Unit = {
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val seq = latest(fs, dir).map(_.seq + 1).getOrElse(0)
    val lines = Seq.newBuilder[String]
    snap.gens match {
      case Some(gs) => gs.foreach(g => lines += s"gen:$g")
      case None => lines += "gens:none"
    }
    snap.xdel.toSeq.sorted.foreach(f => lines += s"xdel:$f")
    snap.xtail.toSeq.sorted.foreach(f => lines += s"xtail:$f")
    snap.stat.foreach(f => lines += s"stat:$f")
    snap.xstat.toSeq.sorted.foreach(f => lines += s"xstat:$f")
    val payload =
      (lines.result().mkString("\n") + "\n").getBytes("UTF-8")
    val tmp = new Path(dir,
      s"_manifest-$seq.${java.util.UUID.randomUUID()}.tmp")
    val dst = new Path(dir, s"_manifest-$seq")
    val out = fs.create(tmp, true)
    try out.write(payload)
    finally out.close()
    def lose(detail: String): Nothing = {
      fs.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"manifest commit lost a single-writer race at $dst ($detail) - " +
          "exactly one maintenance writer may run per table")
    }
    if (fs.exists(dst)) lose("destination already committed")
    if (!fs.rename(tmp, dst)) lose("rename refused")
    val committed = new String(readFully(fs, dst), "UTF-8")
    if (committed != new String(payload, "UTF-8"))
      throw new java.util.ConcurrentModificationException(
        s"manifest commit at $dst was overwritten by a racing writer - " +
          "exactly one maintenance writer may run per table")
    fs.listStatus(dir).foreach { st =>
      st.getPath.getName match {
        case Name(n) if n.toInt < seq - 1 => fs.delete(st.getPath, false)
        case _ => ()
      }
    }
  }

  private def readFully(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }
}
