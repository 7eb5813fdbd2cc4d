package graft

/** Session-wide registry of gate-created temp directories.
  *
  * Lifecycle gates (q_bm25_persisted, q_ivfpq_delete, q_zorder_delete, …)
  * build a persisted index under a temp dir and return a DataFrame that
  * lazily READS it — so the gate cannot delete the dir itself (the result
  * is materialized by whoever invoked it). Without a hand-off, every
  * Verify/Bench rep leaks a full index into /tmp. This registry is the
  * hand-off, mirroring [[Caching]]: gates create dirs through [[create]],
  * and [[Caching.release]] (already called by Verify/Bench/RunOne/
  * ScaleBench after each query's result is consumed) purges them.
  */
object TempDirs {
  private val registry =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  /** Create a temp directory tracked for the next [[purge]]. */
  def create(prefix: String): String = createPath(prefix).toString

  /** [[create]] returning the Path (for sinks that need one). */
  def createPath(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    registry.add(p)
    p
  }

  /** Delete every tracked directory recursively. Idempotent; missing
    * files (another purge racing, or a dir the gate already removed)
    * are ignored. */
  def purge(): Unit = {
    var p = registry.poll()
    while (p != null) {
      deleteRecursive(p)
      p = registry.poll()
    }
  }

  /** Recursive delete (missing entries ignored) — the ONE shared copy;
    * the bench mains delegate here instead of hand-rolling drifting
    * variants. Does not follow symlinks. */
  def deleteRecursive(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p,
      java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = java.nio.file.Files.list(p)
      try s.forEach(c => deleteRecursive(c)) finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p)
    ()
  }
}
