package graft.ops

import org.apache.spark.sql.SparkSession

/** Driver-side memoization of per-index SERVING metadata — the BM25
  * additive-stats sum, the IVF+PQ coarse-centroid and codebook rows.
  *
  * A single gate call reads these once; a real serving workload issues
  * thousands of query batches against one index, and r18 paid a driver
  * parquet read (job launch + footer decode) per batch per relation.
  * Each entry is keyed by the artifact directory plus a LIFECYCLE
  * FINGERPRINT — the sorted (path, length, mtime) set of every file
  * under the directory — so invalidation is exact-by-construction:
  * append/delete/consolidate/vacuum all change the file set (parquet
  * part names are UUIDs; manifests are versioned), flipping the
  * fingerprint and forcing a reload, while repeated searches of an
  * unchanged index pay one directory listing instead of a Spark job.
  * The values cached are metadata-sized by the operators' own driver
  * bounds (the codebook collect is require-capped at 16M cells).
  *
  * One live entry per (kind, dir): a stale fingerprint is overwritten,
  * so the cache never outgrows the set of indexes a session serves. */
object ServingCache {

  private val map =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, Any)]()
  private val hitCount = new java.util.concurrent.atomic.AtomicLong()
  private val missCount = new java.util.concurrent.atomic.AtomicLong()

  /** (hits, misses) since the last [[invalidate]] — lets benches/specs
    * REQUIRE that a repeat search actually served from the cache
    * instead of inferring it from noisy wall-clock deltas. */
  def stats(): (Long, Long) = (hitCount.get(), missCount.get())

  /** The lifecycle fingerprint of `dir` — recursive sorted
    * (path, len, mtime) digest; "absent" when the dir does not exist. */
  def fingerprint(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return "absent"
    val sb = new StringBuilder
    def walk(path: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(path).sortBy(_.getPath.getName).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else sb.append(st.getPath.toString).append(':')
          .append(st.getLen).append(':')
          .append(st.getModificationTime).append(';')
      }
    walk(p)
    java.util.UUID
      .nameUUIDFromBytes(sb.result().getBytes("UTF-8")).toString
  }

  /** `load` memoized under (`kind`, `dir`), revalidated against the
    * directory's current fingerprint on every call — a hit costs one
    * FS listing; any lifecycle change reloads. */
  def cached[T](kind: String, spark: SparkSession, dir: String)(
      load: => T): T = {
    val fp = fingerprint(spark, dir)
    val key = (kind, dir)
    val cur = map.get(key)
    if (cur != null && cur._1 == fp) {
      hitCount.incrementAndGet()
      cur._2.asInstanceOf[T]
    } else {
      missCount.incrementAndGet()
      // a session serving many short-lived indexes (every Bench rep of
      // every lifecycle gate creates one) must not accumulate dead
      // codebooks: once the map outgrows a small bound, drop entries
      // whose directory no longer exists — their fingerprint can never
      // match again
      if (map.size > 64) {
        val it = map.keySet.iterator()
        while (it.hasNext) {
          val k = it.next()
          if (fingerprint(spark, k._2) == "absent") it.remove()
        }
      }
      val v = load
      map.put(key, (fp, v))
      v
    }
  }

  /** Drop every entry and zero the counters (tests; or a session
    * serving untrusted dirs). */
  def invalidate(): Unit = {
    map.clear()
    hitCount.set(0L)
    missCount.set(0L)
  }
}
