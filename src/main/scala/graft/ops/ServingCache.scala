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
  * and past a small bound the least-recently-used entries are evicted
  * unconditionally (an in-memory scan, never a filesystem probe), so
  * the cache never outgrows the set of indexes a session serves. */
object ServingCache {

  private final class Entry(val fp: String, val value: Any) {
    @volatile var lastUsed: Long = 0L
  }
  private val map =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Entry]()
  private val tick = new java.util.concurrent.atomic.AtomicLong()
  private val hitCount = new java.util.concurrent.atomic.AtomicLong()
  private val missCount = new java.util.concurrent.atomic.AtomicLong()

  /** Bound on live entries — far above the set of indexes one session
    * serves; reached only by gate/bench loops churning short-lived
    * temp indexes, where the OLDEST-USED entries are exactly the dead
    * ones. */
  private val MaxEntries = 64

  /** (hits, misses) since the last [[invalidate]] — lets benches/specs
    * REQUIRE that a repeat search actually served from the cache
    * instead of inferring it from noisy wall-clock deltas. */
  def stats(): (Long, Long) = (hitCount.get(), missCount.get())

  /** The lifecycle fingerprint of `dir` — recursive sorted
    * (path, len, mtime) digest plus the newest manifest SEQUENCE;
    * "absent" when the dir does not exist. The explicit seq component
    * makes manifest-governed invalidation STRUCTURAL: even a
    * same-length in-place overwrite inside one mtime tick (unreachable
    * through the lifecycle — part names are UUIDs — but cheap to rule
    * out) flips the fingerprint as soon as a manifest commits. */
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
    sb.append("seq:")
      .append(graft.ops.TableManifest.latestSeq(fs, p).getOrElse(-1))
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
    if (cur != null && cur.fp == fp) {
      hitCount.incrementAndGet()
      cur.lastUsed = tick.incrementAndGet()
      cur.value.asInstanceOf[T]
    } else {
      missCount.incrementAndGet()
      // a session serving many short-lived indexes (every Bench rep of
      // every lifecycle gate creates one) must not accumulate dead
      // codebooks: past the bound, evict the LEAST-RECENTLY-USED
      // entries UNCONDITIONALLY — an in-memory scan, never a
      // filesystem probe, so a population of 65 live dirs costs one
      // map pass per eviction instead of a recursive listing of every
      // cached dir on every miss
      while (map.size >= MaxEntries) {
        var oldest: (String, String) = null
        var oldestUsed = Long.MaxValue
        map.forEach { (k, e) =>
          if (e.lastUsed < oldestUsed) { oldestUsed = e.lastUsed; oldest = k }
        }
        if (oldest == null) map.clear() else map.remove(oldest)
      }
      val v = load
      val e = new Entry(fp, v)
      e.lastUsed = tick.incrementAndGet()
      map.put(key, e)
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
