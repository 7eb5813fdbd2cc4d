package graft

import graft.ops.ServingCache
import graft.similarity.Similarity
import graft.text.Bm25
import org.apache.spark.sql.functions._

/** The driver-side serving-metadata cache: a repeat search of an
  * unchanged index must be a cache HIT with bit-identical results, and
  * every lifecycle mutation (append/delete/consolidate) must flip the
  * lifecycle fingerprint and reload — correctness never depends on the
  * cache being warm OR cold. */
class ServingCacheSpec extends SparkSpec {

  test("fingerprint: stable on an unchanged dir, flipped by any file " +
    "change, distinct across dirs, 'absent' for missing") {
    val a = java.nio.file.Files.createTempDirectory("svcfp_a").toString
    val b = java.nio.file.Files.createTempDirectory("svcfp_b").toString
    spark.range(5).write.parquet(s"$a/t")
    spark.range(5).write.parquet(s"$b/t")
    val fa1 = ServingCache.fingerprint(spark, a)
    assert(fa1 == ServingCache.fingerprint(spark, a))
    assert(fa1 != ServingCache.fingerprint(spark, b)) // paths differ
    spark.range(3).write.mode("append").parquet(s"$a/t")
    assert(fa1 != ServingCache.fingerprint(spark, a))
    assert(ServingCache.fingerprint(spark, s"$a/nope") == "absent")
  }

  test("BM25 serving: repeat search hits the cache with identical " +
    "results; append and delete invalidate through the fingerprint") {
    ServingCache.invalidate()
    val docs = spark.createDataFrame((0L until 30L).map(i =>
      (i, s"alpha w${i % 7} tok$i"))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("svcbm").toString
    val queries = Seq((0, "alpha w3"), (1, "tok25"))
    def res() = Bm25.searchPersisted(spark, dir, queries).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    Bm25.writeIndex(spark, docs.where(col("doc_id") < 20), dir,
      numFiles = 2)
    val first = res()
    assert(res() == first, "cache hit diverged from the miss")
    // append: stats fingerprint flips (new additive row), N grows, and
    // the just-appended doc is retrievable — a stale cached N would
    // skew every idf
    Bm25.appendIndex(spark, dir, docs.where(col("doc_id") >= 20))
    val after = res()
    assert(after != first, "append invisible - stale stats cache")
    assert(after == Bm25.search(spark, docs, queries).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet)
    // delete: negative stats row lands, fingerprint flips again
    Bm25.deleteIndex(spark, dir,
      docs.where(col("doc_id") === 25L).select("doc_id"))
    val afterDel = res()
    assert(afterDel != after, "delete invisible - stale stats cache")
    assert(afterDel == Bm25.search(spark,
      docs.where(col("doc_id") =!= 25L), queries).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet)
  }

  test("IVF+PQ serving: repeat search hits the cached cents/book with " +
    "identical results; the caches are per-directory") {
    ServingCache.invalidate()
    def vecs(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(3)),
        d => (((col("id") * 13 + d * 11) % 29) + 1).cast("float"))
        .as("embedding"))
    val dirA = java.nio.file.Files.createTempDirectory("svcannA").toString
    val dirB = java.nio.file.Files.createTempDirectory("svcannB").toString
    Similarity.ivfPqWriteIndexTrained(vecs(40), s"$dirA/index",
      numFiles = 2, m = 2, dims = 4, ksub = 4, nlists = 3, iters = 1,
      trainMod = 3)
    // dirB indexes a DIFFERENT corpus — per-dir keying must keep them
    // apart even when searched interleaved
    Similarity.ivfPqWriteIndexTrained(vecs(20), s"$dirB/index",
      numFiles = 2, m = 2, dims = 4, ksub = 4, nlists = 3, iters = 1,
      trainMod = 3)
    val q = vecs(40).where(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def res(dir: String) = Similarity.ivfPqSearchPersistedQ(spark,
      s"$dir/index", q, k = 3, m = 2, dims = 4, centroidMod = 1,
      nprobe = 2, excludeSelf = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    val a1 = res(dirA)
    val b1 = res(dirB)
    assert(res(dirA) == a1 && res(dirB) == b1,
      "cache hit diverged from the miss")
    assert(a1 != b1, "fixture too weak: both dirs identical")
    // append flips the codes fingerprint... and the cents/book dirs are
    // untouched by an append, so THEIR cached rows legitimately keep
    // serving — results must still reflect the appended rows (the codes
    // relation is scanned live, never cached)
    Similarity.ivfPqAppendIndex(spark, s"$dirA/index",
      vecs(44).where(col("vec_id") >= 40), m = 2, dims = 4)
    val a2 = res(dirA)
    assert(a2.nonEmpty)
    assert(res(dirB) == b1, "append to dirA disturbed dirB's serving")
  }

  test("fingerprint is STRUCTURAL under manifest commits: a same-length " +
    "in-place overwrite within one mtime tick still reloads once a " +
    "manifest bumps") {
    val dir = java.nio.file.Files.createTempDirectory("svcseq").toString
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val f = new org.apache.hadoop.fs.Path(dir, "data.bin")
    def put(payload: String): Unit = {
      val out = fs.create(f, true)
      try out.write(payload.getBytes("UTF-8")) finally out.close()
    }
    put("aaaa")
    val mtime = fs.getFileStatus(f).getModificationTime
    val fp1 = ServingCache.fingerprint(spark, dir)
    // adversarial overwrite: same path, same length, mtime pinned back
    // to the original tick — the (path, len, mtime) walk alone cannot
    // see this
    put("bbbb")
    fs.setTimes(f, mtime, -1)
    assert(ServingCache.fingerprint(spark, dir) == fp1,
      "fixture too weak: the walk already distinguishes the overwrite")
    // any lifecycle mutation commits a manifest — the seq component
    // flips the fingerprint even though the file walk is blind
    graft.ops.TableManifest.commit(fs, p, graft.ops.TableManifest.Snapshot(
      0, Some(Seq.empty), Set.empty, Set.empty, Seq.empty, Set.empty))
    assert(ServingCache.fingerprint(spark, dir) != fp1,
      "manifest bump must flip the fingerprint")
  }

  test("eviction is LRU past the bound — no filesystem probes, live " +
    "dirs evicted oldest-first, recent entries survive") {
    ServingCache.invalidate()
    val dir = java.nio.file.Files.createTempDirectory("svclru").toString
    spark.range(2).write.parquet(s"$dir/t")
    def load(kind: String): Int = ServingCache.cached(kind, spark, dir)(1)
    // fill well past the 64-entry bound with live-dir entries — the old
    // dead-dir sweep would find nothing evictable and rescan forever
    (0 until 70).foreach(i => load(s"k$i"))
    val (h0, m0) = ServingCache.stats()
    assert(m0 == 70 && h0 == 0)
    // the most recent entries survived
    load("k69"); load("k68")
    val (h1, _) = ServingCache.stats()
    assert(h1 == 2, "recently-used entries were evicted")
    // the oldest were evicted — a re-access misses and reloads
    load("k0")
    val (h2, m2) = ServingCache.stats()
    assert(h2 == 2 && m2 == 71, "LRU must have evicted the oldest entry")
  }
}
