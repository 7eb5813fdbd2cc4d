package graft

import graft.dedup.Clustering
import graft.similarity.Similarity
import graft.text.TextAnalysis

class ClusteringSpec extends SparkSpec {

  private def pairs(rows: (Long, Long)*) =
    spark.createDataFrame(rows).toDF("doc_a", "doc_b")

  test("connectedComponents: chain, clique and singleton-free pair graph") {
    // components: {1,2,3,4} (a chain), {10,11} (one edge), {20,21,22} (triangle)
    val cc = Clustering.connectedComponents(pairs(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)), driverEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents converges on a long path within maxIter") {
    // a 9-node path 0-1-2-...-8: min-label needs ~log rounds with the
    // self-label union, but must still land everything on 0
    val es = (0L until 8L).map(i => (i, i + 1))
    val cc = Clustering.connectedComponents(pairs(es: _*), driverEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet == Set(0L))
    assert(cc.keySet == (0L to 8L).toSet)
  }

  test("pointer doubling: a 1000-node chain converges in <= 20 rounds") {
    // plain per-hop propagation would need 999 rounds and fragment at
    // the maxIter cap; the l(l(v)) shortcut makes it O(log diameter)
    val es = (0L until 999L).map(i => (i, i + 1))
    val cc = Clustering.connectedComponents(pairs(es: _*), driverEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 1000)
    assert(cc.values.toSet == Set(0L))
  }

  test("driver union-find path equals the distributed path exactly") {
    val rnd = new scala.util.Random(7)
    val es = (0 until 300).map(_ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val fast = Clustering.connectedComponents(pairs(es: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Clustering.connectedComponents(pairs(es: _*), driverEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist)
  }

  test("integer doc-id columns work on both paths (cast in projection)") {
    val intPairs = spark.createDataFrame(Seq((1, 2), (2, 3), (5, 6)))
      .toDF("doc_a", "doc_b") // IntegerType, not LongType
    val fast = Clustering.connectedComponents(intPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    val dist = Clustering.connectedComponents(intPairs, driverEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist)
  }

  test("dedupAssign: singletons keep themselves; clusters keep min id") {
    val docs = spark.createDataFrame(Seq(
      (1L, "x"), (2L, "x"), (3L, "y"), (7L, "z"))).toDF("doc_id", "text")
    val out = Clustering.dedupAssign(docs, pairs((1L, 2L)))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) == ((1L, 2L, 1))) // canonical of {1,2}
    assert(out(2L) == ((1L, 2L, 0))) // dropped duplicate
    assert(out(3L) == ((3L, 1L, 1))) // singleton
    assert(out(7L) == ((7L, 1L, 1)))
  }

  test("dedupAssignBy: clusters keep the max-score member, min-id on ties") {
    val docs = spark.createDataFrame(Seq(
      (1L, "x"), (2L, "x"), (3L, "y"), (7L, "z"), (8L, "z"), (9L, "z")))
      .toDF("doc_id", "text")
    // cluster {1,2}: scores 5 vs 9 -> keeper 2 (NOT min-id);
    // cluster {7,8,9}: scores 4,4,1 -> tie at 4 -> keeper min-id 7
    val scores = spark.createDataFrame(Seq(
      (1L, 5L), (2L, 9L), (3L, 2L), (7L, 4L), (8L, 4L), (9L, 1L)))
      .toDF("doc_id", "score")
    val out = Clustering.dedupAssignBy(docs,
        pairs((1L, 2L), (7L, 8L), (8L, 9L)), scores)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) == ((1L, 2L, 0)))
    assert(out(2L) == ((1L, 2L, 1))) // higher score wins over min-id
    assert(out(3L) == ((3L, 1L, 1))) // singleton keeps itself
    assert(out(7L) == ((7L, 3L, 1))) // score tie -> lowest doc_id
    assert(out(8L) == ((7L, 3L, 0)))
    assert(out(9L) == ((7L, 3L, 0)))
  }

  test("dedupAssignBy: unscored members keep cluster_size, never win") {
    val docs = spark.createDataFrame(Seq(
      (1L, "x"), (2L, "x"), (3L, "x"), (5L, "y"), (6L, "y")))
      .toDF("doc_id", "text")
    // cluster {1,2,3}: only 3 is scored -> 3 wins; 1 and 2 still count.
    // cluster {5,6}: NOBODY scored -> min-id fallback (5 wins)
    val scores = spark.createDataFrame(Seq((3L, 1L))).toDF("doc_id", "score")
    val out = Clustering.dedupAssignBy(docs,
        pairs((1L, 2L), (2L, 3L), (5L, 6L)), scores)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) == ((1L, 3L, 0)))
    assert(out(2L) == ((1L, 3L, 0)))
    assert(out(3L) == ((1L, 3L, 1)))
    assert(out(5L) == ((5L, 2L, 1)))
    assert(out(6L) == ((5L, 2L, 0)))
  }

  test("dedupAssignBy: duplicate score rows don't inflate clusters or output") {
    val docs = spark.createDataFrame(Seq((1L, "x"), (2L, "x")))
      .toDF("doc_id", "text")
    // doc 1 scored twice (3 then 9): max wins, and the duplicate must
    // neither double-count cluster_size nor duplicate output rows.
    val scores = spark.createDataFrame(Seq((1L, 3L), (1L, 9L), (2L, 5L)))
      .toDF("doc_id", "score")
    val rows = Clustering.dedupAssignBy(docs, pairs((1L, 2L)), scores).collect()
    assert(rows.length == 2)
    val out = rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) == ((1L, 2L, 1))) // max(3,9)=9 beats 5
    assert(out(2L) == ((1L, 2L, 0)))
  }

  test("tfIdf ranks rare terms above common ones with rational idf") {
    val docs = spark.createDataFrame(Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana banana banana"))).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdf(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(5)) -> (r.getString(1), r.getDouble(4)))
      .toMap
    // N=3. apple: tf=2 df=1 -> 2*4/2=4; banana doc1: tf=1 df=3 -> 1*4/4=1
    assert(out((1L, 1)) == (("apple", 4.0)))
    assert(out((1L, 2)) == (("banana", 1.0)))
    // cherry: 1*4/2=2 beats banana 1*4/4=1
    assert(out((2L, 1)) == (("cherry", 2.0)))
    // doc3 only has banana: tf=3 -> 3*4/4=3
    assert(out((3L, 1)) == (("banana", 3.0)))
  }

  test("packSequences: concat-then-chunk offsets within each source shard") {
    val docs = spark.createDataFrame(Seq(
      (1L, "a b c", "s1"),     // 3 tokens, offset 0
      (2L, "d e f g", "s1"),   // 4 tokens, offset 3
      (3L, "h i", "s1"),       // offset 7 -> bin 1 (capacity 4), pos 3
      (10L, "x y z", "s2")))   // separate shard restarts at 0
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.packSequences(docs, capacity = 4L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) == ((3L, 0L, 0L, 0L)))
    assert(out(2L) == ((4L, 3L, 0L, 3L)))
    assert(out(3L) == ((2L, 7L, 1L, 3L)))
    assert(out(10L) == ((3L, 0L, 0L, 0L)))
  }

  test("cleaningFunnel: monotone stage counts in one pass") {
    val docs = spark.createDataFrame(Seq(
      (1L, ("w " * 25).trim, "en"),  // long, en
      (2L, ("w " * 25).trim, "en"),  // duplicate text of 1
      (3L, ("v " * 25).trim, "de"),  // long, wrong lang
      (4L, "short text", "en")))     // too short
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.cleaningFunnel(docs, minWords = 20, lang = "en")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map(
      "total" -> 4L, "min_length" -> 3L, "language" -> 2L, "exact_dedup" -> 1L))
  }

  test("trainingPipeline: filter -> dedup-keep -> pack composes correctly") {
    val long = ("w " * 25).trim // 25 tokens
    val docs = spark.createDataFrame(Seq(
      (1L, long, "en", "s1"),          // kept, offset 0
      (2L, long, "en", "s1"),          // exact dup of 1 -> dropped
      (3L, long + " extra", "en", "s1"), // kept (26 tokens), offset 25
      (4L, "too short", "en", "s1"),   // length-filtered
      (5L, long, "de", "s1")))         // language-filtered
      .toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.trainingPipeline(docs, minWords = 20, lang = "en",
      capacity = 30L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L) == ((25L, 0L, 0L, 0L)))
    assert(out(3L) == ((26L, 25L, 0L, 25L))) // straddles into bin 1
  }

  test("quantizeInt8: exact codes for a hand vector") {
    // embedding [0.1, -0.2, 0.05] -> v = [100, -200, 50], maxabs 200
    // q = round(127*v/200) = [64, -127, 32]
    // err = (100*127-64*200)^2 + (-200*127+127*200)^2 + (50*127-32*200)^2
    //     = (-100)^2 + 0 + (-50)^2 = 12500
    val emb = spark.createDataFrame(Seq(
      (1L, Array(0.1f, -0.2f, 0.05f)))).toDF("vec_id", "embedding")
    val r = Similarity.quantizeInt8(emb).collect().head
    assert(r.getLong(1) == 200L)
    assert(r.getLong(2) == 12500L)
    // rel = 12500 / (16129 * (100^2+200^2+50^2)) = 12500/(16129*52500)
    assert(math.abs(r.getDouble(3) - 12500.0 / (16129.0 * 52500.0)) < 1e-9)
  }

  test("kmeansStep: per-dimension member means") {
    // centroidMod 2 -> centroids are vec 0 and vec 2 (ids 0,2 mod 2 == 0)
    val emb = spark.createDataFrame(Seq(
      (0L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (1L, Array(0.9f, 0.1f)),   // assigns to centroid 0
      (3L, Array(0.1f, 0.9f)))). // assigns to centroid 2
      toDF("vec_id", "embedding")
    val out = Similarity.kmeansStep(emb, centroidMod = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out((0L, 0)) == ((2L, 950.0)))  // mean(1000, 900)
    assert(out((0L, 1)) == ((2L, 50.0)))   // mean(0, 100)
    assert(out((2L, 0)) == ((2L, 50.0)))
    assert(out((2L, 1)) == ((2L, 950.0)))
  }
}
