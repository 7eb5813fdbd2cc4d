package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis
import graft.dedup.Dedup

class TextDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  test("normalizeText canonicalizes case, punctuation and whitespace") {
    val out = TextAnalysis.normalizeText(docs(
      (1L, "Hello,  World! 123"), (2L, "  spaced   out  ")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "hello world 123")
    assert(out(2L) == "spaced out")
  }

  test("repetition: duplicate-word ratio and top-word fraction") {
    val out = TextAnalysis.repetition(docs(
      (1L, "a a a b"), (2L, "x y z w")))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((4L, 2L, 0.5, 0.75)))
    assert(out(2L) == ((4L, 4L, 0.0, 0.25)))
  }

  test("decontaminate flags docs sharing a probe n-gram, keeps clean docs") {
    val out = TextAnalysis.decontaminate(docs(
      (1L, "the quick brown fox jumps over"), // contains the probe 5-gram
      (2L, "completely unrelated clean text here")),
      Seq("the quick brown fox jumps", "quick brown fox jumps over"), n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((2L, true))) // both probes present
    assert(out(2L) == ((0L, false)))
  }

  test("portableHash matches the cross-engine reference value") {
    // DuckDB: list_reduce over ascii chars of 'hello' base 31 mod 1e9+7
    val h = spark.range(1).select(TextAnalysis.portableHash(lit("hello")))
      .collect()(0).getLong(0)
    assert(h == 99162322L)
  }

  test("custom expressions callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val h = spark.sql("SELECT portable_hash('hello') AS h").collect()(0).getLong(0)
    assert(h == 99162322L)
    val sh = spark.sql(
      "SELECT shingles(text, 2) AS s FROM VALUES ('a b c') t(text)")
      .collect().map(_.getString(0)).toSet
    assert(sh == Set("a b", "b c"))
  }

  test("native codegen hash == declarative fold on real corpus strings") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
      TextAnalysis.portableHash(col("text")).as("a"),
      TextAnalysis.portableHashDeclarative(col("text")).as("b"))
      .where(col("a") =!= col("b"))
    assert(diff.count() == 0)
    // and on edge cases incl. empty string
    val edge = spark.createDataFrame(Seq((1L, ""), (2L, "a"), (3L, "zz zz")))
      .toDF("id", "text")
    val d2 = edge.select(
      TextAnalysis.portableHash(col("text")).as("a"),
      TextAnalysis.portableHashDeclarative(col("text")).as("b"))
      .where(col("a") =!= col("b"))
    assert(d2.count() == 0)
  }

  test("textStats computes exact counts on a known sentence") {
    val d = docs((1L, "the cat sat on the mat"))
    val r = TextAnalysis.textStats(d, Seq("the", "on")).collect()(0)
    assert(r.getInt(1) == 6) // n_words
    assert(r.getInt(2) == 3) // 'the' x2 + 'on'
    assert(r.getDouble(3) == 0.5) // stop_ratio
    // 17 letters / 6 words
    assert(math.abs(r.getDouble(4) - 17.0 / 6.0) < 1e-6)
  }

  test("langId scores marker words with deterministic tie-break") {
    val d = docs((1L, "le chat et la table"), (2L, "xyzzy plugh"))
    val out = TextAnalysis.langId(spark, d,
      Seq(("le", "fr"), ("la", "fr"), ("et", "fr"), ("the", "en")))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("fr", 3L)))
    assert(out(2L) == (("und", 0L)))
  }

  test("winnowing: identical docs share all fingerprints; long shared runs overlap") {
    val a = "the quick brown fox jumps over the lazy dog near the old barn today"
    val b = "completely different prefix words here " + a.split(' ').drop(2).mkString(" ")
    val d = docs((1L, a), (2L, a), (3L, b))
    val fp = TextAnalysis.winnowing(d, n = 3, w = 4).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => r.getLong(2)).toSet).toMap
    assert(fp(1L) == fp(2L))
    // doc 3 shares a >= w+n-1 word run with doc 1 -> guaranteed overlap
    assert((fp(1L) & fp(3L)).nonEmpty)
    assert(fp(1L) != fp(3L))
  }

  test("deterministic sampling: slots, strata, holdout") {
    val d = spark.createDataFrame((0L until 100L).map(i => (i, s"g${i % 2}")))
      .toDF("doc_id", "grp")
    assert(graft.ops.Sampling.slotSample(d, "doc_id", 10).count() == 10)
    val strat = graft.ops.Sampling.stratifiedSample(d, Seq("grp"), "doc_id", 3)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(strat.toSet == Set(("g0", 0L), ("g0", 2L), ("g0", 4L),
      ("g1", 1L), ("g1", 3L), ("g1", 5L)))
    val split = graft.ops.Sampling.holdoutSplit(d, "doc_id", 80, 10)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split == Map("train" -> 80L, "val" -> 10L, "test" -> 10L))
  }

  test("decontaminatedSplit flags train docs sharing an n-gram with holdout") {
    // ids chosen so 95 lands in 'test' (95 % 100 >= 90) and the rest in
    // 'train'; doc 1 shares the test doc's 3-gram, doc 2 does not
    val d = docs(
      (1L, "alpha beta gamma delta"), // train, leaks "alpha beta gamma"
      (2L, "epsilon zeta eta theta"), // train, clean
      (95L, "alpha beta gamma omega")) // test
    val out = graft.ops.Sampling.decontaminatedSplit(d, 80, 10, n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2))))
      .toMap
    assert(out(1L) == (("train", true)))
    assert(out(2L) == (("train", false)))
    assert(out(95L) == (("test", false))) // held-out docs are never flagged
  }

  test("exactDuplicates maps copies to the smallest doc_id") {
    val d = docs((5L, "aaa"), (2L, "bbb"), (9L, "aaa"))
    val out = Dedup.exactDuplicates(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out(5L) == ((5L, 0)))
    assert(out(9L) == ((5L, 1)))
    assert(out(2L) == ((2L, 0)))
  }

  test("shingles builds distinct word 3-grams; short docs yield none") {
    val d = docs((1L, "a b c d"), (2L, "x y"))
    val sh = Dedup.shingles(d, 3).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sh == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("identical docs share minhash signatures and simhash; near-identical mostly") {
    val d = docs(
      (1L, "spark shuffles data across the cluster for wide joins"),
      (2L, "spark shuffles data across the cluster for wide joins"),
      (3L, "completely different words entirely here now"))
    val mh = Dedup.minhashSignatures(spark, Dedup.shingles(d), numHashes = 8)
    val sig = mh.collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
    val sh = Dedup.simhash(spark, d, bits = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
  }

  test("lsh candidates + jaccard find the duplicate pair") {
    val d = docs(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"))
    val mh = Dedup.minhashSignatures(spark, Dedup.shingles(d), numHashes = 8)
    val cand = Dedup.lshCandidatePairs(mh, numHashes = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cand.toSeq == Seq((1L, 2L, 1.0)))
    val jac = Dedup.jaccardPairs(Dedup.shingles(d), maxDocFreq = 50, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(jac.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("maxBucketSize drops degenerate LSH buckets, keeps normal pairs") {
    import graft.dedup.Dedup
    // 6 identical boilerplate docs (one giant bucket) + 2 near-dup docs
    val docs = spark.createDataFrame(
      (0L until 6L).map(i => (i, "the same boilerplate text body here every time")) ++
        Seq(
          (10L, "unique alpha beta gamma delta epsilon zeta eta theta"),
          (11L, "unique alpha beta gamma delta epsilon zeta eta iota")))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs)
    val mh = Dedup.minhashSignatures(spark, sh, numHashes = 4)
    val uncapped = Dedup.lshCandidatePairs(mh, 4, 2)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((10L, 11L)))
    assert(uncapped.exists { case (a, b) => a < 6 && b < 6 }) // boilerplate pairs
    val capped = Dedup.lshCandidatePairs(mh, 4, 2, maxBucketSize = 4)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Caching.release()
    assert(capped.contains((10L, 11L))) // small buckets survive
    assert(!capped.exists { case (a, b) => a < 6 && b < 6 }) // giant bucket dropped
  }

  test("paragraphDedup drops cross-document boilerplate chunks, keeps order") {
    // chunkWords=2: doc 1 = [shared footer][alpha beta][gamma delta],
    // docs 2,3 carry the same "shared footer" chunk -> dropped everywhere.
    val d = docs(
      (1L, "shared footer alpha beta gamma delta"),
      (2L, "shared footer own content two here"),
      (3L, "unique body words shared footer"))
    // doc 3: chunks [unique body][words shared][footer] — its "shared footer"
    // is NOT chunk-aligned, so only docs 1 and 2 share the boilerplate chunk.
    val out = Dedup.paragraphDedup(d, chunkWords = 2, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("alpha beta gamma delta", 3L, 1L)))
    assert(out(2L) == (("own content two here", 3L, 1L)))
    assert(out(3L) == (("unique body words shared footer", 3L, 0L)))
  }

  test("paragraphDedup: a fully-boilerplate document survives with empty text") {
    val d = docs((1L, "same text"), (2L, "same text"), (3L, "same text"))
    val out = Dedup.paragraphDedup(d, chunkWords = 2, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map(
      1L -> (("", 1L, 1L)), 2L -> (("", 1L, 1L)), 3L -> (("", 1L, 1L))))
  }

  // ---- exact-substring span dedup (M27)

  private val spanDocs = docs(
    // docs 1 and 2 share "p q r s t u" (6 tokens → three 4-grams at
    // positions 2,3,4 in doc 1 / 0,1,2 in doc 2 → one merged span each);
    // doc 3 shares nothing 4 tokens long with any other doc.
    (1L, "a b p q r s t u c d"),
    (2L, "p q r s t u x y"),
    (3L, "a b c p q r z z z"))

  test("duplicatedSpans finds the maximal shared span, end-exclusive") {
    val spans = TextAnalysis.duplicatedSpans(spanDocs, n = 4, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((1L, 2L, 8L), (2L, 0L, 6L)))
  }

  test("spanDedupStats accounts removed vs surviving tokens") {
    val st = TextAnalysis.spanDedupStats(spanDocs, n = 4, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(st(1L) == ((10L, 1L, 6L, 4L)))
    assert(st(2L) == ((8L, 1L, 6L, 2L)))
    assert(st(3L) == ((9L, 0L, 0L, 9L)))
  }

  test("removeSpans cuts exactly the span tokens out of the text") {
    val spans = TextAnalysis.duplicatedSpans(spanDocs, n = 4, minDocs = 2)
    val clean = TextAnalysis.removeSpans(spanDocs, spans)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(clean(1L) == "a b c d")
    assert(clean(2L) == "x y")
    assert(clean(3L) == "a b c p q r z z z")
  }

  test("duplicatedSpans ignores repeats within a single document") {
    val d = docs(
      (1L, "m n o p m n o p"), // self-repeat only
      (2L, "q r s t"))
    assert(TextAnalysis.duplicatedSpans(d, n = 4, minDocs = 2).count() == 0)
  }

  // ---- overlapping chunking (M28)

  test("chunkDocuments windows with overlap; short docs yield one chunk") {
    val d = docs(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")), // 20 tokens
      (2L, "a b c")) // shorter than one window
    val out = TextAnalysis.chunkDocuments(d, chunkTokens = 16, overlap = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    assert(out((1L, 0L))._1 == (1 to 16).map(i => s"t$i").mkString(" "))
    assert(out((1L, 0L))._2 == 16L)
    // second window starts at token 13 (stride 12) and is partial
    assert(out((1L, 1L))._1 == (13 to 20).map(i => s"t$i").mkString(" "))
    assert(out((1L, 1L))._2 == 8L)
    assert(out((2L, 0L)) == (("a b c", 3L)))
    assert(out.size == 3)
  }

  test("chunkDocuments plans zero shuffles (narrow chain)") {
    val d = docs((1L, "a b c d e f"))
    val plan = TextAnalysis.chunkDocuments(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("leakageSafeSplit keeps near-dup clusters in one fold") {
    import org.apache.spark.sql.functions.col
    // 95 and 195 are exact near-dups; doc-slot folding would place 95 in
    // 'test' and 195 in 'train' (leak). Cluster folding pins both to the
    // cluster id 95 -> 'test'.
    val d = docs(
      (95L, "alpha beta gamma delta epsilon"),
      (195L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa"))
    import spark.implicits._
    val pairs = Seq((95L, 195L)).toDF("doc_a", "doc_b")
    val out = graft.ops.Sampling.leakageSafeSplit(d, pairs, 80, 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3)))).toMap
    assert(out(95L) == ((95L, "test")))
    assert(out(195L) == ((95L, "test"))) // inherits the cluster fold
    assert(out(3L) == ((3L, "train")))   // singleton: own id slot
  }

  test("tokenBudget: largest-remainder apportionment sums exactly to the budget") {
    val d = docs(
      (0L, "a b c"), (1L, "d e"), (2L, "f"),
      (3L, "g h i j"), (4L, "k l"))
      .withColumn("lang", org.apache.spark.sql.functions.expr(
        "CASE WHEN doc_id < 2 THEN 'en' WHEN doc_id < 4 THEN 'de' ELSE 'fr' END"))
    val out = graft.ops.Sampling.tokenBudget(d, "lang",
      Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25), budget = 101L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // 101*.5=50.5 -> 50+frac .5; 101*.25=25.25 -> 25+frac .25 each;
    // leftover 101-100=1 -> goes to en (largest remainder)
    assert(out == Map("en" -> 51L, "de" -> 25L, "fr" -> 25L))
    assert(out.values.sum == 101L)
  }

  test("cdcChunks: content-defined boundaries re-synchronize after an inserted prefix") {
    import graft.text.TextAnalysis
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val shifted = "inserted prefix goes here " + base
    val d = docs((1L, base), (2L, shifted))
    val chunks = TextAnalysis.cdcChunks(d, boundaryMod = 8).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getString(2)).toSeq }
    // reconstruction: chunks re-join to the original text, in order
    assert(chunks(1L).mkString(" ") == base)
    assert(chunks(2L).mkString(" ") == shifted)
    // shift-robustness: once past the first boundary after the insert,
    // every later chunk is identical across the two versions (fixed
    // windows share NO chunk after a 4-word shift)
    val common = chunks(1L).toSet intersect chunks(2L).toSet
    assert(chunks(1L).drop(1).forall(common.contains),
      s"expected all post-sync chunks shared, got common=$common")
    // dedup companion sees those shared chunks across the two docs
    val dups = TextAnalysis.cdcChunkDups(d, boundaryMod = 8, minDocs = 2)
      .collect().map(_.getString(0)).toSet
    assert(dups == common)
    // boundary rule is the content hash, so chunk sizes hover near the
    // modulus: sanity that we produced several chunks, not one blob
    assert(chunks(1L).size >= 3)
  }

  test("splitOverlapMatrix: exact shared-shingle counts and ratios between splits") {
    // train: "a b c d e" -> shingles {abc, bcd, cde}; val shares exactly
    // {bcd, cde} (planted contamination); test shares nothing
    val d = docs(
      (1L, "a b c d e"),          // train
      (2L, "b c d e zz"),         // val: shingles {bcd, cde, "d e zz"}
      (3L, "q r s t u"))          // test
      .withColumn("split", org.apache.spark.sql.functions.expr(
        "CASE doc_id WHEN 1 THEN 'train' WHEN 2 THEN 'val' ELSE 'test' END"))
    val out = graft.dedup.Dedup.splitOverlapMatrix(d, "split")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    graft.Caching.release()
    // EVERY split pair gets a row — zero-overlap pairs report 0
    // explicitly (absent rows would be indistinguishable from typos)
    assert(out.keySet == Set(
      ("train", "val"), ("test", "train"), ("test", "val")))
    val (shared, nA, nB, cont, jac) = out(("train", "val"))
    assert(shared == 2L && nA == 3L && nB == 3L)
    assert(cont == 2.0 / 3.0)
    assert(jac == 2.0 / 4.0)
    assert(out(("test", "train")) == ((0L, 3L, 3L, 0.0, 0.0)))
    assert(out(("test", "val")) == ((0L, 3L, 3L, 0.0, 0.0)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged exactly") {
    val oldSnap = docs((1L, "same text"), (2L, "will change"), (3L, "will vanish"))
    val newSnap = docs((1L, "same text"), (2L, "has changed"), (4L, "brand new"))
    val out = graft.ops.CorpusStats.snapshotDiff(oldSnap, newSnap)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("unchanged", 9L, 9L)))
    assert(out(2L) == (("changed", 11L, 11L)))
    assert(out(3L) == (("removed", 11L, -1L)))
    assert(out(4L) == (("added", -1L, 9L)))
    assert(out.size == 4)
  }

  test("temperatureShares: alpha=1/2 boosts the tail, sums stay exact") {
    // en has 16x the tokens of fr: natural shares 16/17 vs 1/17, but
    // sqrt-scaling gives 4/5 vs 1/5 — the tail grows 3.4x while the
    // head still dominates
    val d = docs(
      (0L, ("w " * 1600).trim), (1L, ("w " * 100).trim))
      .withColumn("lang", org.apache.spark.sql.functions.expr(
        "CASE WHEN doc_id = 0 THEN 'en' ELSE 'fr' END"))
    val out = graft.ops.Sampling.temperatureShares(d, "lang", budget = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // sqrt(1600)=40, sqrt(100)=10 -> z = 40e6 / 10e6, shares 800000/200000
    assert(out("en") == ((1600L, 800000L, 800L)))
    assert(out("fr") == ((100L, 200000L, 200L)))
    assert(out.values.map(_._2).sum == 1000000L) // Σ share_micro exact
    assert(out.values.map(_._3).sum == 1000L)    // Σ budget exact
  }

  test("tokenBudget fails loudly when a weighted domain has no documents") {
    // an absent domain's base allocation would silently vanish in the
    // inner join (breaking sum == budget); the operator must refuse
    val d = docs((0L, "a b c"), (1L, "d e"))
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Sampling.tokenBudget(d, "lang",
        Map("en" -> 0.5, "zz" -> 0.5), budget = 100L).collect()
    }
    assert(ex.getMessage.contains("no documents"))
    graft.Caching.release()
  }

  test("temperatureShares fails loudly on an empty corpus") {
    // s_tot = 0 would make every `div s_tot` a silent null/div-0 row;
    // the operator must refuse like tokenBudget does
    val d = docs((0L, "a b c")).where(lit(false))
      .withColumn("lang", lit("en"))
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Sampling.temperatureShares(d, "lang", budget = 100L).collect()
    }
    assert(ex.getMessage.contains("no language with tokens"))
    graft.Caching.release()
  }

  test("temperatureShares fails loudly when every language has zero tokens") {
    // empty-string docs: split yields one empty token per doc -> each
    // lang has avail_tokens = #docs... so use truly-zero token counts
    // via a null text (size(split(null)) = -1? no: null -> null, sum
    // skips nulls -> avail_tokens null). Exercise the s_tot <= 0 branch.
    val d = spark.createDataFrame(Seq((0L, null.asInstanceOf[String], "en")))
      .toDF("doc_id", "text", "lang")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Sampling.temperatureShares(d, "lang", budget = 100L).collect()
    }
    assert(ex.getMessage.contains("no language with tokens"))
    graft.Caching.release()
  }

  test("snapshotDiff: NULL text means present-with-null, not absent") {
    // presence comes from the side markers, not text nullability: a doc
    // whose text is NULL in the old snapshot and non-null in the new is
    // CHANGED (was 'added' under the pre-r14 nullability inference);
    // NULL-vs-NULL is UNCHANGED via <=>
    val oldSnap = spark.createDataFrame(Seq(
      (1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Option("kept")))).toDF("doc_id", "text")
    val newSnap = spark.createDataFrame(Seq(
      (1L, Option("now has text")), (2L, Option.empty[String]),
      (4L, Option.empty[String]))).toDF("doc_id", "text")
    val out = graft.ops.CorpusStats.snapshotDiff(oldSnap, newSnap)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("changed", -1L, 12L))) // null old text -> len -1
    assert(out(2L) == (("unchanged", -1L, -1L))) // null <=> null
    assert(out(3L) == (("removed", 4L, -1L)))
    assert(out(4L) == (("added", -1L, -1L))) // added with null text
    assert(out.size == 4)
  }

  test("secretScrub redacts key-shaped tokens, keeps natural text") {
    val d = docs(
      // a base64-ish API key: 3 classes, 25 chars, high diversity
      (1L, "token sk4fQ9zR2mWx7Kp0aBc3eD ok"),
      // long but single-class (no digits/uppercase) -> kept
      (2L, "supercalifragilisticexpialidocious stays"),
      // long, 3 classes, but low diversity (repeats) -> kept
      (3L, "AAAAAAAAAAAAAAAAAAAAa1 kept"),
      // contains a char outside the key alphabet -> kept
      (4L, "aB3!aB3!aB3!aB3!aB3!aB3! kept"),
      (5L, "short aB3+ words only"))
    val out = graft.text.TextAnalysis.secretScrub(d)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("token <SECRET> ok", 1L)))
    assert(out(2L) == (("supercalifragilisticexpialidocious stays", 0L)))
    assert(out(3L) == (("AAAAAAAAAAAAAAAAAAAAa1 kept", 0L)))
    assert(out(4L) == (("aB3!aB3!aB3!aB3!aB3!aB3! kept", 0L)))
    assert(out(5L) == (("short aB3+ words only", 0L)))
  }

  test("secretScrub redacts pure-hex credentials (detect-secrets hex gap)") {
    val d = docs(
      // 40-char hex API key: 2 char classes only, 16 distinct -> hex branch
      (1L, "key abcdef0123456789abcdef0123456789ffee00 leaked"),
      // 64-char SHA-style token -> hex branch
      (2L, "sha fedcba9876543210fedcba9876543210fedcba9876543210fedcba987654 here"),
      // 32-char hex but only 5 distinct chars (deadbeef x4) -> kept
      (3L, "decoy deadbeefdeadbeefdeadbeefdeadbeef kept"),
      // 29-char hex, high diversity, below hexMinLen=32 -> kept
      (4L, "short abcdef0123456789abcdef0123456 kept"),
      // 'g' breaks pure-hex; base branch fails on 2 char classes -> kept
      (5L, "word abcdef0123456789abcdef012345678g kept"))
    val out = graft.text.TextAnalysis.secretScrub(d)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("key <SECRET> leaked", 1L)))
    assert(out(2L) == (("sha <SECRET> here", 1L)))
    assert(out(3L) == (("decoy deadbeefdeadbeefdeadbeefdeadbeef kept", 0L)))
    assert(out(4L) == (("short abcdef0123456789abcdef0123456 kept", 0L)))
    assert(out(5L) == (("word abcdef0123456789abcdef012345678g kept", 0L)))
  }

  test("secretScrub distinct-char count excludes split's empty strings (boundary)") {
    // exactly 11 distinct chars (a A 1 b B 2 c C 3 d D), 24 chars, 3
    // classes: below minDistinct=12 -> KEPT. The pre-fix code counted
    // split's trailing "" as a 12th "character" and redacted it,
    // diverging from the DuckDB oracle.
    val d = docs(
      (1L, "edge aA1bB2cC3dDaA1bB2cC3dDa kept"),
      // same token with a 12th distinct char (e) -> redacted
      (2L, "edge aA1bB2cC3dDeA1bB2cC3dDe gone"))
    val out = graft.text.TextAnalysis.secretScrub(d)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("edge aA1bB2cC3dDaA1bB2cC3dDa kept", 0L)))
    assert(out(2L) == (("edge <SECRET> gone", 1L)))
  }

  test("editDistanceNearDups finds close prefixes, skips distant ones") {
    // 10-11: one substitution; 12: identical to 10; 13: unrelated
    val d = docs(
      (10L, "the quick brown fox jumps over"),
      (11L, "the quick brawn fox jumps over"),
      (12L, "the quick brown fox jumps far away"),
      (13L, "completely different text here"))
    val out = Dedup.editDistanceNearDups(d, prefixChars = 24, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(4)).toMap
    assert(out((10L, 11L)) == 1) // brown -> brawn inside the prefix
    assert(out((10L, 12L)) == 0) // same 24-char prefix
    assert(out((11L, 12L)) == 1)
    assert(out.keySet == Set((10L, 11L), (10L, 12L), (11L, 12L)))
  }

  test("editDistanceNearDups: prefix filter keeps pairs within k (no false negatives)") {
    // brute-force check on a small corpus with planted 1- and 2-edit pairs
    val texts = Seq(
      "abcdefghijklmnopqrstuvwx", "Xbcdefghijklmnopqrstuvwx",
      "abcdefghijklmnopqrstuvZZ", "abcdefghijklmnopqrsAAvwx",
      "zzzzzzzzzzzzzzzzzzzzzzzz")
    val d = docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
    val found = Dedup.editDistanceNearDups(d, prefixChars = 24, k = 2,
        driverKeyLimit = 0L) // force the gram pipeline under test
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i + j)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val expected = (for {
      i <- texts.indices; j <- texts.indices if i < j
      if lev(texts(i).take(24), texts(j).take(24)) <= 2
    } yield (i.toLong, j.toLong)).toSet
    assert(found == expected)
  }

  test("editDistanceNearDups: driver brute-force path equals the gram pipeline") {
    val texts = Seq(
      "abcdefghijklmnopqrstuvwx", "Xbcdefghijklmnopqrstuvwx",
      "abcdefghijklmnopqrstuvZZ", "abcdefghijklmnopqrsAAvwx",
      "abcdefghijklmnopqrstuvwx", // exact dup of 0 -> same-key pair
      "zzzzzzzzzzzzzzzzzzzzzzzz")
    val d = docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
    def run(limit: Long) =
      Dedup.editDistanceNearDups(d, prefixChars = 24, k = 2,
          driverKeyLimit = limit)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
            r.getInt(4))).toSet
    val drv = run(20000L)
    graft.Caching.release()
    val dist = run(0L)
    graft.Caching.release()
    assert(drv == dist)
    assert(drv.exists(_._5 == 0)) // the exact-dup same-key pair is present
    // limit BOUNDARY: the corpus has 5 distinct keys (doc 4 duplicates
    // doc 0's). limit == nKeys takes the driver path, limit == nKeys-1
    // the distributed one — both must agree with the pair above
    assert(run(5L) == drv); graft.Caching.release()
    assert(run(4L) == drv); graft.Caching.release()
  }

  test("editDistanceNearDups: gram-df cap is lossless on a vocabulary-starved corpus") {
    // Adversarial shape: a low-alphabet clique whose every gram is
    // common (floods any gram bucket → routed through the residual
    // brute-force path under a small cap) PLUS rich-vocab keys that
    // stay on the capped equi-join path — so BOTH paths carry pairs
    // and the union+distinct seam is exercised. Oracle: local brute
    // force; pin: capped ≡ uncapped ≡ brute force.
    val starved = (0 until 20).map { i =>
      val c = ('a' + (i % 3)).toChar // 3-letter alphabet, 24 chars
      s"ababab$c babab${c}ababab ab"
    }
    val rich = Seq(
      "qwertyuiopasdfghjklzxcvb", "qwertyuiopasdfghjklzxcvZ",
      "mnbvcxzlkjhgfdsapoiuytre", "completely other rich key")
    val texts = starved ++ rich
    val d = docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
    def pairs(cap: Int): Set[(Long, Long, Int)] =
      Dedup.editDistanceNearDups(d, prefixChars = 24, k = 2, q = 5,
          maxGramDf = cap, driverKeyLimit = 0L) // the cap lives on the gram path
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i + j)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val expected = (for {
      i <- texts.indices; j <- texts.indices if i < j
      dist = lev(texts(i).take(24), texts(j).take(24)) if dist <= 2
    } yield (i.toLong, j.toLong, dist)).toSet
    val capped = pairs(4)
    val uncapped = pairs(Int.MaxValue)
    assert(capped == expected, "capped path diverges from brute force")
    assert(uncapped == expected, "uncapped path diverges from brute force")
    graft.Caching.release()
  }

  test("containmentPairs finds a doc quoted inside a longer one (low-resemblance case)") {
    val quote = "alpha beta gamma delta epsilon zeta eta theta"
    val host = "intro words here then " + quote +
      " and a very long tail of unrelated content keeps resemblance low " +
      "padding padding2 padding3 padding4 padding5 padding6 padding7"
    val d = docs(
      (1L, quote),                      // fully contained in 2
      (2L, host),
      (3L, "completely different words with nothing shared at all okay"))
    val out = graft.dedup.Dedup.containmentPairs(d, minContainment = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(out.contains((1L, 2L)))
    assert(out((1L, 2L)) >= 0.8)
    assert(!out.contains((3L, 2L)) && !out.contains((2L, 3L)))
    // resemblance (Jaccard over shingles) for the same pair is LOW --
    // the case this operator exists for
    val jac = Dedup.jaccardPairs(Dedup.shingles(d), threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    jac.get((1L, 2L)).foreach(j => assert(j < 0.5))
  }

  test("containmentPairs drops ubiquitous fingerprints at maxDocFreq") {
    // the same boilerplate everywhere: with the cap at 2 its
    // fingerprints appear in 3 docs and are dropped, leaving no pairs
    val b = "common boilerplate words shared by every single document here"
    val d = docs((1L, b), (2L, b), (3L, b))
    assert(graft.dedup.Dedup.containmentPairs(d, maxDocFreq = 2L).count() == 0)
    // with the cap relaxed they all mutually contain
    assert(graft.dedup.Dedup.containmentPairs(d, maxDocFreq = 10L).count() == 6)
  }
}
