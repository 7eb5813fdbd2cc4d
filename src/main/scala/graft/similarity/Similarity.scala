package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, sign-random-projection
  * LSH bucketing and an IVF-style centroid assignment as the scale paths.
  *
  * Numeric design: embeddings are quantized to integer-valued doubles
  * (round(x·1000)) FIRST, so every dot product is a sum of exact integers
  * (< 2^53) — order-independent, hence identical across engines and
  * across Spark's nondeterministic aggregation orders. Only the final
  * cosine division/sqrt touches real floating point, on identical
  * operands. All kernels are builtin higher-order functions
  * (zip_with/aggregate) — no UDFs.
  */
object Similarity {

  /** Quantize an Array[Float] column to integer-valued doubles. */
  def quantize(emb: Column, scale: Int = 1000): Column =
    transform(emb, x => round(x.cast("double") * scale, 0))

  /** Exact dot product of two quantized vectors — native codegen'd
    * kernel ([[graft.functions.DotProductExpr]]); index-order summation
    * identical to the previous higher-order fold, so results (and gate
    * hashes) are unchanged while the per-pair cost drops out of
    * interpreted lambda land. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProductExpr.col(a, b)

  /** Brute-force cosine top-k: queries (vec_id < nQueries) are broadcast
    * against all candidates; rank with a deterministic
    * (cos desc, neighbor_id) tie-break AFTER rounding to 6 dp, so ranking
    * is reproducible across engines. O(nQueries·N) — the exact baseline;
    * use [[signBuckets]] or [[ivfAssign]] to restrict candidates at scale. */
  def cosineTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame =
    cosineTopKWhere(embeddings, col("vec_id") < nQueries, k)

  /** [[cosineTopK]] for an explicit query-id set: the query side is
    * `embeddings` filtered to `queryIds`, so cost is |queryIds|·N no
    * matter how large the ids are (a sparse set like {999999} must NOT
    * pay for the whole prefix below its maximum). */
  def cosineTopKIds(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    require(queryIds.nonEmpty, "cosineTopKIds needs at least one query id")
    cosineTopKWhere(embeddings, col("vec_id").isInCollection(queryIds), k)
  }

  private def cosineTopKWhere(
      embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = embeddings
      .where(queryPred)
      .select(col("vec_id").as("query_id"), quantize(col("embedding")).as("qv"))
      .withColumn("qn", dot(col("qv"), col("qv")))
    val c = embeddings
      .select(col("vec_id").as("neighbor_id"), quantize(col("embedding")).as("cv"))
      .withColumn("cn", dot(col("cv"), col("cv")))
    val scored = c
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim",
        round(dot(col("qv"), col("cv")) / (sqrt(col("qn")) * sqrt(col("cn"))), 6))
    val win = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(win))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos_sim")
  }

  /** Sign-random-projection LSH: `bits` pseudo-random ±1 hyperplanes
    * (s_ij from a fixed arithmetic pattern — portable, no RNG state);
    * bucket = bitmask of projection signs. Vectors in the same bucket are
    * near-duplicate candidates. Two bounded shuffles. */
  def signBuckets(spark: SparkSession, embeddings: DataFrame, bits: Int = 6): DataFrame = {
    val bitsDf = spark.createDataFrame(
      Seq.tabulate(bits)(j => (j, 1L << j))).toDF("j", "p2")
    val expl = embeddings
      .select(col("vec_id"), posexplode(quantize(col("embedding"))))
      .withColumnRenamed("pos", "i")
      .withColumnRenamed("col", "x")
    expl
      .crossJoin(broadcast(bitsDf))
      .withColumn("s",
        when(((col("i") * 131 + col("j") * 137) % 97) % 2 === 0, 1).otherwise(-1))
      .groupBy("vec_id", "j", "p2")
      .agg(sum(col("s") * col("x")).as("proj"))
      .groupBy("vec_id")
      .agg(sum(when(col("proj") > 0, col("p2")).otherwise(0L)).as("bucket"))
  }

  /** LSH-bucketed near-duplicate pairs: exact cosine, but only within a
    * bucket — the candidate join is keyed by bucket id, so fan-out is
    * bucket occupancy, not N². Approximate by construction (a true pair
    * split across buckets is missed — raise bits/bands for recall). */
  def nearDupPairs(
      spark: SparkSession,
      embeddings: DataFrame,
      threshold: Double,
      bits: Int = 6): DataFrame = {
    // persisted: both sides of the bucket self-join read this subtree
    // (registered with graft.Caching — harness unpersists after use)
    val withB = graft.Caching.cache(embeddings
      .join(signBuckets(spark, embeddings, bits), "vec_id")
      .select(col("vec_id"), col("bucket"), quantize(col("embedding")).as("v"))
      .withColumn("n", dot(col("v"), col("v"))))
    withB.as("a")
      .join(withB.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos_sim",
        round(dot(col("a.v"), col("b.v")) /
          (sqrt(col("a.n")) * sqrt(col("b.n"))), 6))
      .where(col("cos_sim") >= threshold)
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos_sim"))
  }

  /** BANDED sign-random-projection LSH — the 100 TB form of
    * [[signBuckets]]: `bands × rowBits` hyperplanes, one bucket key per
    * band from that band's `rowBits` projection signs. A fixed-width
    * single code (the plain `signBuckets(bits)`) has 2^bits buckets
    * TOTAL, so occupancy (and the bucket self-join) grows linearly with
    * corpus size; banding keeps per-band keys small enough to match
    * (recall ≈ 1-(1-s^rowBits)^bands for sign-agreement rate s) while
    * the `maxBucketSize` cap bounds any degenerate bucket — the same
    * guard as [[graft.dedup.Dedup.lshCandidatePairs]]. Output:
    * `(vec_id, band, bucket)` — one row per band.
    *
    * Dimensionality note (measured in ScaleBench B26): the ±1
    * hyperplane normals are mutually correlated at low dims (typical
    * overlap ~1/√d — ~0.18 at d = 32), which CONCENTRATES bucket
    * occupancy well below the 2^rowBits ideal; at d = 32 the densest
    * natural bucket holds ~6% of a uniform corpus. Real embedding dims
    * (≥ 128) spread far better (overlap ≤ 0.09). At low dims pair
    * `maxBucketSize` with verification, and size caps from measured
    * occupancy, not from 2^rowBits. */
  def signBucketsBanded(
      spark: SparkSession,
      embeddings: DataFrame,
      bands: Int = 4,
      rowBits: Int = 4): DataFrame = {
    val bits = bands * rowBits
    val bitsDf = spark.createDataFrame(
      Seq.tabulate(bits)(j => (j, j / rowBits, 1L << (j % rowBits))))
      .toDF("j", "band", "p2")
    val expl = embeddings
      .select(col("vec_id"), posexplode(quantize(col("embedding"))))
      .withColumnRenamed("pos", "i")
      .withColumnRenamed("col", "x")
    expl
      .crossJoin(broadcast(bitsDf))
      .withColumn("s",
        when(((col("i") * 131 + col("j") * 137) % 97) % 2 === 0, 1).otherwise(-1))
      .groupBy("vec_id", "band", "j", "p2")
      .agg(sum(col("s") * col("x")).as("proj"))
      .groupBy("vec_id", "band")
      .agg(sum(when(col("proj") > 0, col("p2")).otherwise(0L)).as("bucket"))
  }

  /** Banded near-duplicate pairs: candidates share ≥1 (band, bucket),
    * oversize buckets dropped BEFORE the self-join (`maxBucketSize`,
    * 0 = no cap), pair set deduplicated across bands, then exact-cosine
    * verified — candidate generation is O(Σ bucket²) with every bucket
    * ≤ cap, never O(N²/2^bits). */
  def nearDupPairsBanded(
      spark: SparkSession,
      embeddings: DataFrame,
      threshold: Double,
      bands: Int = 4,
      rowBits: Int = 4,
      maxBucketSize: Int = 0): DataFrame = {
    val keys0 = signBucketsBanded(spark, embeddings, bands, rowBits)
    val capped =
      if (maxBucketSize <= 0) keys0
      else {
        val w = Window.partitionBy("band", "bucket")
        keys0.withColumn("_bsz", count(lit(1)).over(w))
          .where(col("_bsz") <= maxBucketSize)
          .drop("_bsz")
      }
    val keys = graft.Caching.cache(capped)
    val pairs = keys.as("a")
      .join(keys.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val vecs = graft.Caching.cache(embeddings
      .select(col("vec_id"), quantize(col("embedding")).as("v"))
      .withColumn("n", dot(col("v"), col("v"))))
    pairs
      .join(vecs.select(col("vec_id").as("vec_a"), col("v").as("va"), col("n").as("na")), "vec_a")
      .join(vecs.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("n").as("nb")), "vec_b")
      .withColumn("cos_sim",
        round(dot(col("va"), col("vb")) / (sqrt(col("na")) * sqrt(col("nb"))), 6))
      .where(col("cos_sim") >= threshold)
      .select("vec_a", "vec_b", "cos_sim")
  }

  /** IVF SEARCH — the query path over [[ivfAssign]]: each query vector
    * (vec_id < nQueries) is assigned to its centroid, then ranked
    * against ONLY the vectors of that cluster (candidate set =
    * N/centroids on average instead of N — the inverted-file restriction
    * that makes the k-NN scan sublinear at scale). Exact cosine inside
    * the cluster, deterministic (cos desc, neighbor_id) tie-break.
    * Approximate by construction: a true neighbor in another cluster is
    * missed — probe more clusters / raise centroidMod for recall. */
  def ivfSearch(
      embeddings: DataFrame,
      nQueries: Int,
      k: Int,
      centroidMod: Int = 97): DataFrame = {
    val assign = graft.Caching.cache(ivfAssign(embeddings, centroidMod)
      .select(col("vec_id"), col("centroid_id")))
    val vecs = graft.Caching.cache(embeddings
      .select(col("vec_id"), quantize(col("embedding")).as("v"))
      .withColumn("n", dot(col("v"), col("v"))))
    val queries = vecs.where(col("vec_id") < nQueries)
      .join(assign, "vec_id")
      .select(col("vec_id").as("query_id"), col("centroid_id"),
        col("v").as("qv"), col("n").as("qn"))
    val candidates = vecs.join(assign, "vec_id")
      .select(col("vec_id").as("neighbor_id"), col("centroid_id"),
        col("v").as("cv"), col("n").as("cn"))
    val win = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    candidates
      .join(broadcast(queries), Seq("centroid_id"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim",
        round(dot(col("qv"), col("cv")) / (sqrt(col("qn")) * sqrt(col("cn"))), 6))
      .withColumn("rank", row_number().over(win))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos_sim")
  }

  /** IVF-style coarse quantizer: a deterministic centroid subset
    * (vec_id ≡ 0 mod centroidMod), every vector assigned to its
    * max-cosine centroid with a (cos desc, centroid_id) tie-break.
    * The centroid table broadcasts; at query time only the query's
    * cluster is searched.
    *
    * Argmax shape: `max(struct(cos_sim, -centroid_id))` per vec_id — a
    * map-side-combinable aggregate, so the N×nlists scored rows
    * collapse to N rows BEFORE the shuffle. (The row_number window
    * this replaced shuffled all N×nlists rows to rank them: at B40's
    * 1M×101 that is a 101M-row exchange for a 1M-row answer. Same
    * result bit-for-bit — lexicographic struct max on the rounded
    * cos_sim with the negated id IS "cos desc, centroid_id asc".) */
  def ivfAssign(embeddings: DataFrame, centroidMod: Int = 97): DataFrame = {
    val cents = embeddings
      .where(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("centroid_id"), quantize(col("embedding")).as("cv"))
      .withColumn("cn", dot(col("cv"), col("cv")))
    val vecs = embeddings
      .select(col("vec_id"), quantize(col("embedding")).as("v"))
      .withColumn("n", dot(col("v"), col("v")))
    vecs
      .crossJoin(broadcast(cents))
      .withColumn("cos_sim",
        round(dot(col("v"), col("cv")) / (sqrt(col("n")) * sqrt(col("cn"))), 6))
      .groupBy("vec_id")
      .agg(max(struct(col("cos_sim"),
        (-col("centroid_id")).as("neg_cid"))).as("w"))
      .select(col("vec_id"), (-col("w.neg_cid")).as("centroid_id"),
        col("w.cos_sim").as("cos_sim"))
  }

  /** Random-projection dimensionality reduction (Johnson–Lindenstrauss
    * with a ±1 Achlioptas-style matrix): project each quantized vector
    * onto `outDims` deterministic sign patterns — the same arithmetic
    * sign matrix as [[signBuckets]], but emitting the projection VALUES
    * (exact integer sums, engine-portable) instead of their sign bits.
    * The standard 4×-compression preprocessing before clustering or
    * coarse ANN when int8 per-dimension is still too wide. One bounded
    * shuffle ((vec, out-dim) aggregate). */
  def randomProject(
      spark: SparkSession,
      embeddings: DataFrame,
      outDims: Int = 8): DataFrame = {
    val dimsDf = spark.createDataFrame(
      Seq.tabulate(outDims)(j => Tuple1(j))).toDF("j")
    embeddings
      .select(col("vec_id"), posexplode(quantize(col("embedding"))))
      .withColumnRenamed("pos", "i")
      .withColumnRenamed("col", "x")
      .crossJoin(broadcast(dimsDf))
      .withColumn("s",
        when(((col("i") * 131 + col("j") * 137) % 97) % 2 === 0, 1).otherwise(-1))
      .groupBy("vec_id", "j")
      .agg(sum(col("s") * col("x")).as("value"))
  }

  /** Int8 scalar quantization of the embedding column — the standard
    * 4× storage/bandwidth compression before ANN indexing: per-vector
    * scale `maxabs/127`, codes `q_i = round(127·x_i/maxabs)` ∈ [−127,127].
    * The reported squared reconstruction error is computed in SCALED
    * INTEGER space — `Σ (127·x_i − q_i·maxabs)²` over the
    * integer-quantized inputs — so the sum is exact (< 2^53) and
    * order-independent; only the final relative-error division touches
    * floating point. Zero shuffles: one narrow pass, all per-row array
    * kernels. */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val v = quantize(col("embedding"))
    embeddings
      .select(col("vec_id"), v.as("v"))
      .withColumn("maxabs", array_max(transform(col("v"), x => abs(x))))
      // all-zero vectors quantize to all-zero codes with scale 1
      .withColumn("maxabs", when(col("maxabs") === 0, 1.0).otherwise(col("maxabs")))
      .withColumn("q", transform(col("v"), x => round(x * 127 / col("maxabs"), 0)))
      .withColumn("err_num",
        aggregate(
          zip_with(col("v"), col("q"),
            (x, q) => (x * 127 - q * col("maxabs")) * (x * 127 - q * col("maxabs"))),
          lit(0.0), (acc, e) => acc + e))
      .withColumn("norm2", dot(col("v"), col("v")))
      .select(
        col("vec_id"),
        col("maxabs").cast("long").as("max_abs"),
        col("err_num").cast("long").as("sq_err_scaled"),
        when(col("norm2") === 0, 0.0)
          .otherwise(round(col("err_num") / (col("norm2") * 16129), 9))
          .as("rel_err"))
  }

  /** Semantic deduplication (the SemDeDup recipe — Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embeddings with the coarse quantizer,
    * compute pairwise cosine similarity ONLY within each cluster, and
    * drop every member that is ≥ `threshold`-similar to a lower-id
    * member of its cluster (deterministic keep-min-id rule; the paper's
    * keep-farthest-from-centroid variant differs only in which member of
    * a duplicate set survives). Output: one row per vector with its
    * cluster and a `keep` flag.
    *
    * Scale shape: `centroidMod` makes the centroid count a FIXED
    * FRACTION of the corpus (k = N/centroidMod), so expected cluster
    * occupancy is ~centroidMod regardless of N — the within-cluster
    * self-join stays O(N·centroidMod), linear in corpus size, never
    * O(N²). This is the property that makes SemDeDup the standard
    * embedding-dedup pass at 100 TB where exact all-pairs cosine is
    * impossible. */
  def semanticDedup(
      embeddings: DataFrame,
      threshold: Double,
      centroidMod: Int = 97): DataFrame = {
    val assigned = graft.Caching.cache(
      ivfAssign(embeddings, centroidMod)
        .select(col("vec_id"), col("centroid_id"))
        .join(embeddings.select(col("vec_id"), quantize(col("embedding")).as("v")), "vec_id")
        .withColumn("n", dot(col("v"), col("v"))))
    val dropped = assigned.as("a")
      .join(assigned.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .where(round(dot(col("a.v"), col("b.v")) /
        (sqrt(col("a.n")) * sqrt(col("b.n"))), 6) >= threshold)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
      .withColumn("_dup", lit(1))
    assigned
      .join(dropped, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        col("centroid_id"),
        when(col("_dup").isNull, 1).otherwise(0).as("keep"))
  }

  /** One Lloyd iteration of k-means over the quantized embeddings:
    * members assigned by [[ivfAssign]], then the new centroid is the
    * per-dimension mean of its members. Sums are over integer-valued
    * doubles — exact, order-independent — and the single mean division
    * is rounded for engine portability. Shuffle shape: the assignment's
    * broadcast-centroid pass plus ONE (centroid, dim) aggregate whose
    * key count is `k × dims` — metadata-scale output regardless of
    * corpus size, the canonical distributed-k-means step. */
  /** Exact integer Gram/covariance accumulation over the embedding
    * corpus — the distributed half of PCA whitening (the preprocessing
    * OPQ/IVF-PCA ANN indexes and embedding-drift monitors run before
    * anything eigen-related; the d×d eigensolve itself is driver-side
    * milliseconds and out of scope). Embeddings are quantized to
    * integer milli-units, so `dot = Σ vᵢ·vⱼ`, `s_i = Σ vᵢ` are EXACT
    * BIGINT sums — order-independent across 1000 executors and
    * engine-portable. `cov_num = n·dot − s_i·s_j` is the centered
    * covariance numerator (over n²); exact while `n·|dot| < 2⁶³` —
    * beyond that consume the raw sums and divide in floating point.
    *
    * Scale shape: each row explodes to its d(d+1)/2 upper-triangle
    * products in one narrow codegen'd pass; the ONLY shuffle is the
    * (i,j)-keyed aggregate with full map-side combine — bytes on the
    * wire are O(partitions · d²), never O(corpus · d²). */
  def gramMatrix(embeddings: DataFrame, scale: Int = 1000): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // Per-partition accumulation in a flat long[] (tight JVM loops — the
    // declarative nested-transform formulation is CodegenFallback and
    // ~5× slower), then ONE (i,j)-keyed merge of the d(d+1)/2-row
    // partials: shuffle rows = partitions · d², independent of corpus.
    val partials = embeddings.select(col("embedding")).as[Seq[Double]]
      .mapPartitions { it =>
        var d = -1
        var n = 0L
        var dot: Array[Long] = null // upper triangle, row-major
        var s: Array[Long] = null
        it.foreach { e =>
          if (d < 0) { d = e.size; dot = new Array((d * (d + 1)) / 2); s = new Array(d) }
          require(e.size == d, s"ragged embedding: ${e.size} != $d")
          val v = new Array[Long](d)
          var i = 0
          while (i < d) { v(i) = math.round(e(i) * scale); s(i) += v(i); i += 1 }
          n += 1
          var k = 0
          i = 0
          while (i < d) {
            var j = i
            while (j < d) { dot(k) += v(i) * v(j); k += 1; j += 1 }
            i += 1
          }
        }
        if (d < 0) Iterator.empty
        else {
          var k = -1
          (for { i <- 0 until d; j <- i until d } yield {
            k += 1
            (i + 1L, j + 1L, n, dot(k), s(i), s(j))
          }).iterator
        }
      }
      .toDF("i", "j", "n", "dot", "s_i", "s_j")
    partials.groupBy("i", "j")
      .agg(sum("n").as("n"), sum("dot").as("dot"),
        sum("s_i").as("s_i"), sum("s_j").as("s_j"))
      .withColumn("cov_num",
        col("n") * col("dot") - col("s_i") * col("s_j"))
  }

  def kmeansStep(embeddings: DataFrame, centroidMod: Int = 97): DataFrame = {
    val assign = ivfAssign(embeddings, centroidMod).select("vec_id", "centroid_id")
    embeddings
      .select(col("vec_id"), posexplode(quantize(col("embedding"))).as(Seq("dim", "x")))
      .join(assign, "vec_id")
      .groupBy("centroid_id", "dim")
      .agg(
        count(lit(1)).as("n_members"),
        round(sum("x") / count(lit(1)), 6).as("mean_x"))
  }

  // --- Product quantization (M70) ---------------------------------------
  //
  // PQ (Jégou/Douze/Schmid, TPAMI 2011 "Product Quantization for Nearest
  // Neighbor Search") splits each d-dim vector into m subvectors and
  // replaces every subvector with the id of its nearest codebook entry:
  // the corpus shrinks from d floats to m small codes per vector (d=64,
  // m=8 → 32× fewer bytes), and a query scans CODES via an m-entry
  // lookup-table sum instead of touching raw vectors — the FAISS
  // IVFPQ/ADC shape that makes billion-vector search fit in RAM. At
  // 100 TB the codes table (and the metadata-sized codebook) is what
  // ships to the search tier; the raw embeddings stay cold.
  //
  // Determinism: codebooks are the deterministic centroid subset
  // (vec_id ≡ 0 mod centroidMod — same rule as [[ivfAssign]]; swap in
  // trained centroids from [[kmeansStep]] iterations in production),
  // arithmetic is quantized-integer throughout (squared L2 via
  // n−2·dot+cn on milli-unit ints — exact BIGINT-valued, order- and
  // engine-independent), ties break on centroid_id / neighbor_id asc.

  /** PQ codebooks: one row per (subspace, centroid) with the centroid's
    * subvector and its squared norm. `dims` must divide into `m` equal
    * subspaces. Metadata-sized (m × N/centroidMod rows) — always
    * broadcast. */
  def pqCodebooks(
      embeddings: DataFrame,
      m: Int = 8,
      dims: Int = 64,
      centroidMod: Int = 97): DataFrame = {
    require(dims % m == 0, s"dims=$dims not divisible into m=$m subspaces")
    subspaceBooks(
      embeddings
        .where(col("vec_id") % centroidMod === 0)
        .select(col("vec_id").as("centroid_id"),
          quantize(col("embedding")).as("v")),
      m, dims / m)
  }

  /** Slice a (centroid_id, v) relation into per-subspace codebook rows
    * (sub, centroid_id, cs, cn) — the ONE copy of the subspace split,
    * shared by the in-plan path ([[pqCodebooks]]) and the persisted
    * index's `book` relation so their arithmetic can never diverge. */
  private def subspaceBooks(
      centRows: DataFrame, m: Int, subDim: Int): DataFrame = {
    val spark = centRows.sparkSession
    centRows
      .withColumn("sub", explode(lit((0 until m).toArray)))
      .withColumn("cs", slice(col("v"), col("sub") * subDim + 1, lit(subDim)))
      .withColumn("cn", dot(col("cs"), col("cs")))
      .select("sub", "centroid_id", "cs", "cn")
  }

  /** PQ encode: each vector's m subvectors are assigned to their
    * nearest codebook entry (exact squared L2 on quantized integer-
    * valued doubles, tie-break centroid_id asc); output is `(vec_id,
    * codes)` with `codes[s]` the chosen centroid_id for subspace s —
    * the m-code compressed corpus a pipeline persists instead of raw
    * embeddings.
    *
    * Plan shape: ONE narrow codegen'd projection
    * ([[graft.functions.PqEncodeExpr]]) with the codebook collected as
    * a reference object — no join, no aggregate, no shuffle; encode
    * throughput scales with cores. The codebook is metadata-sized by
    * construction (ksub = N/centroidMod, caller-chosen — FAISS trains
    * 256 per subspace), and the relational alternative (explode m
    * subspaces × join the codebook × min_by) evaluates N·m·ksub
    * candidate ROWS: measured ~100 s vs ~2 s at 1M×8×245 for the same
    * ~8 GFLOP. The collect is the same metadata-bounded driver step
    * every ADC search needs for its lookup tables. */
  def pqEncode(
      embeddings: DataFrame,
      m: Int = 8,
      dims: Int = 64,
      centroidMod: Int = 97): DataFrame =
    embeddings.select(col("vec_id"),
      pqEncodeCol(embeddings, m, dims, centroidMod).as("codes"))

  /** The [[pqEncode]] codes as a bare Column (the codebook collect +
    * the [[graft.functions.PqEncodeExpr]] kernel) — split out so
    * [[ivfPqIndexG]] can compute codes AND coarse list in ONE corpus
    * projection instead of joining two corpus-scale relations. */
  private def pqEncodeCol(
      embeddings: DataFrame, m: Int, dims: Int, centroidMod: Int): Column = {
    require(m >= 1 && dims % m == 0, s"dims=$dims not divisible by m=$m")
    val subDim = dims / m
    val centRows = embeddings
      .where(col("vec_id") % centroidMod === 0)
      .select(col("vec_id"), quantize(col("embedding")).as("v"))
      .collect()
      .sortBy(_.getLong(0))
    require(centRows.nonEmpty, "empty PQ codebook")
    require(centRows.length.toLong * dims <= (16L << 20),
      s"codebook ${centRows.length}x$dims exceeds the driver bound; " +
        "raise centroidMod")
    val ids = centRows.map(_.getLong(0))
    val cents = centRows.map(_.getSeq[Double](1).toArray)
    graft.functions.PqEncodeExpr.col(
      quantize(col("embedding")), cents, ids, m, subDim)
  }

  /** PQ/ADC search: queries (vec_id < nQueries) rank the ENCODED corpus
    * by asymmetric distance — per query, a lookup table of
    * (subspace, centroid) partial distances is built against the raw
    * query subvector (nQueries × m × ksub rows, broadcast), and a
    * candidate's distance estimate is the m-term SUM of its codes'
    * table entries: the scan never touches raw corpus vectors. Exact
    * BIGINT arithmetic end-to-end; deterministic (dist asc,
    * neighbor_id) top-k. Approximate by construction (quantization
    * error) — certified against exact top-k recall in ScaleBench. */
  def pqSearch(
      embeddings: DataFrame,
      nQueries: Int,
      k: Int,
      m: Int = 8,
      dims: Int = 64,
      centroidMod: Int = 97): DataFrame = {
    val lutArr = adcLutArr(embeddings, nQueries, m, dims, centroidMod)
    val scored = pqEncode(embeddings, m, dims, centroidMod)
      .select(col("vec_id").as("neighbor_id"), col("codes"))
      .crossJoin(broadcast(lutArr))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        adcSum(m, centroidMod).as("adc_dist"))
    adcTopK(scored, k)
  }

  /** IVF+PQ composed search — the FAISS IVFPQ shape (Jégou 2011 §IV,
    * `by_residual=false` variant: codes quantize the RAW vector, not
    * the residual, so [[pqEncode]]'s codes are reused verbatim and the
    * ADC arithmetic is identical to [[pqSearch]]'s — the composition
    * changes WHICH rows are scanned, never how a row is scored).
    *
    * Index side (built once, persisted in production): every vector
    * carries its [[pqEncode]] codes AND its [[ivfAssign]] coarse list.
    * Query side: each query ranks the metadata-sized coarse-centroid
    * table (broadcast) and probes its `nprobe` nearest lists; the ADC
    * scan is an EQUI-JOIN of the encoded corpus against the broadcast
    * (query, probed-list, LUT) table on `list_id` — so the fraction of
    * the corpus scanned per query is Σ probed-list sizes / N
    * ≈ nprobe/nlists, the pruning lever [[pqSearch]]'s full linear ADC
    * scan lacks (its cost is strictly linear in corpus size; this is
    * what makes billion-vector search affordable). ScaleBench B40
    * REQUIREs both the planted-duplicate recall and the scanned-row
    * fraction at ≥1M vectors.
    *
    * Approximate by construction, in exactly two places: quantization
    * error (same as pqSearch, recall-certified) and coarse pruning (a
    * true neighbor in an unprobed list is missed — raise `nprobe` for
    * recall; nprobe ≥ nlists degenerates to pqSearch exactly, spec-
    * pinned). Deterministic end-to-end: exact BIGINT ADC, probe
    * tie-break (cos desc, list_id), top-k tie-break (dist asc,
    * neighbor_id). */
  def ivfPqSearch(
      embeddings: DataFrame,
      nQueries: Int,
      k: Int,
      m: Int = 8,
      dims: Int = 64,
      centroidMod: Int = 97,
      coarseMod: Int = 83,
      nprobe: Int = 2): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    adcTopK(ivfPqScored(
      embeddings, nQueries, m, dims, centroidMod, coarseMod, nprobe), k)
  }

  /** ADC-approximate top-`rerankR` then EXACT re-rank to top-`k` — the
    * FAISS refine stage (`IndexRefineFlat`): PQ compression buys the
    * scan, then the few surviving candidates are re-scored against
    * their RAW vectors, so the final ranking carries no quantization
    * error at all (only coarse-pruning recall loss remains). Exact leg
    * = [[cosineTopK]]'s rounded-cosine arithmetic verbatim, so rerankR
    * ≥ corpus reproduces the exact brute-force ranking.
    *
    * Scale shape: the candidate set (nQueries × rerankR rows — query-
    * scale) is BROADCAST to the vector fetch-back, so re-ranking is one
    * scan-side equi-join on vec_id plus a per-query window over ≤
    * rerankR rows; the corpus is never shuffled and raw vectors leave
    * the scan only for candidates. */
  def ivfPqRerank(
      embeddings: DataFrame,
      nQueries: Int,
      k: Int,
      rerankR: Int,
      m: Int = 8,
      dims: Int = 64,
      centroidMod: Int = 97,
      coarseMod: Int = 83,
      nprobe: Int = 2): DataFrame = {
    require(rerankR >= k, s"rerankR=$rerankR must be >= k=$k")
    val cand = ivfPqSearch(
      embeddings, nQueries, rerankR, m, dims, centroidMod, coarseMod, nprobe)
      .select(col("query_id"), col("neighbor_id"))
    val qv = embeddings
      .where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), quantize(col("embedding")).as("qv"))
      .withColumn("qn", dot(col("qv"), col("qv")))
    val exact = embeddings
      .select(col("vec_id").as("neighbor_id"),
        quantize(col("embedding")).as("cv"))
      .withColumn("cn", dot(col("cv"), col("cv")))
      .join(broadcast(cand), "neighbor_id")
      .join(broadcast(qv), "query_id")
      .withColumn("cos_sim",
        round(dot(col("qv"), col("cv")) / (sqrt(col("qn")) * sqrt(col("cn"))), 6))
    val win = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    exact
      .withColumn("rank", row_number().over(win))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos_sim")
  }

  /** The IVF+PQ index relation: every vector's [[pqEncode]] codes plus
    * its [[ivfAssign]] coarse list — `(neighbor_id, list_id, codes)`.
    * ONE narrow corpus projection (r22): both halves are pure per-row
    * functions of the embedding against metadata-sized driver-resident
    * centroid sets, so the former build shape — a corpus-scale
    * `groupBy(vec_id)` argmax exchange JOINED back onto the encoded
    * corpus on vec_id (a corpus self-join: two N-row exchanges + a
    * sort-merge, purely to attach a derivable value) — is replaced by
    * the [[graft.functions.IvfTopListsExpr]] kernel riding the encode
    * scan (guide §2.4, remove shuffles outright). Bit-identical by the
    * expression's arithmetic contract; this IS the stored index layout
    * a production deployment persists ([[ivfPqWriteIndex]]). */
  private[graft] def ivfPqIndex(
      embeddings: DataFrame,
      m: Int,
      dims: Int,
      centroidMod: Int,
      coarseMod: Int): DataFrame =
    ivfPqIndexG(embeddings, m, dims, centroidMod, coarseMod, g = 1)

  /** [[ivfPqIndex]] with coarse-spill degree `g` (each vector's codes
    * row lands in its g nearest lists — `trainedAssignG` semantics,
    * single-pass): one projection + one Generate, zero joins, zero
    * shuffles. Empty coarse subset ⇒ empty index, exactly like the
    * relational form (the explode drops every row). */
  private[graft] def ivfPqIndexG(
      embeddings: DataFrame,
      m: Int,
      dims: Int,
      centroidMod: Int,
      coarseMod: Int,
      g: Int): DataFrame = {
    val (ids, cvs) = coarseCentArrays(embeddings, coarseMod)
    embeddings.select(
      col("vec_id").as("neighbor_id"),
      explode(graft.functions.IvfTopListsExpr.col(
        quantize(col("embedding")), cvs, ids, g)).as("list_id"),
      pqEncodeCol(embeddings, m, dims, centroidMod).as("codes"))
  }

  /** The [[coarseCents]] subset collected to the driver (ids
    * ascending) — metadata-sized by the same contract that lets every
    * search broadcast it; bounded by the [[pqEncodeCol]]-style driver
    * require. */
  private def coarseCentArrays(
      embeddings: DataFrame,
      coarseMod: Int): (Array[Long], Array[Array[Double]]) = {
    val rows = embeddings
      .where(col("vec_id") % coarseMod === 0)
      .select(col("vec_id"), quantize(col("embedding")).as("v"))
      .collect()
      .sortBy(_.getLong(0))
    val cells = rows.iterator.map(_.getSeq[Double](1).length.toLong).sum
    require(cells <= (16L << 20),
      s"coarse centroid set ${rows.length} rows / $cells cells exceeds " +
        "the driver bound; raise coarseMod")
    (rows.map(_.getLong(0)), rows.map(_.getSeq[Double](1).toArray))
  }

  /** The (query_id, neighbor_id, adc_dist) candidate relation of
    * [[ivfPqSearch]] BEFORE top-k — exposed so ScaleBench can count
    * scanned candidate rows (the nprobe/nlists fraction REQUIRE)
    * without re-deriving the join. */
  private[graft] def ivfPqScored(
      embeddings: DataFrame,
      nQueries: Int,
      m: Int,
      dims: Int,
      centroidMod: Int,
      coarseMod: Int,
      nprobe: Int): DataFrame =
    ivfPqScoredQ(embeddings, prefixQueries(embeddings, nQueries), m, dims,
      centroidMod, coarseMod, nprobe, excludeSelf = true)

  /** The ONE copy of the in-plan IVF+PQ candidate scan, over an explicit
    * (query_id, v) query relation — shared by the vec_id-prefix form
    * above and the standalone-query form ([[ivfPqSearchQ]]). */
  private[graft] def ivfPqScoredQ(
      embeddings: DataFrame,
      qv: DataFrame,
      m: Int,
      dims: Int,
      centroidMod: Int,
      coarseMod: Int,
      nprobe: Int,
      excludeSelf: Boolean): DataFrame = {
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val index = ivfPqIndex(embeddings, m, dims, centroidMod, coarseMod)
    val cents = coarseCents(embeddings, coarseMod)
    val probes = ivfProbesQ(qv, cents, nprobe)
    // (query, probed list, LUT): nQueries × nprobe rows — broadcast;
    // the corpus-side join key is list_id, so unprobed lists never leave
    // the scan. The LUT side of THIS assembly join is broadcast-hinted
    // too (r22): both sides are query-scale by construction, but the
    // window output defeats size estimation and the planner fell back
    // to a sort-merge join — two exchanges + two sorts of query-scale
    // relations inside a subtree that is immediately broadcast anyway.
    val probeLut = probes.join(
      broadcast(adcLutFrom(qv, pqCodebooks(embeddings, m, dims, centroidMod),
        m, dims / m, centroidMod)), "query_id")
    val joined = index.join(broadcast(probeLut), Seq("list_id"))
    val kept =
      if (excludeSelf) joined.where(col("neighbor_id") =!= col("query_id"))
      else joined
    kept.select(col("query_id"), col("neighbor_id"),
      adcSum(m, centroidMod).as("adc_dist"))
  }

  /** [[ivfPqSearch]] serving a STANDALONE (query_id, embedding) query
    * relation — see [[ivfPqSearchPersistedQ]] for the signature
    * rationale and the `excludeSelf` contract. */
  def ivfPqSearchQ(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      m: Int = 8,
      dims: Int = 64,
      centroidMod: Int = 97,
      coarseMod: Int = 83,
      nprobe: Int = 2,
      excludeSelf: Boolean = false): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    adcTopK(ivfPqScoredQ(embeddings, quantQueries(queries), m, dims,
      centroidMod, coarseMod, nprobe, excludeSelf), k)
  }

  // --- Persisted IVF+PQ index (the 100 TB storage shape) ----------------
  //
  // ivfPqSearch prunes what gets SCORED (only probed lists enter the ADC
  // join) but its index is an in-plan relation, so every encoded corpus
  // row is still READ each query. At 100 TB the bytes-read cost IS the
  // query — the win has to move from "rows scored" to "rows scanned",
  // which is a STORAGE property: persist the (neighbor_id, list_id,
  // codes) index range-clustered by list_id (FAISS's inverted-list
  // storage, Jégou 2011 §IV — each list's codes contiguous on disk) and
  // push `list_id IN (probed)` down to the parquet reader, where file-
  // and row-group min/max stats on the clustered key drop unprobed
  // lists WITHOUT reading them. Same idiom as the M72 bloom layout, but
  // range stats suffice because the probe predicate is over the
  // clustering key itself. ScaleBench B43 REQUIREs the SCAN's
  // numOutputRows (not the join's) stays ≈ the probed fraction on a
  // persisted 1M-vector index.

  /** Build the IVF+PQ index and persist it to `dir` — all THREE index
    * relations, so search time touches the corpus relation only for the
    * query vectors themselves:
    *
    *  - `dir/codes`: (neighbor_id, list_id, codes), range-repartitioned
    *    into `numFiles` files each owning a contiguous list range and
    *    sorted by (list_id, neighbor_id) so row-group min/max stats on
    *    list_id are tight — the corpus-scale relation every search
    *    prunes at the SCAN;
    *  - `dir/cents`: the coarse-centroid relation (list_id, cv, cn) —
    *    metadata-sized;
    *  - `dir/book`: the PQ codebook rows (centroid_id, v) — metadata-
    *    sized; LUTs are built from this at search time instead of
    *    re-scanning the corpus for the centroid subset.
    *
    * `writerOptions` passes parquet writer knobs through to the codes
    * relation — pruning granularity is the ROW GROUP, so
    * `parquet.block.size` should sit at or below the expected per-list
    * byte footprint (N/nlists × ~code-row bytes); at production scale
    * (lists of 10⁶+ rows) the default 128 MB already satisfies this,
    * while small benchmark corpora need it lowered to see
    * row-group-level pruning. */
  def ivfPqWriteIndex(
      embeddings: DataFrame,
      dir: String,
      numFiles: Int,
      m: Int = 8,
      dims: Int = 64,
      centroidMod: Int = 97,
      coarseMod: Int = 83,
      writerOptions: Map[String, String] = Map.empty,
      storeVecs: Boolean = false,
      spillG: Int = 1): Unit = {
    require(spillG >= 1, s"spillG must be >= 1, got $spillG")
    // g-nearest-list assignment rides the encode projection — one
    // narrow corpus pass for ANY spill degree (r22; the g>1 path was
    // g rounds of corpus-scale crossJoin+argmax+join)
    val codes = ivfPqIndexG(embeddings, m, dims, centroidMod, coarseMod,
      spillG)
    // the four relation writes are independent (disjoint dirs, shared
    // read-only input) — overlapped on driver threads (guide §2.6)
    graft.Par.run(
      Seq(
        () => {
          graft.ops.Layout.clusterInto(codes, numFiles,
            Seq("list_id", "neighbor_id"))
            .write.mode("errorifexists").options(writerOptions)
            .parquet(s"$dir/codes/gen-0")
          graft.ops.Layout.sealInitial(embeddings.sparkSession, s"$dir/codes")
        },
        () => coarseCents(embeddings, coarseMod)
          .coalesce(1).write.mode("errorifexists").parquet(s"$dir/cents"),
        () => embeddings
          .where(col("vec_id") % centroidMod === 0)
          .select(col("vec_id").as("centroid_id"),
            quantize(col("embedding")).as("v"))
          .coalesce(1).write.mode("errorifexists").parquet(s"$dir/book")) ++
        (if (storeVecs)
          Seq(() => writeVecs(embeddings, dir, numFiles, writerOptions))
        else Seq.empty): _*)
    if (spillG > 1) writeSpillMarker(embeddings.sparkSession, dir, spillG)
  }

  /** The raw-vector refine relation at `dir/vecs` — (vec_id, v)
    * range-clustered by vec_id through the shared lifecycle, so the
    * exact re-rank stage ([[ivfPqRerankPersistedQ]]) fetches ONLY its
    * candidates' vectors (a pushed-down id IN over the clustering key)
    * instead of touching the corpus: the FAISS `IndexRefineFlat`
    * storage half. Doubles the index's byte footprint (codes are
    * compressed, raw vectors are not) — which is exactly the
    * IVFPQ+refine trade every production FAISS deployment makes for
    * recall (Jégou 2011 §VII). */
  private def writeVecs(
      embeddings: DataFrame,
      dir: String,
      numFiles: Int,
      writerOptions: Map[String, String]): Unit = {
    graft.ops.Layout.clusterInto(
      embeddings.select(col("vec_id"), quantize(col("embedding")).as("v")),
      numFiles, Seq("vec_id"))
      .write.mode("errorifexists").options(writerOptions)
      .parquet(s"$dir/vecs/gen-0")
    graft.ops.Layout.sealInitial(embeddings.sparkSession, s"$dir/vecs")
  }

  /** Chunk budget for the probed-list scan: up to this many
    * ≤-threshold IN chunks stay exact-at-the-scan; past it the plan
    * switches to the O(1)-size range-cover scan. 16 chunks × the
    * default threshold 10 ≈ 160 probed lists — far above any tested
    * workload (nprobe ≤ 16 × 10 queries), so the cover path is purely
    * the asymptotic safety net. */
  private val MaxInChunks = 16

  // --- Coarse-spill (multi-assignment) indexing --------------------------
  //
  // B47 proved the refine stage closes ALL quantization error: reranked
  // recall@10 equals the PROBED-LIST CEILING — the fraction of true
  // neighbors whose single assigned list the query probes. The last
  // recall lever is therefore the ceiling itself. Raising nprobe pays
  // at query time on every search; SPILL indexing pays once at build
  // time instead: each vector's codes row is written into its g nearest
  // coarse lists (the "multiple-assignment" idiom of Jégou 2011 §V /
  // the non-exhaustive search literature), so a true neighbor is
  // findable when ANY of its g lists is probed — the ceiling rises from
  // P(probe its list) to P(probe any of g) at a bounded g× codes-size
  // cost (the vecs refine relation stays single-copy: one raw vector
  // per id). Search-time contract: copies share their codes, so the
  // non-residual ADC distance is IDENTICAL across copies and the scored
  // relation is deduped by (query_id, neighbor_id) min — equal-valued,
  // so min == any — before top-k; gate q_ivfpq_spill replays
  // assign-to-g-lists + dedup-by-best in DuckDB. Lifecycle: appends
  // re-read the index's recorded g (never the caller's), tombstones
  // anti-join on neighbor_id and so mask/drop EVERY copy, upsert
  // victims are semi-join-distinct — multi-copy semantics hold through
  // append/delete/consolidate/upsert (spec-pinned).

  /** Record the writer's coarse-spill degree at `dir/_spill` so readers
    * and appends resolve g from the INDEX, never from a caller that
    * could desync it. Only written when g > 1 (absent marker = 1, the
    * classic single-assignment index — no behavior change). */
  private def writeSpillMarker(
      spark: SparkSession, dir: String, g: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_spill")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$g\n".getBytes("UTF-8")) finally out.close()
  }

  /** The index's coarse-spill degree — `dir/_spill`, defaulting to 1
    * (single assignment) when absent. Memoized per dir and revalidated
    * by ONE getFileStatus stamp (len:mtime) instead of the exists +
    * open + read triple every search used to pay (the r20 advisor's
    * per-search-metadata finding): the marker is write-once in the
    * lifecycle, so the stamp only exists to catch out-of-band rewrites
    * the way ServingCache's fingerprint does. */
  private val spillMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Int)]()

  private[graft] def spillDegree(
      spark: SparkSession, indexDir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/_spill")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp =
      try {
        val st = fs.getFileStatus(p)
        st.getLen.toString + ":" + st.getModificationTime
      } catch { case _: java.io.FileNotFoundException => "absent" }
    val cur = spillMemo.get(indexDir)
    if (cur != null && cur._1 == stamp) cur._2
    else {
      val g =
        if (stamp == "absent") 1
        else {
          val in = fs.open(p)
          try {
            val buf = new Array[Byte](32)
            val n = in.read(buf)
            new String(buf, 0, math.max(n, 0), "UTF-8").trim.toInt
          } finally in.close()
        }
      spillMemo.put(indexDir, (stamp, g))
      g
    }
  }

  // The iterated-argmax relational assignment (trainedAssign /
  // trainedAssignG) was replaced in r22 by the single-pass
  // [[graft.functions.IvfTopListsExpr]] kernel at every call site —
  // the assignment is a pure per-row function of the vector against a
  // metadata-sized driver-resident centroid set, so the crossJoin +
  // argmax exchange (+ the vec_id self-join to attach the result) were
  // removable shuffles (guide §2.4). Iterated argmax-with-exclusion
  // equals top-g by (cos desc, list asc) exactly, ties included — the
  // kernel implements precisely that ordering.

  /** True when the index at `dir` carries the refine relation. */
  private def hasVecs(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/vecs")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  // --- Retraining epochs --------------------------------------------------
  //
  // Frozen-book appends (the FAISS add() contract) are exact but a
  // corpus that DRIFTS — a new language, a new embedding version —
  // degrades ADC resolution with no recovery short of a manual rebuild:
  // out-of-distribution vectors crowd a few coarse lists and quantize
  // to a few codes, so the candidate ranking decays toward ties
  // (ScaleBench B51 plants exactly this). [[ivfPqRetrainIndex]] is the
  // recovery operator: train FRESH books and centroids on the current
  // corpus (read back from the index's own refine relation), re-encode
  // everything, and flip atomically. Atomicity needs a root that can
  // swap ALL FOUR relations at once — codes encoded with new books
  // under old LUT metadata would rank garbage — so a retrain writes a
  // complete replacement index into `indexDir/epoch-<n>/` and commits
  // ONE [[graft.ops.TableManifest]] at the INDEX root whose live set
  // names the epoch: readers resolve the root first, so they see the
  // old index in full until the rename lands, then the new one in full
  // (the same commit protocol as the per-relation lifecycle, one level
  // up). Old epochs stay on disk for in-flight readers until
  // [[ivfPqVacuumIndex]] reclaims them.

  private val EpochName = "epoch-(\\d+)".r

  /** Resolve the LIVE root of the index at `indexDir`: the manifest-
    * committed epoch directory after a retrain, `indexDir` itself
    * before one. Every persisted-index entry point resolves this
    * first (idempotent — an epoch dir carries no root manifest).
    * Memoized per dir, revalidated by the newest root-manifest
    * SEQUENCE (one listStatus) — the root can only move via a root
    * manifest commit (retrain), so a matching seq proves the cached
    * resolution current without re-opening and re-parsing the
    * manifest on every search (the r20 advisor's finding). */
  private val rootMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, String)]()

  private[graft] def indexRoot(
      spark: SparkSession, indexDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val seq = graft.ops.TableManifest.latestSeq(fs, p).getOrElse(-1)
    val cur = rootMemo.get(indexDir)
    if (cur != null && cur._1 == seq) cur._2
    else {
      val root =
        if (seq < 0) indexDir
        else graft.ops.TableManifest.latest(fs, p).flatMap(_.gens)
          .flatMap(_.find(_.matches("epoch-\\d+"))) match {
          case Some(e) => s"$indexDir/$e"
          case None => indexDir
        }
      rootMemo.put(indexDir, (seq, root))
      root
    }
  }

  /** RETRAIN the persisted index at `indexDir` on its CURRENT corpus:
    * the raw vectors are read back from the live refine relation
    * (requires an index built with `storeVecs = true` — the relation
    * exists precisely so exactness never depends on the original
    * corpus being reachable), fresh coarse centroids and PQ codebooks
    * are Lloyd-trained on them ([[ivfTrainCentroids]] /
    * [[pqTrainCodebooks]]), every vector is re-encoded, and the
    * complete replacement index (codes + cents + book + vecs, spill
    * degree preserved unless overridden) lands in `indexDir/epoch-<n>`
    * behind ONE atomic manifest commit at the index root. The result
    * is BIT-IDENTICAL to [[ivfPqWriteIndexTrained]] over the same
    * visible rows (quantization is idempotent, so the stored vectors
    * round-trip exactly — gate q_ivfpq_retrain pins it); searches
    * against the retrained index use `centroidMod = 1` (trained codes
    * are codebook indices).
    *
    * Crash safety: a half-written epoch directory without the root
    * commit is invisible (the root manifest still names the old live
    * root) and a retry numbers PAST it (listing-based); the abandoned
    * directory is reclaimed by [[ivfPqVacuumIndex]]. Cost honesty:
    * this is the full-rebuild operator — one training pass over the
    * corpus plus one re-encode/re-cluster write, paid when drift has
    * already cost more in recall (B51 REQUIREs the recovery).
    * Single-maintenance-writer contract applies. */
  def ivfPqRetrainIndex(
      spark: SparkSession,
      indexDir: String,
      numFiles: Int,
      m: Int = 8,
      dims: Int = 64,
      ksub: Int = 256,
      nlists: Int = 16,
      iters: Int = 2,
      trainMod: Int = 1,
      writerOptions: Map[String, String] = Map.empty,
      spillG: Int = 0): Unit = {
    val root = indexRoot(spark, indexDir)
    require(hasVecs(spark, root),
      s"no raw-vector relation at $root/vecs - retraining re-encodes " +
        "from the stored vectors; write the index with storeVecs = true")
    val g = if (spillG > 0) spillG else spillDegree(spark, root)
    // the live corpus, reconstructed exactly: vecs stores
    // quantize(embedding) (integer milli-units), and quantize is
    // idempotent through the /1000 round-trip, so training and
    // re-encoding below see the same integers a fresh build would
    val emb = graft.ops.Layout.clusteredTable(spark, s"$root/vecs")
      .select(col("vec_id"),
        transform(col("v"), x => x / 1000.0d).as("embedding"))
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // number PAST every epoch dir on disk — a crashed (uncommitted)
    // attempt is skipped, never adopted or collided with
    val next = fs.listStatus(p).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case EpochName(n) => Some(n.toInt)
          case _ => None
        }
    }.flatten.foldLeft(-1)(math.max) + 1
    val epochDir = s"$indexDir/epoch-$next"
    ivfPqWriteIndexTrained(emb, epochDir, numFiles, m, dims, ksub,
      nlists, iters, trainMod, writerOptions, storeVecs = true,
      spillG = g)
    // ONE rename flips all four relations together
    graft.ops.TableManifest.commit(fs, p, graft.ops.TableManifest.Snapshot(
      0, Some(Seq(s"epoch-$next")), Set.empty, Set.empty,
      Seq.empty, Set.empty))
  }

  /** Delete RETIRED epoch directories (not named live by the root
    * manifest) — the epoch-level half of [[ivfPqVacuumIndex]], with
    * the same retention guard. The pre-epoch root-level relations are
    * left in place (they are not epoch-addressable; reclaim them out
    * of band if the index has been retrained). Returns dirs deleted. */
  private def purgeEpochs(
      spark: SparkSession, indexDir: String, force: Boolean): Long = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.ops.TableManifest.latest(fs, p).flatMap(_.gens) match {
      case Some(live) if live.exists(_.matches("epoch-\\d+")) =>
        val young = !force && graft.ops.TableManifest.ageMs(fs, p)
          .exists(_ < graft.ops.Layout.DefaultVacuumRetentionMs)
        if (young) 0L
        else {
          val liveSet = live.toSet
          var purged = 0L
          fs.listStatus(p).foreach { st =>
            if (st.isDirectory && st.getPath.getName.matches("epoch-\\d+")
              && !liveSet.contains(st.getPath.getName)) {
              if (fs.delete(st.getPath, true)) purged += 1L
            }
          }
          purged
        }
      case _ => 0L
    }
  }

  /** The persisted coarse-centroid relation, served from the driver
    * metadata cache ([[graft.ops.ServingCache]]): collected once per
    * (dir, lifecycle fingerprint), rebuilt as a local relation per call
    * — a repeat search pays a directory listing, not a parquet job.
    * Metadata-sized by construction (nlists rows). */
  private def centRowsCached(
      spark: SparkSession,
      indexDir: String): IndexedSeq[(Long, Seq[Double], Double)] =
    graft.ops.ServingCache
      .cached("cents", spark, s"$indexDir/cents") {
        graft.ops.ParquetIO.read(spark, Seq(s"$indexDir/cents")).collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
          .toIndexedSeq
      }

  private def centsCached(spark: SparkSession, indexDir: String): DataFrame =
    spark.createDataFrame(centRowsCached(spark, indexDir))
      .toDF("list_id", "cv", "cn")

  /** The persisted PQ codebook rows from the driver metadata cache —
    * same contract as [[centsCached]]; the collect is bounded by the
    * same 16M-cell require as [[ivfPqAppendIndex]]'s. */
  private def bookRowsCached(
      spark: SparkSession,
      indexDir: String): IndexedSeq[(Long, Seq[Double])] =
    graft.ops.ServingCache.cached("book", spark, s"$indexDir/book") {
      graft.ops.ParquetIO.read(spark, Seq(s"$indexDir/book")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toIndexedSeq
    }

  /** [[bookRowsCached]] as the (centroid_id, v) relation the LUT build
    * consumes. */
  private def bookDfCached(spark: SparkSession, indexDir: String): DataFrame =
    spark.createDataFrame(bookRowsCached(spark, indexDir))
      .toDF("centroid_id", "v")

  /** Build the FULLY-TRAINED persisted index — [[ivfPqWriteIndex]]'s
    * layout (codes clustered by list_id + metadata centroid/codebook
    * relations) with both halves trained at fixed size
    * ([[ivfTrainCentroids]] coarse, [[pqTrainCodebooks]] PQ): the
    * complete, scale-invariant FAISS IVFPQ artifact a production
    * deployment builds once and serves from. Searched with
    * [[ivfPqSearchPersisted]] at `centroidMod = 1` (trained codes are
    * codebook INDICES, so the LUT divisor is 1) — spec-pinned equal to
    * the in-plan [[ivfPqSearchTrainedFull]]. */
  def ivfPqWriteIndexTrained(
      embeddings: DataFrame,
      dir: String,
      numFiles: Int,
      m: Int = 8,
      dims: Int = 64,
      ksub: Int = 256,
      nlists: Int = 16,
      iters: Int = 2,
      trainMod: Int = 1,
      writerOptions: Map[String, String] = Map.empty,
      storeVecs: Boolean = false,
      spillG: Int = 1): Unit = {
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    require(spillG >= 1, s"spillG must be >= 1, got $spillG")
    val subDim = dims / m
    val spark = embeddings.sparkSession
    val coarse = ivfTrainCentroids(embeddings, dims, nlists, iters, trainMod)
    val books = pqTrainCodebooks(embeddings, m, dims, ksub, iters, trainMod)
    val cents = centsDf(spark, coarse)
    // the four relation writes are independent (disjoint dirs; cents
    // and books are already driver-resolved) — overlapped (guide §2.6)
    graft.Par.run(
      Seq(
        () => {
          // codes + g-nearest trained lists in ONE narrow projection
          // (r22): the trained centroids are already driver arrays, so
          // the former corpus-scale assign aggregate + vec_id join is
          // the [[graft.functions.IvfTopListsExpr]] kernel riding the
          // encode scan — bit-identical by its arithmetic contract
          embeddings
            .select(col("vec_id").as("neighbor_id"),
              explode(graft.functions.IvfTopListsExpr.col(
                quantize(col("embedding")), coarse,
                Array.tabulate(nlists)(_.toLong), spillG)).as("list_id"),
              graft.functions.PqEncodeExpr.col(
                quantize(col("embedding")), books,
                Array.tabulate(ksub)(_.toLong), m, subDim).as("codes"))
            .transform(graft.ops.Layout.clusterInto(_, numFiles,
              Seq("list_id", "neighbor_id")))
            .write.mode("errorifexists").options(writerOptions)
            .parquet(s"$dir/codes/gen-0")
          graft.ops.Layout.sealInitial(spark, s"$dir/codes")
        },
        () => cents.coalesce(1).write.mode("errorifexists")
          .parquet(s"$dir/cents"),
        () => spark.createDataFrame(
          books.toIndexedSeq.zipWithIndex
            .map { case (b, i) => (i.toLong, b.toSeq) })
          .toDF("centroid_id", "v")
          .coalesce(1).write.mode("errorifexists").parquet(s"$dir/book")) ++
        (if (storeVecs)
          Seq(() => writeVecs(embeddings, dir, numFiles, writerOptions))
        else Seq.empty): _*)
    if (spillG > 1) writeSpillMarker(spark, dir, spillG)
  }

  /** INCREMENTAL index maintenance — the FAISS `add()` contract: encode
    * and coarse-assign NEW vectors against the index's FROZEN stored
    * relations (`dir/book`, `dir/cents` — no retraining; a growing
    * corpus must never pay a rebuild at ingest) and land the rows in
    * the codes TAIL, unclustered (the [[graft.ops.Layout.zorderAppend]]
    * idiom applied to the list_id cluster key: ingest is one narrow
    * encode projection + one broadcast assign aggregate, NO shuffle of
    * existing data). Readers see appended vectors immediately
    * ([[ivfPqSearchPersisted]] globs generations + tail); tail files
    * span all lists, so they prune poorly at the scan until
    * [[ivfPqOptimizeIndex]] re-clusters them — exactly the z-order
    * tail story, REQUIREd in ScaleBench B46.
    *
    * Works against both writer variants: the book's centroid_id values
    * are whatever the writer stored (subset vec_ids or trained
    * indices), and the encode/assign arithmetic is the shared kernels,
    * so appended codes are bit-identical to what a full rebuild with
    * the same codebooks would produce (spec-pinned).
    *
    * Duplicate ids: the default append is BLIND — re-ingesting a batch
    * double-inserts its vec_ids (FAISS `add()` behaves the same: ids
    * are caller-managed). Pass `dedupAgainstIndex = true` to anti-join
    * the incoming vec_ids against the live index (one distributed join
    * of the NEW batch against the index's id column — the index side is
    * never shuffled wide).
    *
    * Delete-then-re-add: an id with a PENDING tombstone
    * ([[ivfPqDeleteIndex]]) must not be re-appended — the reader would
    * mask the new row and the next compaction would drop it physically
    * (silent permanent loss), so this append REJECTS such ids loudly;
    * run [[ivfPqConsolidateIndex]] first to retire the tombstones (the
    * [[graft.ops.Layout.tombstone]] contract). The check costs nothing
    * when no tombstones are pending. */
  def ivfPqAppendIndex(
      spark: SparkSession,
      indexDir: String,
      newVecs: DataFrame,
      m: Int = 8,
      dims: Int = 64,
      dedupAgainstIndex: Boolean = false): Unit = {
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val subDim = dims / m
    val root = indexRoot(spark, indexDir)
    val bookRows = bookRowsCached(spark, root).sortBy(_._1)
    require(bookRows.nonEmpty, s"no codebook at $root/book")
    // same driver bound as pqEncode: a subset-writer book is
    // N/centroidMod rows (grows with the corpus) and this collect must
    // never become a driver OOM at production scale
    require(bookRows.length.toLong * dims <= (16L << 20),
      s"codebook ${bookRows.length}x$dims exceeds the driver bound; " +
        "raise centroidMod (or use the trained writer's fixed ksub)")
    val ids = bookRows.map(_._1).toArray
    val books = bookRows.map(_._2.toArray).toArray
    // the coarse centroids are driver-resident (ServingCache) — the
    // assignment below is the narrow kernel, not a relational join
    val centRows = centRowsCached(spark, root).sortBy(_._1)
    val centIds = centRows.map(_._1).toArray
    val centVs = centRows.map(_._2.toArray).toArray
    val pendingDel = graft.ops.Layout.pendingTombstoned(spark,
      s"$root/codes", "neighbor_id",
      newVecs.select(col("vec_id").as("neighbor_id")))
    require(pendingDel == 0L,
      s"$pendingDel incoming vec_ids have PENDING tombstones - appending " +
        "them would be silently masked and dropped at the next compaction; " +
        "run ivfPqConsolidateIndex first (delete-then-re-add contract)")
    // fan the BATCH out to the session's parallelism before the heavy
    // encode/assign work: a streaming micro-batch arrives as ONE file
    // (one partition), and the nlists-way assign crossJoin inherits
    // that — measured 19 min for 10 × 90k-vector batches at nlists
    // 1024 on 32 cores, all on one core. Repartitioning the NEW rows
    // only (a batch-scale shuffle) keeps the no-shuffle-of-existing-
    // data ingest contract intact. localCheckpoint: the batch feeds up
    // to TWO relation appends below (codes + vecs) — snapshot once
    // instead of re-running the source per write (the Bm25.appendIndex
    // idiom, minus its self-read hazard which the per-relation dedup
    // joins below reintroduce: they READ the tables being written, so
    // they too must be resolved against the snapshot).
    // fan-out threshold min(parallelism, 8), not parallelism itself
    // (r22, the Bm25.appendIndex rationale): only a SERIAL batch pays
    // the ingest-time shuffle
    val par = spark.sparkContext.defaultParallelism
    val fanout = math.min(par, 8)
    val batch =
      (if (newVecs.rdd.getNumPartitions >= fanout) newVecs
      else newVecs.repartition(par)).localCheckpoint()
    // dedup is PER RELATION, each against its OWN visible table — NOT
    // one shared filter from the codes side: a crash between the two
    // appends leaves codes ahead of vecs, and a codes-derived dedup
    // would make the replayed batch a no-op for BOTH relations,
    // permanently desyncing the refine relation (the re-rank inner
    // join would then silently drop those candidates). Independent
    // anti-joins make each relation converge under at-least-once
    // replay regardless of where the crash fell.
    def deduped(sub: String, idCol: String): DataFrame =
      if (!dedupAgainstIndex) batch
      else graft.ops.Layout.clusteredTableIfAny(spark, s"$root/$sub")
        .fold(batch)(vis => batch.join(
          vis.select(col(idCol).as("vec_id")), Seq("vec_id"), "left_anti"))
    val incoming = deduped("codes", "neighbor_id")
    // a spill-written index keeps its multi-assignment degree through
    // appends — resolved from the index's own marker, never a caller
    // argument that could desync the copies-per-vector invariant.
    // Codes + g nearest lists in ONE narrow projection over the batch
    // (r22): the former g-round crossJoin/argmax/join chain is the
    // IvfTopListsExpr kernel riding the encode scan.
    val spillG = spillDegree(spark, root)
    // the codes append and the vecs lockstep append are independent
    // (disjoint dirs, both read the one checkpointed batch) —
    // overlapped on driver threads (guide §2.6)
    def appendCodes(): Unit = incoming
      .select(col("vec_id").as("neighbor_id"),
        explode(graft.functions.IvfTopListsExpr.col(
          quantize(col("embedding")), centVs, centIds, spillG))
          .as("list_id"),
        graft.functions.PqEncodeExpr.col(
          quantize(col("embedding")), books, ids, m, subDim).as("codes"))
      .write.mode("append").parquet(s"$root/codes/tail")
    // a refine-enabled index keeps its raw-vector relation in lockstep
    // (same ids, same lifecycle) — the re-rank stage must be able to
    // fetch any candidate the codes relation can surface
    def appendVecs(): Unit = {
      val pendingVecs = graft.ops.Layout.pendingTombstoned(spark,
        s"$root/vecs", "vec_id", batch.select("vec_id"))
      require(pendingVecs == 0L,
        s"$pendingVecs incoming vec_ids have PENDING tombstones in the " +
          "vecs refine relation - run ivfPqConsolidateIndex first " +
          "(delete-then-re-add contract)")
      deduped("vecs", "vec_id")
        .select(col("vec_id"), quantize(col("embedding")).as("v"))
        .write.mode("append").parquet(s"$root/vecs/tail")
    }
    if (hasVecs(spark, root))
      graft.Par.run(() => appendCodes(), () => appendVecs())
    else appendCodes()
  }

  /** OPTIMIZE pass for the persisted index: re-cluster the codes TAIL
    * into the next generation by (list_id, neighbor_id) — the shared
    * [[graft.ops.Layout.clusteredOptimize]] lifecycle with the index's
    * cluster key. Returns rows compacted; `maxGenerations` > 0 folds
    * generations together past the threshold (one full-index sort
    * amortized over the cheap tail-only passes). */
  def ivfPqOptimizeIndex(
      spark: SparkSession,
      indexDir: String,
      numFiles: Int,
      maxGenerations: Int = 0,
      writerOptions: Map[String, String] = Map.empty): Long = {
    val root = indexRoot(spark, indexDir)
    // codes and vecs maintain independently (disjoint dirs, own
    // manifests) — overlapped on driver threads (guide §2.6)
    var n = 0L
    if (hasVecs(spark, root))
      graft.Par.run(
        () => n = graft.ops.Layout.clusteredOptimize(spark, s"$root/codes",
          numFiles, Seq("list_id", "neighbor_id"), maxGenerations,
          writerOptions),
        () => graft.ops.Layout.clusteredOptimize(spark, s"$root/vecs",
          numFiles, Seq("vec_id"), maxGenerations, writerOptions))
    else
      n = graft.ops.Layout.clusteredOptimize(spark, s"$root/codes",
        numFiles, Seq("list_id", "neighbor_id"), maxGenerations,
        writerOptions)
    n
  }

  /** CONSOLIDATE pass for the persisted index: fold every generation
    * into one freshly (list_id, neighbor_id)-clustered generation,
    * applying [[ivfPqDeleteIndex]] tombstones PHYSICALLY and retiring
    * them once no un-compacted tail remains — the compaction half of
    * FAISS `remove_ids`, after which reads pay no anti-join and no
    * data file holds a deleted row. Returns rows rewritten (0 = single
    * generation and no pending tombstones, no-op). Same single-
    * OPTIMIZE-writer and reader-race contracts as
    * [[graft.ops.Layout.clusteredConsolidate]]. */
  def ivfPqConsolidateIndex(
      spark: SparkSession,
      indexDir: String,
      numFiles: Int,
      writerOptions: Map[String, String] = Map.empty): Long = {
    val root = indexRoot(spark, indexDir)
    // codes and vecs consolidate independently — overlapped (guide §2.6)
    var n = 0L
    if (hasVecs(spark, root))
      graft.Par.run(
        () => n = graft.ops.Layout.clusteredConsolidate(spark,
          s"$root/codes", numFiles, Seq("list_id", "neighbor_id"),
          writerOptions),
        () => graft.ops.Layout.clusteredConsolidate(spark, s"$root/vecs",
          numFiles, Seq("vec_id"), writerOptions))
    else
      n = graft.ops.Layout.clusteredConsolidate(spark, s"$root/codes",
        numFiles, Seq("list_id", "neighbor_id"), writerOptions)
    n
  }

  /** UPSERT: replace-or-insert `newVecs` by vec_id — the supported
    * form of delete-then-re-add (the [[ivfPqAppendIndex]] pending-
    * tombstone require's escape hatch, same shape as
    * [[graft.text.Bm25.upsertIndex]]): ids present in the visible
    * index are tombstoned (absent ids are NOT — a blind tombstone of a
    * new id would mask its own append), the tombstones are applied
    * physically and retired (optimize folds the tail, consolidate
    * rewrites), then the batch appends against the frozen codebooks.
    * A batch of purely-new ids skips the rewrite entirely. Cost
    * honesty + single-maintenance-writer contract as the BM25 twin. */
  def ivfPqUpsertIndex(
      spark: SparkSession,
      indexDir: String,
      newVecs: DataFrame,
      numFiles: Int,
      m: Int = 8,
      dims: Int = 64,
      writerOptions: Map[String, String] = Map.empty): Unit = {
    // the victim semi-join is materialized ONCE (localCheckpoint) so
    // the emptiness probe and the tombstone write share one plan
    // instead of running the join twice; the checkpointed relation is
    // batch-scale (ids of the incoming rows at most)
    val victims = newVecs.select(col("vec_id").cast("long").as("vec_id"))
      .join(graft.ops.Layout.clusteredTable(spark,
        s"${indexRoot(spark, indexDir)}/codes")
        .select(col("neighbor_id").as("vec_id")), Seq("vec_id"),
        "left_semi")
      .localCheckpoint()
    if (!victims.isEmpty) {
      ivfPqDeleteIndex(spark, indexDir, victims)
      ivfPqOptimizeIndex(spark, indexDir, numFiles,
        writerOptions = writerOptions)
      ivfPqConsolidateIndex(spark, indexDir, numFiles, writerOptions)
    }
    ivfPqAppendIndex(spark, indexDir, newVecs, m, dims)
  }

  /** Immediately reclaim index files the manifests have retired (old
    * generations, compacted tail, applied tombstones) instead of
    * waiting one maintenance interval — [[graft.ops.Layout.vacuum]]
    * over the index's lifecycle relations, with its retention guard:
    * unforced calls no-op while the newest manifest is younger than
    * the retention window; `force = true` reclaims now. */
  def ivfPqVacuumIndex(
      spark: SparkSession, indexDir: String,
      force: Boolean = false): Long = {
    val root = indexRoot(spark, indexDir)
    graft.ops.Layout.vacuum(spark, s"$root/codes", force = force) +
      (if (hasVecs(spark, root))
        graft.ops.Layout.vacuum(spark, s"$root/vecs", force = force)
      else 0L) +
      purgeEpochs(spark, indexDir, force)
  }

  /** [[ivfPqSearch]] over a PERSISTED index ([[ivfPqWriteIndex]] or
    * [[ivfPqWriteIndexTrained]]): identical results (same probes, same
    * LUTs, same ADC arithmetic — SimilaritySpec pins equality), but
    * every index relation comes from `dir`: the coarse centroids and PQ
    * codebook are metadata-sized parquet reads, and the corpus-scale
    * codes relation is filtered to the UNION of probed lists — a
    * predicate the scan itself prunes with (the probed-list set is
    * driver-collected to build the pushed-down IN: nQueries × nprobe
    * longs, the same query-scale bound as the broadcast LUT table).
    * `embeddings` supplies ONLY the query vectors (vec_id < nQueries, a
    * pushed-down filter) — search cost is independent of corpus size
    * except for the pruned codes scan, which is the whole point.
    *
    * `centroidMod` is the code→LUT-slot divisor and must match the
    * writer: the subset writer's codes are centroid vec_ids (divisor =
    * its centroidMod); the TRAINED writer's codes are codebook indices
    * (pass 1). */
  def ivfPqSearchPersisted(
      spark: SparkSession,
      indexDir: String,
      embeddings: DataFrame,
      nQueries: Int,
      k: Int,
      m: Int = 8,
      dims: Int = 64,
      centroidMod: Int = 97,
      nprobe: Int = 2): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    adcTopK(ivfPqScoredPersistedQ(
      spark, indexDir, prefixQueries(embeddings, nQueries), m, dims,
      centroidMod, nprobe, excludeSelf = true), k)
  }

  /** [[ivfPqSearchPersisted]] serving a STANDALONE query relation — the
    * production signature (FAISS `index.search(xq, k)`, Jégou 2011 §V):
    * `queries` is any (query_id, embedding) DataFrame, NOT rows of the
    * corpus the index was built from. Identical probes/LUT/ADC
    * arithmetic (gate q_ivfpq_persisted_q pins it equal to the
    * vec_id-prefix form on the same fixture); what changes is only
    * where the query vectors come from.
    *
    * `excludeSelf` controls the fixture-era self-exclusion: the default
    * `false` is the FAISS contract (an indexed vector identical to the
    * query IS its nearest neighbor and must surface — external query
    * ids share no id space with the corpus, so filtering
    * `neighbor_id != query_id` would drop an unrelated corpus row);
    * pass `true` only when query ids ARE corpus vec_ids and the caller
    * wants the kNN convention of not returning the query itself. */
  def ivfPqSearchPersistedQ(
      spark: SparkSession,
      indexDir: String,
      queries: DataFrame,
      k: Int,
      m: Int = 8,
      dims: Int = 64,
      centroidMod: Int = 97,
      nprobe: Int = 2,
      excludeSelf: Boolean = false): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    adcTopK(ivfPqScoredPersistedQ(
      spark, indexDir, quantQueries(queries), m, dims, centroidMod,
      nprobe, excludeSelf), k)
  }

  /** [[ivfPqSearchPersistedQ]] for LITERAL query vectors (id, values) —
    * values in the embedding column's units (quantized internally). */
  def ivfPqSearchPersistedVecs(
      spark: SparkSession,
      indexDir: String,
      queries: Seq[(Long, Array[Double])],
      k: Int,
      m: Int = 8,
      dims: Int = 64,
      centroidMod: Int = 97,
      nprobe: Int = 2,
      excludeSelf: Boolean = false): DataFrame = {
    require(queries.nonEmpty, "need at least one query vector")
    val df = spark.createDataFrame(
      queries.map { case (id, v) => (id, v.toSeq) })
      .toDF("query_id", "embedding")
    ivfPqSearchPersistedQ(spark, indexDir, df, k, m, dims, centroidMod,
      nprobe, excludeSelf)
  }

  /** [[ivfPqSearchPersistedQ]] + EXACT re-rank from the index's stored
    * raw-vector relation — the complete FAISS IVFPQ+refine SERVING path
    * (`IndexRefineFlat`, Jégou 2011 §VII): the ADC scan (pruned to the
    * probed lists at the parquet reader) surfaces `rerankR` candidates
    * per query, their raw vectors are fetched from `dir/vecs` by a
    * pushed-down id IN over the vec_id clustering key (candidate-scale
    * bytes, not corpus-scale), and the final top-`k` ranking is the
    * exact rounded-cosine arithmetic of [[ivfPqRerank]] — zero
    * quantization error in the result; only coarse-pruning recall loss
    * remains. B47 quantifies both on an adversarial uniform-random 1M
    * corpus: ADC-only recall@10 is 0.23–0.40 over nprobe 1–16, while
    * the reranked path tracks the COARSE CEILING (the fraction of true
    * neighbors whose list was probed — the only loss refine cannot
    * touch) within 0.05 at every nprobe (0.62 vs ceiling 0.64 at
    * nprobe 16). Absolute recall is corpus-geometry-bound: raise
    * nprobe to move the ceiling; the refine stage recovers what the
    * ceiling admits.
    *
    * Requires an index written with `storeVecs = true` (and appends
    * made through [[ivfPqAppendIndex]], which keeps the refine relation
    * in lockstep); fails loudly otherwise. Scale shape: the candidate
    * relation (nQueries × rerankR rows) is the SAME query-scale driver
    * bound as the probed-list IN; the vecs scan reads ≈ the candidates'
    * rows; the corpus is never shuffled. Output schema matches
    * [[ivfPqRerank]]: (query_id, neighbor_id, rank, cos_sim). */
  def ivfPqRerankPersistedQ(
      spark: SparkSession,
      indexDir: String,
      queries: DataFrame,
      k: Int,
      rerankR: Int,
      m: Int = 8,
      dims: Int = 64,
      centroidMod: Int = 97,
      nprobe: Int = 2,
      excludeSelf: Boolean = false): DataFrame = {
    require(rerankR >= k, s"rerankR=$rerankR must be >= k=$k")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val root = indexRoot(spark, indexDir)
    require(hasVecs(spark, root),
      s"no raw-vector relation at $root/vecs - write the index with " +
        "storeVecs = true to enable the exact re-rank stage")
    val qv = quantQueries(queries)
    val cand = adcTopK(ivfPqScoredPersistedQ(spark, indexDir, qv, m, dims,
      centroidMod, nprobe, excludeSelf), rerankR)
      .select(col("query_id"), col("neighbor_id"))
      .collect()
    require(cand.nonEmpty, "no ADC candidates to re-rank - empty index?")
    // candidate ids, driver-collected: nQueries × rerankR longs — the
    // same query-scale bound as the probed-list IN, pushed down so the
    // vecs scan reads only row groups that may hold a candidate
    val candIds = cand.map(_.getLong(1)).distinct.sorted.toIndexedSeq
    val candDf = broadcast(spark.createDataFrame(
      cand.toIndexedSeq.map(r => (r.getLong(0), r.getLong(1))))
      .toDF("query_id", "neighbor_id"))
    // same plan-size budget as the probed-list scan: candIds is
    // nQueries × rerankR distinct ids (B47's operating point is
    // already ~1000), so past the chunk budget the fetch switches to
    // ONE range-cover scan — exact membership is the candDf inner
    // join below either way
    val vecsTable = graft.ops.Layout.clusteredTable(spark, s"$root/vecs")
    val fetchThreshold = math.max(1, spark.conf
      .get("spark.sql.parquet.pushdown.inFilterThreshold", "10").toInt)
    val vecs =
      if (candIds.length <= fetchThreshold * MaxInChunks)
        graft.ops.Layout.chunkedIn(spark, vecsTable, "vec_id", candIds)
      else
        graft.ops.Layout.rangeCoverScan(spark, vecsTable, "vec_id", candIds)
    val qn = broadcast(qv
      .select(col("query_id"), col("v").as("qv"))
      .withColumn("qn", dot(col("qv"), col("qv"))))
    val exact = vecs
      .select(col("vec_id").as("neighbor_id"), col("v").as("cv"))
      .withColumn("cn", dot(col("cv"), col("cv")))
      .join(candDf, "neighbor_id")
      .join(qn, "query_id")
      .withColumn("cos_sim",
        round(dot(col("qv"), col("cv")) / (sqrt(col("qn")) * sqrt(col("cn"))), 6))
    val win = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    exact
      .withColumn("rank", row_number().over(win))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos_sim")
  }

  /** Candidate relation of [[ivfPqSearchPersisted]] before top-k —
    * exposed (like [[ivfPqScored]]) so ScaleBench B43 can read the
    * executed plan's scan metrics. */
  private[graft] def ivfPqScoredPersisted(
      spark: SparkSession,
      indexDir: String,
      embeddings: DataFrame,
      nQueries: Int,
      m: Int,
      dims: Int,
      centroidMod: Int,
      nprobe: Int): DataFrame =
    ivfPqScoredPersistedQ(spark, indexDir,
      prefixQueries(embeddings, nQueries), m, dims, centroidMod, nprobe,
      excludeSelf = true)

  /** The ONE copy of the persisted-index candidate scan, over an
    * explicit (query_id, v) query relation. Index rows come from the
    * lifecycle reader ([[graft.ops.Layout.clusteredTable]]), so
    * tombstoned neighbors ([[ivfPqDeleteIndex]]) are masked, and the
    * probed-list predicate is CHUNKED to the session's parquet
    * IN-pushdown threshold: above
    * `spark.sql.parquet.pushdown.inFilterThreshold` values Spark
    * silently degrades a pushed In to a [min,max] range — which
    * un-prunes the scan exactly when a workload probes many lists — so
    * the scan is a union of ≤-threshold-sized In reads over the SORTED
    * probed lists (each chunk a contiguous list range, so its row-group
    * pruning stays tight). PlanSpec pins both the pushed In and the
    * above-threshold chunking. */
  private[graft] def ivfPqScoredPersistedQ(
      spark: SparkSession,
      indexDir: String,
      qv: DataFrame,
      m: Int,
      dims: Int,
      centroidMod: Int,
      nprobe: Int,
      excludeSelf: Boolean): DataFrame = {
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val subDim = dims / m
    val root = indexRoot(spark, indexDir)
    val cents = centsCached(spark, root)
    val probes = ivfProbesQ(qv, cents, nprobe)
    // the probed-list UNION, driver-collected: nQueries × nprobe longs.
    // isInCollection emits an In predicate the parquet source accepts,
    // so row groups whose [min,max] list range misses every probed list
    // are dropped at the scan — bytes read ≈ probed fraction.
    val probedLists = probes.select("list_id").distinct()
      .collect().map(_.getLong(0)).toIndexedSeq.sorted
    require(probedLists.nonEmpty,
      "no probed lists - is the query relation empty?")
    // plan-size bound (r19): the chunked IN is exact at the scan but
    // its union grows O(probes / threshold) — a workload probing tens
    // of thousands of lists would build a hundred-scan plan. Above a
    // fixed chunk budget, switch to ONE scan under an OR-of-BETWEEN
    // cover of ≤ 64 merged list ranges: a SUPERSET is safe here
    // because the broadcast probe equi-join below is the exact
    // membership filter — admitted extras cost scan rows (adjacent
    // row groups on the list-clustered layout), never wrong results.
    // PlanSpec pins both regimes and their equality.
    val threshold = math.max(1, spark.conf
      .get("spark.sql.parquet.pushdown.inFilterThreshold", "10").toInt)
    val table = graft.ops.Layout.clusteredTable(spark, s"$root/codes")
    val index =
      if (probedLists.length <= threshold * MaxInChunks)
        graft.ops.Layout.chunkedIn(spark, table, "list_id", probedLists)
      else
        graft.ops.Layout.rangeCoverScan(spark, table, "list_id",
          probedLists)
    val books = subspaceBooks(bookDfCached(spark, root), m, subDim)
    // LUT side broadcast-hinted (r22): query-scale both sides, but the
    // planner's estimates fall back to a sort-merge join of two tiny
    // relations inside a subtree that is broadcast anyway
    val probeLut = probes
      .join(broadcast(adcLutFrom(qv, books, m, subDim, centroidMod)),
        "query_id")
    val joined = index.join(broadcast(probeLut), Seq("list_id"))
    val kept =
      if (excludeSelf) joined.where(col("neighbor_id") =!= col("query_id"))
      else joined
    val scored = kept.select(col("query_id"), col("neighbor_id"),
      adcSum(m, centroidMod).as("adc_dist"))
    // a spill-written index surfaces a vector once per probed copy —
    // identical adc_dist each time (non-residual codes are shared), so
    // a min-dedup (partial-aggregatable map-side) restores one row per
    // (query, neighbor) before top-k; single-assignment indexes skip
    // the extra exchange entirely
    if (spillDegree(spark, root) <= 1) scored
    else scored.groupBy("query_id", "neighbor_id")
      .agg(min("adc_dist").as("adc_dist"))
  }

  /** Tombstone index entries by vector id — FAISS `remove_ids` as
    * merge-on-read: `vecIds` (a `vec_id` column) land in
    * `indexDir/codes/deletes`, every search masks them immediately, and
    * the next [[ivfPqOptimizeIndex]] consolidation pass (triggered by
    * `maxGenerations`, or [[graft.ops.Layout.clusteredConsolidate]]
    * directly) rewrites them away and retires the tombstones. Deleting
    * then re-appending the same vec_id requires a consolidate in
    * between — the [[graft.ops.Layout.tombstone]] contract. */
  def ivfPqDeleteIndex(
      spark: SparkSession,
      indexDir: String,
      vecIds: DataFrame): Unit = {
    val root = indexRoot(spark, indexDir)
    if (hasVecs(spark, root))
      // disjoint tombstone dirs — overlapped (guide §2.6)
      graft.Par.run(
        () => graft.ops.Layout.tombstone(spark, s"$root/codes",
          "neighbor_id",
          vecIds.select(col("vec_id").cast("long").as("neighbor_id"))),
        () => graft.ops.Layout.tombstone(spark, s"$root/vecs", "vec_id",
          vecIds.select(col("vec_id").cast("long").as("vec_id"))))
    else
      graft.ops.Layout.tombstone(spark, s"$root/codes", "neighbor_id",
        vecIds.select(col("vec_id").cast("long").as("neighbor_id")))
  }

  // --- Lloyd-trained PQ codebooks (fixed ksub) ---------------------------
  //
  // pqCodebooks/pqEncode take the deterministic vec_id ≡ 0 (mod
  // centroidMod) SUBSET as the codebook, so ksub = N/centroidMod GROWS
  // with the corpus — at 100× the driver-collect bound trips and every
  // caller must re-tune centroidMod. FAISS instead TRAINS a fixed
  // ksub (=256) per subspace by k-means (Jégou 2011 §III.A) on a
  // training sample; codebook size is then scale-INVARIANT. The trainer
  // below is Lloyd's algorithm run relationally: the assignment step is
  // the pqEncode kernel itself (one narrow codegen'd projection over
  // the training set), the update step a (sub, code, dim) mean — a
  // map-side-combinable aggregate to m·ksub·subDim rows, metadata-sized
  // by construction. A fixed iteration count and deterministic
  // initialization (the ksub smallest training vec_ids, centroid index
  // = rank) keep the whole pipeline engine-replayable: centroids stay
  // integer-valued (means are rounded to 0 dp — milli-unit ints are
  // closed under this), so every distance is exact and the DuckDB
  // oracle reproduces training bit-for-bit (gate q_pq_trained).
  // ScaleBench B33t certifies recall ≥ the subset codebook's at equal
  // index bytes (same ksub).

  /** Lloyd-trained PQ codebooks at fixed `ksub`: `iters` rounds of
    * assign (nearest centroid, exact integer d², tie → lower index) +
    * update (per-dimension mean, rounded to integer; empty clusters
    * keep their previous centroid) over the training subset
    * vec_id ≡ 0 (mod trainMod). Returns ksub × dims centroid rows,
    * centroid c's subspace-s entries at [s·subDim, (s+1)·subDim) —
    * codes from these books are INDICES 0..ksub−1, not vec_ids.
    *
    * Driver footprint: the ksub init rows plus m·ksub·subDim update
    * cells per iteration — fixed by (m, ksub, dims), INDEPENDENT of
    * corpus size; the per-iteration scan is one pqEncode projection +
    * one combinable aggregate over the training subset. */
  def pqTrainCodebooks(
      embeddings: DataFrame,
      m: Int = 8,
      dims: Int = 64,
      ksub: Int = 256,
      iters: Int = 3,
      trainMod: Int = 1): Array[Array[Double]] = {
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    require(ksub >= 1 && iters >= 0 && trainMod >= 1,
      s"bad ksub=$ksub / iters=$iters / trainMod=$trainMod")
    val subDim = dims / m
    val train = embeddings
      .where(col("vec_id") % trainMod === 0)
      .select(col("vec_id"), quantize(col("embedding")).as("v"))
    val initRows = train.orderBy("vec_id").limit(ksub).collect()
    require(initRows.length == ksub,
      s"training subset ${initRows.length} rows < ksub=$ksub; lower trainMod")
    var books: Array[Array[Double]] =
      initRows.map(_.getSeq[Double](1).toArray)
    val ids = Array.tabulate(ksub)(_.toLong)
    var it = 0
    while (it < iters) {
      val updates = train
        .select(col("v"), graft.functions.PqEncodeExpr.col(
          col("v"), books, ids, m, subDim).as("codes"))
        .select(col("v"), posexplode(col("codes")).as(Seq("sub", "code")))
        .withColumn("vs", slice(col("v"), col("sub") * subDim + 1, lit(subDim)))
        .select(col("sub"), col("code"), posexplode(col("vs")).as(Seq("d", "x")))
        .groupBy("sub", "code", "d")
        .agg(round(sum("x") / count(lit(1)), 0).as("cx"))
        .collect()
      val next = books.map(_.clone())
      updates.foreach { r =>
        next(r.getLong(1).toInt)(r.getInt(0) * subDim + r.getInt(2)) =
          r.getDouble(3)
      }
      books = next
      it += 1
    }
    books
  }

  /** [[pqEncode]] with [[pqTrainCodebooks]] — the scale-invariant form:
    * codebook size is ksub regardless of corpus size. `codes[s]` is the
    * trained centroid INDEX (0..ksub−1) for subspace s. */
  def pqEncodeTrained(
      embeddings: DataFrame,
      m: Int = 8,
      dims: Int = 64,
      ksub: Int = 256,
      iters: Int = 3,
      trainMod: Int = 1): DataFrame = {
    val subDim = dims / m
    val books = pqTrainCodebooks(embeddings, m, dims, ksub, iters, trainMod)
    embeddings.select(col("vec_id"),
      graft.functions.PqEncodeExpr.col(
        quantize(col("embedding")), books, Array.tabulate(ksub)(_.toLong),
        m, subDim).as("codes"))
  }

  /** [[pqSearch]] over the TRAINED codebooks: same ADC shape (per-query
    * LUT broadcast against the encoded corpus, m-term exact BIGINT
    * sum), codebook entries indexed directly (codes are indices, so the
    * LUT fold runs with divisor 1). ScaleBench B33t REQUIREs recall ≥
    * the subset-codebook pqSearch at the same ksub. */
  def pqSearchTrained(
      embeddings: DataFrame,
      nQueries: Int,
      k: Int,
      m: Int = 8,
      dims: Int = 64,
      ksub: Int = 256,
      iters: Int = 3,
      trainMod: Int = 1): DataFrame =
    pqSearchTrainedCore(embeddings, prefixQueries(embeddings, nQueries), k,
      m, dims, ksub, iters, trainMod, excludeSelf = true)

  /** [[pqSearchTrained]] serving a STANDALONE (query_id, embedding)
    * query relation — see [[ivfPqSearchPersistedQ]] for the signature
    * rationale and the `excludeSelf` contract. */
  def pqSearchTrainedQ(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      m: Int = 8,
      dims: Int = 64,
      ksub: Int = 256,
      iters: Int = 3,
      trainMod: Int = 1,
      excludeSelf: Boolean = false): DataFrame =
    pqSearchTrainedCore(embeddings, quantQueries(queries), k, m, dims,
      ksub, iters, trainMod, excludeSelf)

  private def pqSearchTrainedCore(
      embeddings: DataFrame,
      qv: DataFrame,
      k: Int,
      m: Int,
      dims: Int,
      ksub: Int,
      iters: Int,
      trainMod: Int,
      excludeSelf: Boolean): DataFrame = {
    val subDim = dims / m
    val spark = embeddings.sparkSession
    val books = pqTrainCodebooks(embeddings, m, dims, ksub, iters, trainMod)
    val ids = Array.tabulate(ksub)(_.toLong)
    // trained books as a metadata relation for the LUT build
    val bookRows = for { c <- books.indices; s <- 0 until m } yield
      (s, c.toLong, books(c).slice(s * subDim, (s + 1) * subDim).toSeq)
    val booksDf = spark.createDataFrame(bookRows).toDF("sub", "centroid_id", "cs")
      .withColumn("cn", dot(col("cs"), col("cs")))
    val perEntry = qv
      .withColumn("sub", explode(lit((0 until m).toArray)))
      .withColumn("vs", slice(col("v"), col("sub") * subDim + 1, lit(subDim)))
      .withColumn("vn", dot(col("vs"), col("vs")))
      .join(broadcast(booksDf), Seq("sub"))
      .select(col("query_id"), col("sub"), col("centroid_id"),
        (col("vn") - lit(2) * dot(col("vs"), col("cs")) + col("cn")).as("pd"))
    val lutArr = lutFold(perEntry, Seq("query_id"), 1)
    val joined = embeddings
      .select(col("vec_id").as("neighbor_id"),
        graft.functions.PqEncodeExpr.col(
          quantize(col("embedding")), books, ids, m, subDim).as("codes"))
      .crossJoin(broadcast(lutArr))
    val kept =
      if (excludeSelf) joined.where(col("neighbor_id") =!= col("query_id"))
      else joined
    adcTopK(kept.select(col("query_id"), col("neighbor_id"),
      adcSum(m, 1).as("adc_dist")), k)
  }

  // --- Lloyd-trained coarse quantizer (fixed nlists) ---------------------
  //
  // The same scale-invariance story as [[pqTrainCodebooks]], for the
  // OTHER half of the IVF+PQ index: [[ivfAssign]]'s coarse centroids are
  // the vec_id ≡ 0 (mod coarseMod) subset, so nlists = N/coarseMod grows
  // with the corpus; FAISS trains a FIXED nlists by k-means. Assignment
  // is by max cosine — and cosine is invariant to centroid scaling, so
  // the plain per-dimension mean update IS spherical k-means (the
  // normalization step changes nothing the assignment can see) — with
  // the same determinism contract: init = the nlists smallest training
  // vec_ids (list index = rank), fixed iterations, means rounded to
  // integer, cosine rounded to 6 dp with ties to the lower list index.
  // Gate q_ivf_trained replays training + the full-corpus assignment in
  // DuckDB; ScaleBench B45 proves the fully-trained composition at 1M.

  /** Lloyd-trained coarse centroids at fixed `nlists`: `iters` rounds of
    * (max-rounded-cosine assign, tie → lower index) + (per-dim mean,
    * rounded to integer; empty lists keep their centroid) over the
    * vec_id ≡ 0 (mod trainMod) subset. Returns nlists × dims rows —
    * list ids are INDICES 0..nlists−1. Driver footprint: nlists × dims
    * cells per iteration, corpus-size-independent. */
  def ivfTrainCentroids(
      embeddings: DataFrame,
      dims: Int = 64,
      nlists: Int = 16,
      iters: Int = 2,
      trainMod: Int = 1): Array[Array[Double]] = {
    require(nlists >= 1 && iters >= 0 && trainMod >= 1,
      s"bad nlists=$nlists / iters=$iters / trainMod=$trainMod")
    val spark = embeddings.sparkSession
    val train = embeddings
      .where(col("vec_id") % trainMod === 0)
      .select(col("vec_id"), quantize(col("embedding")).as("v"))
    val initRows = train.orderBy("vec_id").limit(nlists).collect()
    require(initRows.length == nlists,
      s"training subset ${initRows.length} rows < nlists=$nlists; lower trainMod")
    var cents: Array[Array[Double]] = initRows.map(_.getSeq[Double](1).toArray)
    val listIds = Array.tabulate(nlists)(_.toLong)
    var it = 0
    while (it < iters) {
      // assignment as the narrow kernel (r22): the former relational
      // assign paid a crossJoin + argmax exchange + a train-set
      // self-join on vec_id PER ITERATION — the assignment is a pure
      // per-row function of v against the driver-resident centroids
      val updates = train
        .select(element_at(graft.functions.IvfTopListsExpr.col(
          col("v"), cents, listIds, 1), 1).as("list_id"),
          posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("list_id", "d")
        .agg(round(sum("x") / count(lit(1)), 0).as("cx"))
        .collect()
      val next = cents.map(_.clone())
      updates.foreach { r =>
        next(r.getLong(0).toInt)(r.getInt(1)) = r.getDouble(2)
      }
      cents = next
      it += 1
    }
    cents
  }

  /** [[ivfAssign]] against TRAINED centroids: every vector to its
    * max-rounded-cosine trained list (tie → lower index) —
    * `(vec_id, list_id)`, list ids 0..nlists−1. */
  def ivfAssignTrained(
      embeddings: DataFrame,
      dims: Int = 64,
      nlists: Int = 16,
      iters: Int = 2,
      trainMod: Int = 1): DataFrame = {
    val cents = ivfTrainCentroids(embeddings, dims, nlists, iters, trainMod)
    // narrow kernel over the corpus scan (r22) — the relational assign
    // aggregate's exchange removed; arithmetic contract identical
    embeddings.select(col("vec_id"),
      element_at(graft.functions.IvfTopListsExpr.col(
        quantize(col("embedding")), cents,
        Array.tabulate(nlists)(_.toLong), 1), 1).as("list_id"))
  }

  /** Trained centroids as a metadata relation (list_id, cv, cn). */
  private def centsDf(
      spark: SparkSession, cents: Array[Array[Double]]): DataFrame =
    spark.createDataFrame(
      cents.toIndexedSeq.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) })
      .toDF("list_id", "cv")
      .withColumn("cn", dot(col("cv"), col("cv")))

  /** FULLY-trained IVF+PQ search — [[ivfPqSearch]] with BOTH index
    * halves scale-invariant: trained coarse lists ([[ivfTrainCentroids]],
    * fixed nlists) and trained PQ codebooks ([[pqTrainCodebooks]], fixed
    * ksub) — the complete FAISS IVFPQ training recipe (coarse k-means +
    * per-subspace k-means, Jégou 2011 §III–IV, by_residual=false). Scan
    * shape identical to [[ivfPqSearch]]: encoded corpus equi-joined on
    * `list_id` against a broadcast (query, probed list, LUT) relation,
    * ~nprobe/nlists of the corpus scored. Same determinism contract as
    * every trained path; gate q_ivfpq_trained replays both trainings +
    * the composed search in DuckDB. */
  def ivfPqSearchTrainedFull(
      embeddings: DataFrame,
      nQueries: Int,
      k: Int,
      m: Int = 8,
      dims: Int = 64,
      ksub: Int = 16,
      nlists: Int = 8,
      iters: Int = 1,
      trainMod: Int = 1,
      nprobe: Int = 2): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    adcTopK(ivfPqScoredTrainedFull(embeddings, nQueries, m, dims, ksub,
      nlists, iters, trainMod, nprobe), k)
  }

  /** Candidate relation of [[ivfPqSearchTrainedFull]] before top-k —
    * exposed for ScaleBench B45's scanned-fraction REQUIRE. */
  private[graft] def ivfPqScoredTrainedFull(
      embeddings: DataFrame,
      nQueries: Int,
      m: Int,
      dims: Int,
      ksub: Int,
      nlists: Int,
      iters: Int,
      trainMod: Int,
      nprobe: Int): DataFrame = {
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val subDim = dims / m
    val spark = embeddings.sparkSession
    val coarse = ivfTrainCentroids(embeddings, dims, nlists, iters, trainMod)
    val books = pqTrainCodebooks(embeddings, m, dims, ksub, iters, trainMod)
    val ids = Array.tabulate(ksub)(_.toLong)
    val cents = centsDf(spark, coarse)
    // index: trained codes + trained coarse list per vector — ONE
    // corpus pass for BOTH halves (r22: the assign kernel rides the
    // encode projection; the former broadcast-assign aggregate paid a
    // corpus-scale groupBy exchange plus a vec_id self-join); in
    // production this is what ivfPqWriteIndex persists (same
    // (neighbor_id, list_id, codes) schema)
    val index = embeddings
      .select(col("vec_id").as("neighbor_id"),
        element_at(graft.functions.IvfTopListsExpr.col(
          quantize(col("embedding")), coarse,
          Array.tabulate(nlists)(_.toLong), 1), 1).as("list_id"),
        graft.functions.PqEncodeExpr.col(
          quantize(col("embedding")), books, ids, m, subDim).as("codes"))
    // probes: nprobe best trained lists per query (same rounded-cosine
    // + lower-index tie-break as the assignment)
    val probeWin = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("list_id"))
    val probes = embeddings
      .where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), quantize(col("embedding")).as("v"))
      .withColumn("n", dot(col("v"), col("v")))
      .crossJoin(broadcast(cents))
      .withColumn("cos_sim",
        round(dot(col("v"), col("cv")) / (sqrt(col("n")) * sqrt(col("cn"))), 6))
      .withColumn("rn", row_number().over(probeWin))
      .where(col("rn") <= nprobe)
      .select("query_id", "list_id")
    // per-query LUT from the trained books (indices, divisor 1)
    val bookRows = for { c <- books.indices; s <- 0 until m } yield
      (s, c.toLong, books(c).slice(s * subDim, (s + 1) * subDim).toSeq)
    val booksDf = spark.createDataFrame(bookRows).toDF("sub", "centroid_id", "cs")
      .withColumn("cn", dot(col("cs"), col("cs")))
    val perEntry = embeddings
      .where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), quantize(col("embedding")).as("v"))
      .withColumn("sub", explode(lit((0 until m).toArray)))
      .withColumn("vs", slice(col("v"), col("sub") * subDim + 1, lit(subDim)))
      .withColumn("vn", dot(col("vs"), col("vs")))
      .join(broadcast(booksDf), Seq("sub"))
      .select(col("query_id"), col("sub"), col("centroid_id"),
        (col("vn") - lit(2) * dot(col("vs"), col("cs")) + col("cn")).as("pd"))
    // broadcast-hinted for the same reason as ivfPqScoredQ's assembly
    // join (query-scale both sides; estimates defeated by the window)
    val probeLut = probes.join(
      broadcast(lutFold(perEntry, Seq("query_id"), 1)), "query_id")
    index
      .join(broadcast(probeLut), Seq("list_id"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        adcSum(m, 1).as("adc_dist"))
  }

  /** Coarse-centroid relation (list_id, cv, cn) — metadata-sized,
    * broadcast at every use site. */
  private[graft] def coarseCents(embeddings: DataFrame, coarseMod: Int): DataFrame =
    embeddings
      .where(col("vec_id") % coarseMod === 0)
      .select(col("vec_id").as("list_id"), quantize(col("embedding")).as("cv"))
      .withColumn("cn", dot(col("cv"), col("cv")))

  /** The query-prefix convention as a (query_id, v) relation: queries
    * are the corpus rows vec_id < nQueries, quantized — the fixture
    * form every `nQueries`-taking operator uses. */
  private def prefixQueries(embeddings: DataFrame, nQueries: Int): DataFrame =
    embeddings
      .where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), quantize(col("embedding")).as("v"))

  /** A STANDALONE (query_id, embedding) relation as the internal
    * (query_id, v) quantized form — the production query shape (FAISS's
    * `index.search(xq, k)`: queries need not live in the corpus). */
  private def quantQueries(queries: DataFrame): DataFrame =
    queries.select(col("query_id").cast("long").as("query_id"),
      quantize(col("embedding")).as("v"))

  /** nprobe nearest coarse lists per query (query_id, list_id) — the
    * ONE copy of the probe-selection contract: the same rounded-cosine
    * + (cos desc, list_id) tie-break arithmetic as [[ivfAssign]], kept
    * to rank ≤ nprobe, shared by the raw and residual IVF+PQ paths so
    * a tie-break or rounding change can never diverge them. */
  private[graft] def ivfProbes(
      embeddings: DataFrame,
      cents: DataFrame,
      nQueries: Int,
      nprobe: Int): DataFrame =
    ivfProbesQ(prefixQueries(embeddings, nQueries), cents, nprobe)

  /** [[ivfProbes]] over an explicit (query_id, v) query relation. */
  private[graft] def ivfProbesQ(
      qv: DataFrame,
      cents: DataFrame,
      nprobe: Int): DataFrame = {
    val probeWin = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("list_id"))
    qv
      .withColumn("n", dot(col("v"), col("v")))
      .crossJoin(broadcast(cents))
      .withColumn("cos_sim",
        round(dot(col("v"), col("cv")) / (sqrt(col("n")) * sqrt(col("cn"))), 6))
      .withColumn("rn", row_number().over(probeWin))
      .where(col("rn") <= nprobe)
      .select("query_id", "list_id")
  }

  /** Fold per-(group, sub, centroid) distances into nested positional
    * LUT arrays luts[s][ci] — the ONE copy of the array_sort/
    * collect_list fold, shared by the per-query (raw) and
    * per-(query, list) (residual) LUT builders. Input needs columns
    * `sub`, `centroid_id`, `pd`. */
  private def lutFold(
      pd: DataFrame, groupCols: Seq[String], centroidMod: Int): DataFrame =
    pd.withColumn("ci", (col("centroid_id") / centroidMod).cast("int"))
      .groupBy((groupCols :+ "sub").map(col): _*)
      .agg(transform(
        array_sort(collect_list(struct(col("ci"), col("pd")))),
        x => x.getField("pd")).as("subArr"))
      .groupBy(groupCols.map(col): _*)
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("subArr")))),
        x => x.getField("subArr")).as("luts"))

  /** IVF+PQ with RESIDUAL quantization — the FAISS IVFPQ DEFAULT
    * (`by_residual=true`, Jégou 2011 §IV.C): codes quantize x − c(list)
    * instead of x. Residuals concentrate near the origin, so the same
    * m-code budget spends its resolution on the within-cell offset
    * rather than re-describing the cell — better recall at identical
    * index bytes, the reason FAISS defaults to it.
    *
    * Structural consequence: the ADC lookup table becomes PER
    * (query, probed list) — the table is built against the query
    * residual q − c(list), which differs per probed list — and that is
    * EXACTLY the (query, list) relation the composed join already
    * broadcasts ([[ivfPqScored]]'s probeLut), so the scan shape is
    * unchanged: an equi-join of the residual-encoded corpus against
    * nQueries·nprobe broadcast LUT rows on `list_id`, scanning
    * ~nprobe/nlists of the corpus. Residual codebooks are trained on
    * the residuals of the same deterministic subset (vec_id ≡ 0 mod
    * centroidMod). All arithmetic stays exact: quantized milli-unit
    * integers are closed under subtraction, so residual vectors,
    * codebooks and LUT entries remain integer-valued doubles and the
    * ADC sum is an exact BIGINT — engine-portable for the gate oracle.
    * Same two approximation sources as [[ivfPqSearch]] (quantization
    * error — smaller here, ScaleBench-certified — and coarse pruning). */
  def ivfPqResidualSearch(
      embeddings: DataFrame,
      nQueries: Int,
      k: Int,
      m: Int = 8,
      dims: Int = 64,
      centroidMod: Int = 97,
      coarseMod: Int = 83,
      nprobe: Int = 2): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    adcTopK(ivfPqResidualScored(
      embeddings, nQueries, m, dims, centroidMod, coarseMod, nprobe), k)
  }

  /** The relations of a residual IVF+PQ index: coarse centroids
    * (metadata-sized, broadcast), per-vector residuals, and the
    * residual-encoded index — split out so specs can pin the index
    * contents (codes trained on RESIDUALS, not raw vectors)
    * independently of the search join. In production the `index`
    * relation is what gets persisted. */
  private[graft] final case class ResidualIndex(
      cents: DataFrame, resid: DataFrame, index: DataFrame, subDim: Int)

  private[graft] def buildResidualIndex(
      embeddings: DataFrame,
      m: Int,
      dims: Int,
      centroidMod: Int,
      coarseMod: Int): ResidualIndex = {
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val subDim = dims / m
    // coarse lists: the shared [[coarseCents]] relation (metadata-sized)
    val cents = coarseCents(embeddings, coarseMod)
    // residual per vector vs its assigned list's centroid — the
    // assignment is the narrow kernel (r22: the former corpus-scale
    // assign aggregate + vec_id self-join removed); only the
    // metadata-sized broadcast join that fetches the centroid VECTOR
    // remains. `get` (null past the end) keeps the degenerate
    // empty-centroid case identical to the old inner-join-empty form:
    // null list_id matches nothing, resid comes out empty.
    val (cIds, cVs) = coarseCentArrays(embeddings, coarseMod)
    val resid = embeddings
      .select(col("vec_id"), quantize(col("embedding")).as("v"))
      .withColumn("list_id", get(graft.functions.IvfTopListsExpr.col(
        col("v"), cVs, cIds, 1), lit(0)))
      .join(broadcast(cents.select("list_id", "cv")), "list_id")
      .withColumn("rv", zip_with(col("v"), col("cv"), (a, b) => a - b))
      .select("vec_id", "list_id", "rv")
    // residual codebooks: the deterministic subset's RESIDUALS
    val centRows = resid
      .where(col("vec_id") % centroidMod === 0)
      .select("vec_id", "rv")
      .collect()
      .sortBy(_.getLong(0))
    require(centRows.nonEmpty, "empty residual PQ codebook")
    require(centRows.length.toLong * dims <= (16L << 20),
      s"codebook ${centRows.length}x$dims exceeds the driver bound; " +
        "raise centroidMod")
    val ids = centRows.map(_.getLong(0))
    val cbooks = centRows.map(_.getSeq[Double](1).toArray)
    // index: residual codes + coarse list per vector (one narrow
    // codegen'd projection — the pqEncode kernel, fed residuals)
    val index = resid.select(
      col("vec_id").as("neighbor_id"), col("list_id"),
      graft.functions.PqEncodeExpr.col(col("rv"), cbooks, ids, m, subDim).as("codes"))
    ResidualIndex(cents, resid, index, subDim)
  }

  /** Candidate relation of [[ivfPqResidualSearch]] before top-k —
    * exposed for ScaleBench's scanned-row REQUIRE, like
    * [[ivfPqScored]]. */
  private[graft] def ivfPqResidualScored(
      embeddings: DataFrame,
      nQueries: Int,
      m: Int,
      dims: Int,
      centroidMod: Int,
      coarseMod: Int,
      nprobe: Int): DataFrame = {
    val spark = embeddings.sparkSession
    val ri = buildResidualIndex(embeddings, m, dims, centroidMod, coarseMod)
    val ResidualIndex(cents, resid, index, subDim) = ri
    // residual codebook subvectors, relational (metadata-sized)
    val rbooks = resid
      .where(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("centroid_id"), col("rv"))
      .withColumn("sub", explode(lit((0 until m).toArray)))
      .withColumn("cs", slice(col("rv"), col("sub") * subDim + 1, lit(subDim)))
      .withColumn("cn", dot(col("cs"), col("cs")))
      .select("sub", "centroid_id", "cs", "cn")
    // probes: the shared [[ivfProbes]] contract (ivfAssign's exact
    // rounded-cosine + tie-break arithmetic, kept to rank ≤ nprobe)
    val probes = ivfProbes(embeddings, cents, nQueries, nprobe)
    val qv = embeddings
      .where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), quantize(col("embedding")).as("v"))
    // per-(query, probed list) LUT against the query residual
    // q − c(list): nQueries × nprobe × m × ksub rows collapse to
    // nQueries × nprobe nested-array rows — broadcast
    val perEntry = probes
      .join(qv, "query_id")
      .join(broadcast(cents.select("list_id", "cv")), "list_id")
      .withColumn("qr", zip_with(col("v"), col("cv"), (a, b) => a - b))
      .withColumn("sub", explode(lit((0 until m).toArray)))
      .withColumn("vs", slice(col("qr"), col("sub") * subDim + 1, lit(subDim)))
      .withColumn("vn", dot(col("vs"), col("vs")))
      .join(broadcast(rbooks), Seq("sub"))
      .select(col("query_id"), col("list_id"), col("sub"), col("centroid_id"),
        (col("vn") - lit(2) * dot(col("vs"), col("cs")) + col("cn")).as("pd"))
    val probeLut = lutFold(perEntry, Seq("query_id", "list_id"), centroidMod)
    index
      .join(broadcast(probeLut), Seq("list_id"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        adcSum(m, centroidMod).as("adc_dist"))
  }

  /** Per-query ADC lookup tables as m positional arrays
    * (luts[s][ci] = pd, ci = centroid_id / centroidMod — pqCodebooks
    * takes every centroidMod-th vec_id, so the division is the exact
    * dense index). nQueries × m × ksub longs — metadata-sized, always
    * broadcast by callers. */
  private def adcLutArr(
      embeddings: DataFrame,
      nQueries: Int,
      m: Int,
      dims: Int,
      centroidMod: Int): DataFrame =
    adcLutFrom(
      embeddings
        .where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"),
          quantize(col("embedding")).as("v")),
      pqCodebooks(embeddings, m, dims, centroidMod),
      m, dims / m, centroidMod)

  /** Per-query LUTs from explicit (query_id, v) and codebook relations —
    * the ONE copy of the LUT join, shared by the in-plan builder above
    * and the persisted-index search (whose codebook comes from
    * `dir/book`, not a corpus re-scan). */
  private def adcLutFrom(
      queries: DataFrame,
      books: DataFrame,
      m: Int,
      subDim: Int,
      centroidMod: Int): DataFrame = {
    val spark = queries.sparkSession
    val perEntry = queries
      .withColumn("sub", explode(lit((0 until m).toArray)))
      .withColumn("vs", slice(col("v"), col("sub") * subDim + 1, lit(subDim)))
      .withColumn("vn", dot(col("vs"), col("vs")))
      .join(broadcast(books), Seq("sub"))
      .select(col("query_id"), col("sub"), col("centroid_id"),
        (col("vn") - lit(2) * dot(col("vs"), col("cs")) + col("cn")).as("pd"))
    lutFold(perEntry, Seq("query_id"), centroidMod)
  }

  /** The m-term ADC estimate over a `codes` row against the broadcast
    * `luts` column. A neighbor's m codes sit in ONE row of the encoded
    * corpus, so the estimate is m positional lookups into the LUT — the
    * scan never explodes the codes and never aggregates (query,
    * neighbor) groups. (The explode-join-reaggregate shape shuffled an
    * nQueries·N-group aggregate: 273 s at 1M×100 where this plan is
    * seconds.) The m-term sum is unrolled as plain codegen'd element_at
    * chains, not a higher-order aggregate (HOF lambdas stay outside
    * whole-stage codegen). pd is an integer-valued double (quantized
    * milli-unit arithmetic); the sum is exact in binary FP, cast once. */
  private def adcSum(m: Int, centroidMod: Int): Column =
    (0 until m).map { s =>
      element_at(
        element_at(col("luts"), s + 1),
        (element_at(col("codes"), s + 1) / centroidMod).cast("int") + 1)
    }.reduce(_ + _).cast("long")

  /** Deterministic (dist asc, neighbor_id) top-k per query in two
    * phases (the Bm25 idiom): a salted window bounds every sort run,
    * then the final per-query window ranks only 64·k survivors per
    * query — no single-task sort of the corpus. */
  private def adcTopK(scored: DataFrame, k: Int): DataFrame = {
    val bySalt = Window
      .partitionBy(col("query_id"), pmod(col("neighbor_id"), lit(64)))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    val byQuery = Window.partitionBy("query_id")
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored
      .withColumn("_sr", row_number().over(bySalt))
      .where(col("_sr") <= k)
      .withColumn("rank", row_number().over(byQuery))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "adc_dist")
  }
}
