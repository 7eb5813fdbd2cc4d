package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** r22 pins the native coarse-assignment kernel
  * ([[graft.functions.IvfTopListsExpr]], which replaced the relational
  * crossJoin + argmax + self-join at every IVF+PQ build/search site)
  * bit-equal to the relational form — including the rounded-cosine
  * arithmetic, the (cos desc, id asc) tie-break, and the NaN (zero
  * vector) ordering. */
class IvfTopListsSpec extends SparkSpec {

  // vec_id 0,3,6 are the centroids at mod 3; includes an exact cosine
  // tie (vec 5 vs centroids 0 and 3, same direction different scale)
  private def emb: DataFrame = {
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.2f, 0.9f, -0.4f, 0.1f)),
      (2L, Seq(-0.5f, 0.3f, 0.8f, -0.2f)),
      (3L, Seq(2.0f, 0.0f, 0.0f, 0.0f)), // same direction as centroid 0
      (4L, Seq(0.01f, -0.02f, 0.03f, 0.05f)),
      (5L, Seq(3.0f, 0.0f, 0.0f, 0.0f)), // ties centroids 0 and 3 exactly
      (6L, Seq(0.1f, -0.7f, 0.2f, 0.6f)),
      (7L, Seq(0.9f, 0.1f, 0.1f, -0.3f)),
      (8L, Seq(-0.2f, -0.2f, -0.9f, 0.4f)))
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
  }

  private def centArrays(mod: Int): (Array[Long], Array[Array[Double]]) = {
    val rows = emb.where(col("vec_id") % mod === 0)
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("v"))
      .collect().sortBy(_.getLong(0))
    (rows.map(_.getLong(0)), rows.map(_.getSeq[Double](1).toArray))
  }

  test("g=1 kernel equals the relational ivfAssign argmax (ties included)") {
    val (ids, cvs) = centArrays(3)
    val kernel = emb.select(col("vec_id"),
      element_at(graft.functions.IvfTopListsExpr.col(
        Similarity.quantize(col("embedding")), cvs, ids, 1), 1).as("list_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val relational = Similarity.ivfAssign(emb, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel == relational)
    // the tie case really is a tie resolved to the smaller id
    assert(kernel(5L) == 0L)
  }

  test("zero-magnitude vector fails loudly in BOTH forms (ANSI divide-by-zero)") {
    def hasArithmetic(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .exists(_.isInstanceOf[ArithmeticException])
    val zero = spark.createDataFrame(Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 0.0f))))
      .toDF("vec_id", "embedding")
    val (ids, cvs) = (Array(0L), Array(Array(1000.0, 0.0)))
    val eK = intercept[Throwable] {
      zero.select(element_at(graft.functions.IvfTopListsExpr.col(
        Similarity.quantize(col("embedding")), cvs, ids, 1), 1)).collect()
    }
    assert(hasArithmetic(eK), s"kernel threw $eK")
    val eR = intercept[Throwable] {
      Similarity.ivfAssign(zero, 1).collect()
    }
    assert(hasArithmetic(eR), s"relational threw $eR")
  }

  test("g>1 kernel equals iterated argmax-with-exclusion (the old trainedAssignG)") {
    val (ids, cvs) = centArrays(3)
    val vecs = emb.select(col("vec_id"),
      Similarity.quantize(col("embedding")).as("v"))
    val cents = emb.where(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("list_id"),
        Similarity.quantize(col("embedding")).as("cv"))
      .withColumn("cn", Similarity.dot(col("cv"), col("cv")))
    // relational reference: the pre-r22 iterated exclusion, verbatim
    def argmaxExcluding(prior: DataFrame): DataFrame =
      vecs.join(prior, "vec_id")
        .withColumn("n", Similarity.dot(col("v"), col("v")))
        .crossJoin(broadcast(cents))
        .where(!array_contains(col("prior"), col("list_id")))
        .withColumn("cos_sim",
          round(Similarity.dot(col("v"), col("cv")) /
            (sqrt(col("n")) * sqrt(col("cn"))), 6))
        .groupBy("vec_id")
        .agg(max(struct(col("cos_sim"), (-col("list_id")).as("neg"))).as("w"))
        .select(col("vec_id"), (-col("w.neg")).as("list_id"))
    val first = argmaxExcluding(
      vecs.select(col("vec_id"), array().cast("array<long>").as("prior")))
    val second = argmaxExcluding(first
      .select(col("vec_id"), array(col("list_id")).as("prior")))
    val expected = collectSet(first.unionByName(second))
    val got = collectSet(emb.select(col("vec_id"),
      explode(graft.functions.IvfTopListsExpr.col(
        Similarity.quantize(col("embedding")), cvs, ids, 2)).as("list_id")))
    assert(got == expected)
  }

  test("g past the list count emits every list once, like the iterative form") {
    val (ids, cvs) = centArrays(3)
    val out = emb.where(col("vec_id") === 1L)
      .select(explode(graft.functions.IvfTopListsExpr.col(
        Similarity.quantize(col("embedding")), cvs, ids, 99)).as("list_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(out.sorted == ids.toSeq.sorted)
    assert(out.distinct.length == out.length)
  }

  test("window-ranked top-g agrees with the kernel (probe/assign contract)") {
    val (ids, cvs) = centArrays(3)
    val cents = emb.where(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("list_id"),
        Similarity.quantize(col("embedding")).as("cv"))
      .withColumn("cn", Similarity.dot(col("cv"), col("cv")))
    val win = Window.partitionBy("vec_id")
      .orderBy(col("cos_sim").desc, col("list_id"))
    val ranked = emb
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("v"))
      .withColumn("n", Similarity.dot(col("v"), col("v")))
      .crossJoin(broadcast(cents))
      .withColumn("cos_sim",
        round(Similarity.dot(col("v"), col("cv")) /
          (sqrt(col("n")) * sqrt(col("cn"))), 6))
      .withColumn("rn", row_number().over(win))
      .where(col("rn") <= 2)
      .select(col("vec_id"), col("list_id"))
    val got = collectSet(emb.select(col("vec_id"),
      explode(graft.functions.IvfTopListsExpr.col(
        Similarity.quantize(col("embedding")), cvs, ids, 2)).as("list_id")))
    assert(got == collectSet(ranked))
  }
}
