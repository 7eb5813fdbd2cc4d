package graft.profiles

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator for the weighted-profile merge on ARRAY columns —
  * the typed-Dataset variant of [[Profiles.combineWeighted]] promised by
  * SURVEY §2.7: input rows are (weight, ratio-vector); the result is the
  * weight-combined vector renormalized to sum 1 (all-zero → uniform,
  * the reference's `rescale_ratios` fallback,
  * emiproc/profiles/temporal/composite.py:29-45).
  *
  * Use when profiles live as one `Array[Double]` per row (the composite
  * block layout) rather than long (profile, pos, ratio) rows — a single
  * typed aggregation instead of join + window. */
class WeightedVectorMerge(dim: Int)
  extends Aggregator[(Double, Seq[Double]), Array[Double], Seq[Double]] {

  override def zero: Array[Double] = Array.fill(dim)(0.0)

  override def reduce(acc: Array[Double], in: (Double, Seq[Double])): Array[Double] = {
    val (w, v) = in
    require(v.length == dim, s"vector of length ${v.length}, expected $dim")
    var i = 0
    while (i < dim) { acc(i) += w * v(i); i += 1 }
    acc
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dim) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(acc: Array[Double]): Seq[Double] = {
    val s = acc.sum
    if (s == 0.0) Seq.fill(dim)(1.0 / dim)
    else acc.map(_ / s).toSeq
  }

  override def bufferEncoder: Encoder[Array[Double]] =
    Encoders.javaSerialization[Array[Double]]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
