package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** PQ code assignment as a NATIVE codegen'd kernel (M70's encode hot
  * loop): for each of m subspaces, the id of the codebook entry nearest
  * to the row's quantized subvector.
  *
  * Why an Expression: the relational form (explode m subspaces × join
  * the broadcast codebook × `min_by` re-aggregate) evaluates N·m·ksub
  * CANDIDATE ROWS — at 1M vectors × 8 × 245 that is 1.96G operator-rows
  * and ~100 s of row overhead for ~8 GFLOP of actual arithmetic. The
  * codebook is metadata-sized BY CONSTRUCTION (ksub = N/centroidMod,
  * chosen by the caller), so the scalable plan is one NARROW projection
  * with the codebook as a driver-collected reference object and the
  * argmin as a generated triple loop — no join, no aggregate, no
  * shuffle; encode throughput scales with cores.
  *
  * Arithmetic contract (gate-hash compatible with the relational form
  * and the DuckDB oracle): d² = vn − 2·dot + cn on quantized
  * integer-valued doubles, every sum in index order; cn is precomputed
  * per (sub, centroid) the same way; ties broken by ascending
  * centroid_id (strict `<` while iterating ids ascending — exactly
  * `min_by(centroid_id, (d2, centroid_id))`).
  *
  * @param cents  ksub × dims quantized centroid vectors, ascending id
  * @param ids    ksub centroid ids, ascending
  */
case class PqEncodeExpr(
    child: Expression,
    cents: Array[Array[Double]],
    ids: Array[Long],
    m: Int,
    subDim: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  // cn[s*ksub + c] = Σ_d cents(c)(s·subDim+d)², index order
  @transient private lazy val cn: Array[Double] = {
    val out = new Array[Double](m * cents.length)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < cents.length) {
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          val x = cents(c)(s * subDim + d)
          acc += x * x
          d += 1
        }
        out(s * cents.length + c) = acc
        c += 1
      }
      s += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Long](m)
    var s = 0
    while (s < m) {
      var vn = 0.0
      var d = 0
      while (d < subDim) {
        val x = v.getDouble(s * subDim + d)
        vn += x * x
        d += 1
      }
      var best = Double.PositiveInfinity
      var bestId = 0L
      var c = 0
      while (c < cents.length) {
        var dot = 0.0
        var i = 0
        while (i < subDim) {
          dot += v.getDouble(s * subDim + i) * cents(c)(s * subDim + i)
          i += 1
        }
        val d2 = vn - 2.0 * dot + cn(s * cents.length + c)
        if (d2 < best) { best = d2; bestId = ids(c) }
        c += 1
      }
      codes(s) = bestId
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "double[][]")
    val idsRef = ctx.addReferenceObj("pqIds", ids, "long[]")
    val cnRef = ctx.addReferenceObj("pqCn", cn, "double[]")
    val ksub = cents.length
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val vn = ctx.freshName("vn")
      val dot = ctx.freshName("dot")
      val d2 = ctx.freshName("d2")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      val x = ctx.freshName("x")
      val cc = ctx.freshName("cc")
      s"""
         |long[] $codes = new long[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double $vn = 0.0;
         |  for (int $d = 0; $d < $subDim; $d++) {
         |    double $x = $v.getDouble($s * $subDim + $d);
         |    $vn += $x * $x;
         |  }
         |  double $best = Double.POSITIVE_INFINITY;
         |  long $bestId = 0L;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $dot = 0.0;
         |    double[] $cc = $centsRef[$c];
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      $dot += $v.getDouble($s * $subDim + $d) * $cc[$s * $subDim + $d];
         |    }
         |    double $d2 = $vn - 2.0 * $dot + $cnRef[$s * $ksub + $c];
         |    if ($d2 < $best) { $best = $d2; $bestId = $idsRef[$c]; }
         |  }
         |  $codes[$s] = $bestId;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

object PqEncodeExpr {
  def col(v: Column, cents: Array[Array[Double]], ids: Array[Long],
      m: Int, subDim: Int): Column =
    GraftBridge.column(
      PqEncodeExpr(GraftBridge.expression(v), cents, ids, m, subDim))
}
