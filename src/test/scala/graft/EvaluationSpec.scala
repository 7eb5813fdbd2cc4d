package graft

import graft.ops.Evaluation

/** M73 classifier evaluation: exact Mann–Whitney AUC with tie correction
  * and the threshold sweep, against hand-computed confusion tables. */
class EvaluationSpec extends SparkSpec {

  private def scored(rows: (Long, Long)*) =
    spark.createDataFrame(rows).toDF("score", "y")

  // pos scores {3, 2, 2}, neg scores {1, 2}: U = 4 wins + 2 ties/2 = 5,
  // AUC = 5/6; 2U = 10, den = 2*3*2 = 12
  private val d = scored((3L, 1L), (2L, 1L), (2L, 1L), (1L, 0L), (2L, 0L))

  test("aucExact: tie-corrected Mann-Whitney on a hand-computed fixture") {
    val r = Evaluation.aucExact(d, "score", "y").collect()(0)
    assert(r.getLong(0) == 10L) // auc_num = 2U
    assert(r.getLong(1) == 12L) // auc_den = 2PN
    assert(r.getLong(2) == 3L && r.getLong(3) == 2L)
    assert(math.abs(r.getDouble(4) - 0.833333) < 1e-9)
  }

  test("aucExact: perfect separation gives AUC 1, inverted gives 0") {
    val sep = scored((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L))
    assert(Evaluation.aucExact(sep, "score", "y")
      .collect()(0).getDouble(4) == 1.0)
    val inv = scored((1L, 1L), (2L, 1L), (9L, 0L), (10L, 0L))
    assert(Evaluation.aucExact(inv, "score", "y")
      .collect()(0).getDouble(4) == 0.0)
  }

  test("aucExact: single-class corpus yields NULL auc, zero denominator") {
    val onlyPos = scored((1L, 1L), (2L, 1L))
    val r = Evaluation.aucExact(onlyPos, "score", "y").collect()(0)
    assert(r.getLong(1) == 0L)
    assert(r.isNullAt(4))
  }

  test("thresholdSweep: confusion counts and single-division metrics per threshold") {
    val out = Evaluation.thresholdSweep(d, "score", "y").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    assert(out(3L) == ((1L, 0L, 2L, 2L, 1.0, 0.333333, 0.5)))
    assert(out(2L) == ((3L, 1L, 0L, 1L, 0.75, 1.0, 0.857143)))
    assert(out(1L) == ((3L, 2L, 0L, 0L, 0.6, 1.0, 0.75)))
    assert(out.size == 3)
  }

  test("thresholdSweep: the score aggregate bounds the sweep, not the corpus") {
    // 100k rows but only 4 distinct scores -> 4 output rows
    val big = spark.range(100000L).select(
      (org.apache.spark.sql.functions.col("id") % 4).as("score"),
      (org.apache.spark.sql.functions.col("id") % 2).as("y"))
    assert(Evaluation.thresholdSweep(big, "score", "y").count() == 4L)
  }
}
