package graft

import org.apache.spark.sql.functions._
import graft.ops.CorpusStats

/** M13 exact vs sketch corpus stats: the approx variant is the 100 TB
  * path; its drift against exact must stay within the sketch's rank
  * guarantee on skewed data. */
class CorpusStatsSpec extends SparkSpec {

  test("approx percentiles track exact within rank tolerance on skew") {
    // Zipf-ish lengths across 3 groups, 30k rows
    val docs = spark.range(30000).select(
      concat(lit("g"), col("id") % 3).as("lang"),
      (lit(50) + (col("id") * col("id")) % 4001).as("n_chars"))
    val e = CorpusStats.exact(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = CorpusStats.approx(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(e.keySet == a.keySet)
    e.keySet.foreach { g =>
      // counts/min/max/sum are exact in both variants
      assert(e(g).getLong(1) == a(g).getLong(1))
      assert(e(g).getLong(2) == a(g).getLong(2))
      assert(e(g).getLong(5) == a(g).getLong(5))
      assert(e(g).getLong(6) == a(g).getLong(6))
      // percentiles: within 2% relative on this distribution
      Seq(3, 4).foreach { i =>
        val ev = e(g).getDouble(i)
        val av = a(g).get(i).toString.toDouble
        assert(math.abs(av - ev) / ev < 0.02, s"group $g col $i: $av vs $ev")
      }
    }
  }
}
