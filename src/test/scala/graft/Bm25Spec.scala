package graft

import graft.text.Bm25
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

class Bm25Spec extends SparkSpec {

  private def corpus() = spark.createDataFrame(Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana cherry cherry date"),
    (3L, "apple apple apple apple"),
    (4L, "elderberry fig grape lemon"))).toDF("doc_id", "text")

  test("rare terms outrank frequent ones; only matching docs retrieved") {
    val out = Bm25.search(spark, corpus(), Seq((0, "apple date")))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(4)))
      .sortBy(_._1)
    // df(date)=1 -> idf ln(1+3.5/1.5)=1.204; df(apple)=2 -> ln 2=0.693.
    // All dl == avgdl == 4 so tf-part = tf*2.2/(tf+1.2):
    //   doc2 (date tf1):  1.204*1.0   = 1.204  <- rare term wins
    //   doc3 (apple tf4): 0.693*1.692 = 1.173
    //   doc1 (apple tf2): 0.693*1.375 = 0.953
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq((1, 2L), (2, 3L), (3, 1L)), out.mkString(", "))
    assert(out(0)._3 > 1.2 && out(0)._3 < 1.21)
    assert(out(2)._3 > 0.95 && out(2)._3 < 0.96)
  }

  test("topK bounds results per query; ties break on doc_id") {
    val docs = spark.createDataFrame(
      (1L to 30L).map(i => (i, "same words every time"))).toDF("doc_id", "text")
    val out = Bm25.search(spark, docs, Seq((0, "same"), (1, "words")), topK = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(out.length == 10)
    // identical scores -> rank order is doc_id order
    assert(out.filter(_._1 == 0).sortBy(_._2).map(_._3).toSeq ==
      (1L to 5L).toSeq)
  }

  test("corpus is never broadcast; token shuffle is term-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("bm25spec").toString
    spark.createDataFrame(
      (0L until 60L).map(i => (i, s"alpha beta w${i % 9} gamma w${i % 5}")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/docs_bm25")
    val docs = spark.read.parquet(s"$dir/docs_bm25")
    val out = Bm25.search(spark, docs, Seq((0, "alpha w3")))
    val plan = out.queryExecution.executedPlan
    val corpusBcasts = plan.collect {
      case b: BroadcastExchangeExec
        if b.collect { case s: FileSourceScanExec => s }
          .exists(_.relation.location.rootPaths
            .exists(_.toString.contains("docs_bm25"))) => b
    }
    assert(corpusBcasts.isEmpty, "BM25 must broadcast only query/idf/stats tables")
    assert(out.count() == 10)
  }
}
