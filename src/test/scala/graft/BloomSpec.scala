package graft

import graft.functions.{BloomMightContainExpr, StringBloom}
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {

  private def lcgStrings(seedInit: Long, n: Int): Seq[String] = {
    var seed = seedInit
    def next(): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L; seed >>> 33
    }
    (0 until n).map { _ =>
      val len = 4 + (next() % 12).toInt
      (0 until len).map(_ => ('a' + (next() % 26).toInt).toChar).mkString
    }
  }

  test("no false negatives, measured fpp near nominal") {
    val members = lcgStrings(1L, 5000).distinct
    val bloom = StringBloom.create(members.size.toLong, 0.01)
    members.foreach(bloom.put)
    assert(members.forall(bloom.mightContain), "Bloom false negative")
    val nonMembers = lcgStrings(999L, 20000).distinct.filterNot(members.toSet)
    val fp = nonMembers.count(bloom.mightContain).toDouble / nonMembers.size
    assert(fp < 0.05, s"measured fpp $fp far above nominal 0.01")
  }

  test("merge ORs two filters of the same geometry") {
    val a = StringBloom.create(100, 0.01)
    val b = StringBloom.create(100, 0.01)
    a.put("alpha"); b.put("beta")
    val m = a.merge(b)
    assert(m.mightContain("alpha") && m.mightContain("beta"))
    intercept[IllegalArgumentException] {
      StringBloom.create(100, 0.01).merge(StringBloom.create(100000, 0.01))
    }
  }

  test("expression probe equals the kernel, interpreted and codegen'd") {
    import spark.implicits._
    val members = lcgStrings(7L, 200).distinct
    val bloom = StringBloom.create(members.size.toLong, 0.01)
    members.foreach(bloom.put)
    val data = (members.take(50) ++ lcgStrings(13L, 200)).distinct
    val got = data.toDF("s")
      .select(col("s"), BloomMightContainExpr.mightContain(col("s"), bloom).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    data.foreach(s => assert(got(s) === bloom.mightContain(s), s))
  }

  test("bloomFromColumn treeAggregate equals driver-side build") {
    import spark.implicits._
    val members = lcgStrings(21L, 3000).distinct
    val distributed = TextAnalysis.bloomFromColumn(
      members.toDF("shingle").repartition(7), "shingle",
      expected = members.size.toLong, fpp = 0.01)
    val local = StringBloom.create(members.size.toLong, 0.01)
    members.foreach(local.put)
    assert(distributed.bits.toSeq === local.bits.toSeq)
    assert(distributed.k === local.k)
  }

  test("decontaminateBloom is bit-identical to exact decontaminate") {
    import spark.implicits._
    val words = "the quick brown fox jumps over a lazy dog near riverbank stones".split(" ")
    var seed = 5L
    def next(): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L; seed >>> 33
    }
    val docs = (0L until 60L).map { id =>
      val base = (0 until 12 + (next() % 20).toInt)
        .map(_ => words((next() % words.length).toInt)).mkString(" ")
      // plant contamination in every 7th document
      val text = if (id % 7 == 0) base + " the quick brown fox jumps over" else base
      (id, text)
    }.toDF("doc_id", "text")
    val probes = Seq("the quick brown", "fox jumps over", "no such probe here")
    val exact = TextAnalysis.decontaminate(docs, probes, n = 3)
      .orderBy("doc_id").collect().toSeq
    val bloomed = TextAnalysis.decontaminateBloom(docs, probes, n = 3, fpp = 0.2)
      .orderBy("doc_id").collect().toSeq
    assert(bloomed === exact)
    assert(exact.exists(_.getBoolean(2)), "fixture should have contaminated docs")
  }
}
