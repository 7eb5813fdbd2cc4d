package graft

/** Print one gate query's full result: `runMain graft.ShowOne <name>
  * [sfDir]` — the inspection loop used when authoring OraclePins
  * entries (rows print sorted, ready to transcribe into VALUES). */
object ShowOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.printSchema()
    val cols = df.columns
    df.collect().map(r => cols.indices.map(i => r.get(i)).mkString("\t"))
      .sorted.foreach(println)
    spark.stop()
  }
}
