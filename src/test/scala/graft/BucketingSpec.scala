package graft

import org.apache.spark.sql.functions._
import graft.ops.Bucketing

class BucketingSpec extends SparkSpec {

  test("bucketed-by-cell join plans zero shuffle exchanges") {
    // tables land in the session's default warehouse (./spark-warehouse,
    // gitignored); dropped in finally
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val emi = basicInv
      val weights = spark.createDataFrame(
        (0L until 5L).map(c => (c, c / 2, 0.5))).toDF("cell_id", "dst_cell", "weight")
      Bucketing.writeBucketed(emi, "emi_b", "cell_id", numBuckets = 4)
      Bucketing.writeBucketed(weights, "w_b", "cell_id", numBuckets = 4)
      val joined = Bucketing.read(spark, "emi_b")
        .join(Bucketing.read(spark, "w_b"), "cell_id")
        .groupBy("dst_cell", "category", "substance")
        .agg(sum(col("value") * col("weight")).as("value"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side (bucket co-location);
      // only the final dst_cell aggregate may exchange
      val joinPart = plan.split("HashAggregate").last
      assert(!joinPart.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      // 3 dst cells x 4 (category, substance) combos
      assert(joined.count() == 12)
    } finally {
      spark.sql("DROP TABLE IF EXISTS emi_b")
      spark.sql("DROP TABLE IF EXISTS w_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
