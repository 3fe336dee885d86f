package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the no-shuffle join path for repeated
  * big-big joins at scale (both sides pre-bucketed on the join key, the
  * sort-merge join reads buckets directly with no Exchange). */
class BucketingSpec extends SparkSpec {

  test("bucketed join on the same key plans without a shuffle on either side") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a crashed prior run can leave orphan managed-table dirs the fresh
    // in-memory catalog no longer knows about
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = new java.io.File(s"spark-warehouse/$t")
      if (p.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(p)
      }
    }
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      // execute, then inspect the FINAL adaptive plan
      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val planFull = joined.queryExecution.executedPlan.toString
      // AdaptiveSparkPlan prints Final + Initial sections; judge the final
      val plan = planFull.split("== Initial Plan ==").head
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected sort-merge join over bucketed tables:\n$plan")
      // co-located: no Exchange between the scans and the join
      val afterJoin = plan.substring(joinIdx)
      val exchanges = afterJoin.split("\n").count(_.contains("Exchange hashpartitioning"))
      assert(exchanges === 0, s"bucketed join must not shuffle its inputs:\n$plan")
      // and the result is right
      val viaParquet = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets === viaParquet)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
