package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables co-locate join keys at write time, so a fact⋈fact join
  * needs no Exchange at read time — the pre-partitioning strategy for
  * repeatedly-joined big tables (SURVEY.md §2.G / spark_guide). */
class BucketingSpec extends AnyFunSuite with SparkSuite {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // a crashed prior run can leave the managed-table dirs without metadata
    for (t <- Seq("b_orders", "b_customer")) {
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }

    spark.read.parquet(s"$sf0001/orders.parquet")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .format("parquet").saveAsTable("b_orders")
    spark.read.parquet(s"$sf0001/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .format("parquet").saveAsTable("b_customer")

    // force the sort-merge path (at fixture scale Spark would broadcast
    // instead and hide the property under test)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (joined, plan) =
      try {
        val j = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        (j, j.queryExecution.executedPlan.toString)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    // the join itself must not shuffle either side (only the groupBy may)
    val beforeAgg = plan.split("HashAggregate").last // deepest section: scans + join
    assert(beforeAgg.contains("SortMergeJoin") || plan.contains("SortMergeJoin"),
      s"expected a sort-merge join over bucketed scans:\n$plan")
    assert(!beforeAgg.contains("Exchange"),
      s"bucketed join should read co-located buckets without exchange:\n$plan")

    // and results equal the plain join
    val plain = spark.read.parquet(s"$sf0001/orders.parquet")
      .join(spark.read.parquet(s"$sf0001/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    assert(joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      plain.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
  }
}
