package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketing — the shuffle-elimination lever for repeated co-located
  * joins at scale (SURVEY §2.2 / build-prompt "bucketing for co-located
  * joins"): two tables bucketed on the join key join WITHOUT a shuffle
  * exchange on either side. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed tables join without shuffle exchanges") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val sf = SparkTestSession.sf0001
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("graft_orders_bucketed")
      Tables.customer(spark, sf).write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("graft_customer_bucketed")
      val joined = spark.table("graft_orders_bucketed")
        .join(spark.table("graft_customer_bucketed"),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side; the only allowed
      // Exchange is the one feeding the final aggregation
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan.take(1200))
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning(o_custkey") &&
        !belowJoin.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join still shuffles:\n${belowJoin.take(1200)}")
      // correctness: equals the unbucketed join
      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_customer_bucketed")
    }
  }
}
