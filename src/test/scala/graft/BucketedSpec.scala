package graft

import graft.model.Tables
import graft.sources.BucketedWarehouse
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {

  test("co-bucketed tables join without any shuffle exchange") {
    val prefix = "graftspec"
    try {
      BucketedWarehouse.create(spark, Tables.lineitem(spark, sf),
        Tables.orders(spark, sf), buckets = 4, prefix = prefix)

      // force the sort-merge path (broadcast would hide the point)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedWarehouse.bucketedJoin(spark, prefix)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")

      // and it returns the same rows as the ad hoc join
      val adhoc = Tables.lineitem(spark, sf).join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == adhoc)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      BucketedWarehouse.drop(spark, prefix)
    }
  }
}
