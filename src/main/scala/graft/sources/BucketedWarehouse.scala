package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed canonical tables — the 100 TB layout.
  *
  * The trades view joins lineitem ⋈ orders on orderkey; ad hoc that is
  * one shuffle of each side per session. Bucketing both tables by the
  * join key at write time (ClickHouse analogue: identical ORDER BY
  * prefixes) makes every later join shuffle-free: Spark reads both
  * sides already hash-partitioned and sort-merge-joins bucket by
  * bucket. BucketedSpec asserts the no-Exchange plan.
  */
object BucketedWarehouse {

  /** Persist both join sides bucketed by the key into the session
    * catalog (parquet tables under spark.sql.warehouse.dir). */
  def create(spark: SparkSession, lineitem: DataFrame, orders: DataFrame,
             buckets: Int, prefix: String = "graft"): Unit = {
    lineitem.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable(s"${prefix}_lineitem_b")
    orders.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable(s"${prefix}_orders_b")
  }

  /** The co-bucketed join — no Exchange on either side. */
  def bucketedJoin(spark: SparkSession, prefix: String = "graft"): DataFrame = {
    val li = spark.table(s"${prefix}_lineitem_b")
    val o = spark.table(s"${prefix}_orders_b")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
  }

  def drop(spark: SparkSession, prefix: String = "graft"): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_lineitem_b")
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_orders_b")
  }
}
