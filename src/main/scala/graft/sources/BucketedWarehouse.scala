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
    * catalog (parquet tables under spark.sql.warehouse.dir).
    *
    * Idempotent across JVMs: the default catalog is per-process, so a
    * previous run's table FILES survive under the warehouse dir while
    * the registration does not — `saveAsTable` then fails with
    * LOCATION_ALREADY_EXISTS for every JVM after the first. Clear any
    * stale location (drop + delete) before writing; on a cluster the
    * analogue is a persistent metastore, where the existing table
    * would instead be reused. */
  def create(spark: SparkSession, lineitem: DataFrame, orders: DataFrame,
             buckets: Int, prefix: String = "graft"): Unit = {
    drop(spark, prefix)
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (t <- Seq(s"${prefix}_lineitem_b", s"${prefix}_orders_b")) {
      val loc = new org.apache.hadoop.fs.Path(warehouse, t.toLowerCase)
      if (fs.exists(loc)) fs.delete(loc, true): Unit
    }
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
