package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned parquet store — the engine's table layout.
  *
  * Reference: every fact table is `PARTITION BY toYYYYMM(ts)` with an
  * ORDER BY key (001_create_tables.sql:44). The Spark analogue:
  * parquet partitioned by a derived year-month column, rows sorted
  * within files by the order key so min/max page stats give the same
  * skipping ClickHouse gets from its primary index. Readers filtering
  * on ym get partition pruning for free.
  */
object PartitionedStore {

  /** Write `df` partitioned by month(tsCol), sorted in-file by
    * `orderCols` (ClickHouse ORDER BY analogue). */
  def writeMonthly(df: DataFrame, tsCol: String, path: String,
                   orderCols: Seq[String]): Unit =
    df.withColumn("ym", date_format(col(tsCol), "yyyyMM"))
      .repartition(col("ym"))
      .sortWithinPartitions(("ym" +: orderCols).map(col): _*)
      .write.partitionBy("ym").mode(SaveMode.Overwrite).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Month-range scan — prunes partitions via the ym directory column
    * (verify with .inputFiles or the explain PartitionFilters). */
  def readMonths(spark: SparkSession, path: String, fromYm: String,
                 toYm: String): DataFrame =
    read(spark, path).filter(col("ym") >= fromYm && col("ym") <= toYm)
}
