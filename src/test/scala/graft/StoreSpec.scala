package graft

import graft.model.Tables
import graft.sources.PartitionedStore
import org.apache.spark.sql.functions._

class StoreSpec extends SparkSpec {

  test("monthly-partitioned store roundtrips and prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    val trades = Tables.trades(spark, sf)
    PartitionedStore.writeMonthly(trades, "ts", dir, Seq("token_id", "trade_id"))

    val back = PartitionedStore.read(spark, dir)
    assert(back.count() == trades.count())
    // value fidelity through the roundtrip
    val a = trades.agg(sum(col("usd")), count(lit(1))).head()
    val b = back.agg(sum(col("usd")), count(lit(1))).head()
    assert(a == b)

    // partition pruning: the ym predicates must land in PartitionFilters
    // (inputFiles ignores filters, so inspect the scan node)
    val one = PartitionedStore.readMonths(spark, dir, "199601", "199603")
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("ym"),
      s"no partition pruning in plan:\n$scan")
    assert(one.filter(date_format(col("ts"), "yyyyMM") > "199603").count() == 0)
  }
}
