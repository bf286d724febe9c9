package graft

import graft.model.Tables
import graft.operators.Rank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank.globalRowNumber must agree exactly with the single-partition
  * window it replaces, and its ntile/percent_rank arithmetic with
  * Spark's own window functions — on real (skewed, tied) volume data.
  */
class RankSpec extends SparkSpec {

  private def vol = {
    val wt = graft.operators.Leaderboard.walletTrades(
      Tables.trades(spark, sf))
    wt.groupBy(col("wallet"))
      .agg(sum(col("usd")).cast("double").as("volume_usd"))
  }

  test("globalRowNumber equals the window row_number, no unpartitioned window") {
    val sortCols = Seq(col("volume_usd").desc, col("wallet"))
    val got = Rank.globalRowNumber(vol, sortCols, "rank", "total")
    val w = Window.orderBy(sortCols: _*)
    val want = vol.select(col("wallet"),
      row_number().over(w).cast("long").as("rank"))
    val joined = got.select(col("wallet"), col("rank"))
      .join(want.withColumnRenamed("rank", "want_rank"), Seq("wallet"))
    assert(joined.filter(col("rank") =!= col("want_rank")).isEmpty,
      "distributed rank must equal the global window rank")
    // the point of the operator: no single-partition WindowExec
    import org.apache.spark.sql.execution.window.WindowExec
    val unpart = got.queryExecution.sparkPlan.collect {
      case x: WindowExec if x.partitionSpec.isEmpty => x
    }
    assert(unpart.isEmpty, "Rank must not plan an unpartitioned window")
    // total is the row count on every row
    assert(got.filter(col("total") =!= vol.count()).isEmpty)
  }

  test("ntile/percent_rank arithmetic matches Spark's window functions") {
    val sortCols = Seq(col("volume_usd").desc, col("wallet"))
    val got = Rank.globalRowNumber(vol, sortCols, "rank", "total")
      .select(col("wallet"),
        Rank.ntileFromRank(col("rank"), col("total"), 10).as("decile"),
        Rank.percentRankFromRank(col("rank"), col("total")).as("pr"))
    val w = Window.orderBy(sortCols: _*)
    val want = vol.select(col("wallet"),
      ntile(10).over(w).as("want_decile"),
      percent_rank().over(w).as("want_pr"))
    val joined = got.join(want, Seq("wallet"))
    assert(joined.filter(col("decile") =!= col("want_decile")).isEmpty,
      "ntile formula must match larger-groups-first semantics")
    assert(joined.filter(abs(col("pr") - col("want_pr")) > 1e-12).isEmpty,
      "percent_rank formula must match")
  }

  test("ntile arithmetic handles total < k (ANSI-safe small groups)") {
    val sortCols = Seq(col("volume_usd").desc, col("wallet"))
    val tiny = vol.orderBy(col("wallet")).limit(3)
    val got = Rank.globalRowNumber(tiny, sortCols, "rank", "total")
      .select(col("wallet"),
        Rank.ntileFromRank(col("rank"), col("total"), 10).as("decile"))
    val w = Window.orderBy(sortCols: _*)
    val want = tiny.select(col("wallet"),
      ntile(10).over(w).as("want_decile"))
    val joined = got.join(want, Seq("wallet"))
    assert(joined.count() == 3)
    assert(joined.filter(col("decile") =!= col("want_decile")).isEmpty)
  }
}
