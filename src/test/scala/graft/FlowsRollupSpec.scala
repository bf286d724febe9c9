package graft

import graft.model.Tables
import graft.operators.{Balances, Candles, Leaderboard, Positions}
import org.apache.spark.sql.functions._

/** The (wallet, token_id) flow-partials rollup (r14): the rewritten
  * consumers must be ROW-IDENTICAL to the direct operators they
  * replaced — the equivalences the driver oracles verify at sf0.01
  * are pinned here at unit scale too, so a rollup schema drift fails
  * fast in the suite. */
class FlowsRollupSpec extends SparkSpec {

  private lazy val trades = Tables.trades(spark, sf).cache()
  private lazy val wt = Leaderboard.walletTrades(trades)
  private lazy val flows = Leaderboard.walletTokenFlows(wt).cache()

  test("explainFromFlows == explain row-for-row") {
    val markets = Tables.part(spark, sf).select(
      col("p_partkey").cast("long").as("token_id"),
      col("p_brand").as("market"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    val direct = rows(Leaderboard.explain(wt, markets))
    val rollup = rows(Leaderboard.explainFromFlows(flows, markets))
    assert(direct == rollup, "re-aggregation of the partials must be " +
      "value-identical, not merely approximately equal")
    assert(direct.nonEmpty)
  }

  test("positionsFromFlows == positions row-for-row (incl. the " +
    "no-buys left-join null, never 0/0)") {
    val bal = Balances.balances(Tables.transfersFrom(trades))
    val lp = Candles.lastPrice(trades, col("token_id"), col("ts"),
      col("trade_id"), col("price"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(3)).map(_.toString).getOrElse("null"),
        Option(r.get(6)).map(_.toString).getOrElse("null"))).toSet
    val direct = rows(Positions.positions(bal, wt, lp))
    val rollup = rows(Positions.positionsFromFlows(bal, flows, lp))
    assert(direct == rollup)
    assert(direct.nonEmpty)
  }
}
