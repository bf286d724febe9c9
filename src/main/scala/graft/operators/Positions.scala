package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Open positions with entry price and unrealized PnL.
  *
  * Reference: `/positions` endpoint (src/api.ts:758-860) — balances
  * joined with avg entry price (wallet_token_buys MV, 001:592-622) and
  * the last traded price (token_last_price MV, 001:552).
  *
  * Spark-first: the two fact-sized inputs (balances, buy aggregates)
  * are co-partitioned by (wallet, token_id) — one shuffle each, then a
  * shuffle-free sort-merge join; the per-token last-price dim is tiny
  * and broadcast.
  */
object Positions {

  /** @param balances  (wallet, token_id, balance)
    * @param walletTrades output of [[Leaderboard.walletTrades]]
    * @param lastPrice (token_id, last_price)
    */
  def positions(balances: DataFrame, walletTrades: DataFrame,
                lastPrice: DataFrame): DataFrame = {
    // scaled-long sums (usd/qty are ≤4-decimals-exact): integer
    // partial aggregation, one double division per group — same
    // values as decimal sums, measurably cheaper at equal exactness
    val buys = walletTrades.filter(col("side") === "buy")
      .groupBy(col("wallet"), col("token_id"))
      .agg(sum(round(col("usd") * 10000).cast("long")).as("ui"),
           sum(round(col("qty") * 10000).cast("long")).as("qi"))
      .select(col("wallet"), col("token_id"),
        (col("ui") / 10000.0).as("buy_usd"),
        (col("qi") / 10000.0).as("buy_qty"))
    joined(balances, buys, lastPrice)
  }

  /** [[positions]] from the (wallet, token_id) flow-partials rollup
    * ([[Leaderboard.walletTokenFlows]]) — identical values: bi/1e4 is
    * the same scaled-long buy_usd, and buy_qty's double sum of
    * integral qtys equals the scaled-long sum exactly. A pair with no
    * buys (buy_qty 0) drops, matching the buy-filtered aggregate's
    * missing row (left-join null, never 0/0). */
  def positionsFromFlows(balances: DataFrame, flows: DataFrame,
                         lastPrice: DataFrame): DataFrame =
    joined(balances,
      flows.filter(col("buy_qty") > 0)
        .select(col("wallet"), col("token_id"),
          (col("bi") / 10000.0).as("buy_usd"), col("buy_qty")),
      lastPrice)

  private def joined(balances: DataFrame, buys: DataFrame,
                     lastPrice: DataFrame): DataFrame =
    balances.filter(col("balance") > 0)
      .join(buys, Seq("wallet", "token_id"), "left")
      .join(broadcast(lastPrice.select(col("token_id"), col("last_price"))),
        Seq("token_id"), "left")
      .select(
        col("wallet"), col("token_id"), col("balance"),
        (col("buy_usd") / col("buy_qty")).as("avg_entry_price"),
        col("last_price"),
        (col("balance") * col("last_price")).as("current_value"),
        (col("balance") * (col("last_price") - col("buy_usd") / col("buy_qty")))
          .as("unrealized_pnl"))
}
