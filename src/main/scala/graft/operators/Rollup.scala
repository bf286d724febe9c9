package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Daily PnL rollups + reconciliation.
  *
  * Reference: `wallet_condition_pnl_1d` rebuilt by build-rollup-1d.ts
  * (001:537-549) and reconcile-balances.ts (ledger vs on-chain balance
  * diff).
  */
object Rollup {

  /** wallet × market × day: realized cashflow, volume, fill counts and
    * win/loss rows (sign of each fill's cashflow). `markets` is the
    * broadcast token→market dim. */
  def pnlRollup1d(walletTrades: DataFrame, markets: DataFrame): DataFrame =
    walletTrades
      .join(broadcast(markets), Seq("token_id"))
      .withColumn("signed",
        when(col("side") === "sell", col("usd")).otherwise(-col("usd")))
      .groupBy(col("wallet"), col("market"),
        date_trunc("day", col("ts")).as("day"))
      .agg(
        sum(col("signed")).cast("double").as("realized_pnl_usd"),
        sum(col("usd")).cast("double").as("volume_usd"),
        count(lit(1)).as("pnl_rows"),
        sum(when(col("signed") > 0, 1L).otherwise(0L)).as("win_rows"),
        sum(when(col("signed") < 0, 1L).otherwise(0L)).as("loss_rows"))

  /** Reconcile two independently-derived balance books (full-outer
    * join + diff). With correct inputs every diff is exactly 0 — the
    * decimal pipeline makes that an equality, not a tolerance. */
  def reconcile(balancesA: DataFrame, balancesB: DataFrame): DataFrame = {
    val a = balancesA.select(col("wallet"), col("token_id"),
      col("balance").as("balance_a"))
    val b = balancesB.select(col("wallet"), col("token_id"),
      col("balance").as("balance_b"))
    a.join(b, Seq("wallet", "token_id"), "full_outer")
      .select(col("wallet"), col("token_id"),
        coalesce(col("balance_a"), lit(0.0)).as("balance_a"),
        coalesce(col("balance_b"), lit(0.0)).as("balance_b"),
        (coalesce(col("balance_a"), lit(0.0)) -
          coalesce(col("balance_b"), lit(0.0))).as("diff"))
      .groupBy(col("wallet"))
      .agg(count(lit(1)).as("tokens_checked"),
        sum(when(col("diff") =!= 0.0, 1L).otherwise(0L)).as("mismatches"),
        sum(abs(col("diff")).cast("decimal(18,4)")).cast("double").as("abs_diff"))
  }
}
