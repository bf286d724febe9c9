package graft.model

import org.apache.spark.sql.SparkSession

/** SQL surface: registers the canonical derived views as temp views
  * (the reference exposes the same names as ClickHouse tables/views —
  * trades, wallet_trades, user_balances, token_last_price). With
  * [[graft.functions.GraftFunctions.register]] this makes the whole
  * engine usable from plain `spark.sql`.
  */
object GraftCatalog {
  def register(spark: SparkSession, dir: String): Unit = {
    Views.trades(spark, dir).createOrReplaceTempView("trades")
    graft.operators.Leaderboard.walletTrades(Views.trades(spark, dir))
      .createOrReplaceTempView("wallet_trades")
    Views.balances(spark, dir).createOrReplaceTempView("user_balances")
    Views.lastPrice(spark, dir).createOrReplaceTempView("token_last_price")
    Views.eventStream(spark, dir).createOrReplaceTempView("event_stream")
    Tables.part(spark, dir).selectExpr("CAST(p_partkey AS BIGINT) AS token_id",
      "p_brand AS market", "p_name AS outcome")
      .createOrReplaceTempView("token_metadata")
    import org.apache.spark.sql.functions.col
    // bind the SESSION MV (same Views.cached name the DataFrame
    // queries share), not a fresh raw plan: a SQL query over
    // candles_1m re-aggregates the ingest-maintained partials exactly
    // like the DataFrame surface instead of re-deriving them per query
    Views.cached(spark, dir, "candles_1m")(
        graft.operators.Candles.fromTicks(Views.eventStream(spark, dir),
          "minute", col("token_id"), col("ts"), col("event_id"),
          col("price"), col("usd")))
      .createOrReplaceTempView("candles_1m")
    Views.dailyFlows(spark, dir).createOrReplaceTempView("wallet_daily_flows")
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    // the materialized ledger and rollup-state views (reference:
    // wallet_ledger table, wallet_leaderboard_stats MV)
    Views.ledger(spark, dir).createOrReplaceTempView("wallet_ledger")
    Views.cached(spark, dir, "lb_rollup_day")(
        graft.operators.Leaderboard.walletTrades(Views.trades(spark, dir))
          .transform(wt => graft.operators.Leaderboard.rollupState(wt, "day")))
      .createOrReplaceTempView("leaderboard_rollup_1d")
    // the (wallet, token_id) flow-partials rollup (r14): the
    // SummingMergeTree-style table lb-explain / win-rate / positions
    // re-aggregate — bound to the SAME session MV they read, so the
    // SQL surface pays a cached-MV scan, not a per-query explode
    Views.cached(spark, dir, "wallet_token_flows",
        partitionBy = Seq("wallet"))(
      graft.operators.Leaderboard.walletTokenFlows(
        graft.operators.Leaderboard.walletTrades(Views.trades(spark, dir))))
      .createOrReplaceTempView("wallet_token_flows")
    graft.functions.GraftFunctions.register(spark)
  }
}
