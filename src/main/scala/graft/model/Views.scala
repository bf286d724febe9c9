package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import java.util.concurrent.ConcurrentHashMap

/** Session-scoped materialized views.
  *
  * The reference keeps its hot derived tables resident as ClickHouse
  * MVs (user_balances, token_last_price, …). The Spark analogue within
  * one session is a cached DataFrame: the first query materializes the
  * view, every later query reuses the in-memory columnar copy instead
  * of re-running the lineitem⋈orders join. At 100 TB the same role is
  * played by bucketed storage of the canonical trades table; the
  * per-query plans are unchanged either way.
  */
object Views {
  private val cache = new ConcurrentHashMap[(String, String, String), DataFrame]()

  def cached(spark: SparkSession, dir: String, name: String)
            (build: => DataFrame): DataFrame = {
    val key = (spark.sparkContext.applicationId, dir, name)
    val hit = cache.get(key)
    if (hit != null) hit
    else this.synchronized {   // reentrant: building one view may build another
      val again = cache.get(key)
      if (again != null) again
      else {
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        cache.put(key, df)
        df
      }
    }
  }

  def trades(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "trades")(Tables.trades(spark, dir))

  def balances(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "balances")(
      graft.operators.Balances.balances(
        Tables.transfersFrom(trades(spark, dir))))

  def lastPrice(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    cached(spark, dir, "last_price")(
      graft.operators.Candles.lastPrice(trades(spark, dir),
        col("token_id"), col("ts"), col("trade_id"), col("price")))
  }

  def eventStream(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "event_stream")(Tables.eventStream(spark, dir))

  /** The FIFO ledger rows, folded once per session — `wallet_ledger`
    * is a materialized table in the reference (built by
    * build-ledger.ts, queried by /ledger, PnL modes and
    * reconciliation), not something recomputed per request. */
  def ledger(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "ledger")(
      graft.operators.Ledger.build(spark,
        graft.operators.Leaderboard.walletTrades(trades(spark, dir))).toDF())

  /** The FIFO fold output with exact `"_open"` lot-state rows — the
    * input to resolution settlement. Folded once per session for the
    * same reason as [[ledger]]: the reference materializes
    * wallet_ledger and re-reads it per request; re-running the fold
    * (and re-persisting a fresh copy) per query both repeats the
    * wallet shuffle and leaks storage memory across a long session. */
  def ledgerOpen(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "ledger_open")(
      graft.operators.Ledger.buildOpenRows(spark,
        graft.operators.Leaderboard.walletTrades(trades(spark, dir))).toDF())

  /** Per (wallet, token_id, day) buy/sell flow partials — the
    * wallet-day MV the reference maintains at ingest
    * (wallet_pnl_snapshots feeder). Every portfolio/snapshot query
    * re-aggregates these partials instead of the raw trades. */
  def dailyFlows(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "daily_flows")(
      graft.operators.Snapshots.dailyFlowPartials(
        graft.operators.Leaderboard.walletTrades(trades(spark, dir))))
}
