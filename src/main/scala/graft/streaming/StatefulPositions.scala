package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming position tracker.
  *
  * Reference: the indexer maintains per-wallet running balances while
  * streaming blocks (user_balances SummingMT updated per batch,
  * 001:382). Here as arbitrary stateful streaming:
  * `mapGroupsWithState` keyed by wallet, carrying net cash and
  * per-token positions across micro-batches, emitting one updated
  * summary row per wallet per batch.
  */
object StatefulPositions {

  final case class StreamFill(wallet: Long, tokenId: Long, isBuy: Boolean,
                              qty: Double, usd: Double)
  final case class WalletState(cash: Double, positions: Map[Long, Double])
  final case class WalletSnapshot(wallet: Long, cash: Double,
                                  open_tokens: Int, total_qty: Double)

  private def fold(s: WalletState, f: StreamFill): WalletState = {
    val dq = if (f.isBuy) f.qty else -f.qty
    val dc = if (f.isBuy) -f.usd else f.usd
    val q = s.positions.getOrElse(f.tokenId, 0.0) + dq
    WalletState(s.cash + dc,
      if (math.abs(q) < 1e-9) s.positions - f.tokenId
      else s.positions.updated(f.tokenId, q))
  }

  def updateWallet(wallet: Long, fills: Iterator[StreamFill],
                   state: GroupState[WalletState]): WalletSnapshot = {
    var s = state.getOption.getOrElse(WalletState(0.0, Map.empty))
    fills.foreach(f => s = fold(s, f))
    state.update(s)
    WalletSnapshot(wallet, s.cash, s.positions.size, s.positions.values.sum)
  }

  /** Streaming: one snapshot row per wallet per micro-batch (Update
    * mode). Also works on a bounded Dataset for batch parity tests. */
  def track(spark: SparkSession, fills: Dataset[StreamFill]): Dataset[WalletSnapshot] = {
    import spark.implicits._
    fills.groupByKey(_.wallet)
      .mapGroupsWithState[WalletState, WalletSnapshot](
        GroupStateTimeout.NoTimeout)(updateWallet)
  }
}
