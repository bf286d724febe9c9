package graft.streaming

import graft.operators.Ledger
import graft.operators.Ledger.{Fill, LedgerRow}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental FIFO ledger over a fill stream.
  *
  * Reference: the snapshot scheduler re-runs the ledger engine per
  * wallet as new blocks arrive (snapshot-scheduler.ts). Streaming-first
  * instead: `flatMapGroupsWithState` keyed by wallet carries the open
  * FIFO lots across micro-batches and emits the new ledger rows of
  * each batch — no recomputation of history, state bounded by open
  * lots per wallet.
  *
  * Ordering: fills are sorted (ts, seq, isBuy desc, usd) within each
  * micro-batch — the same value tie-breakers as the batch
  * [[graft.operators.Ledger]] foldFills, so tied (ts, seq) fills
  * (trade_id is non-unique in real data) replay the identical
  * data-determined total order instead of shuffle-arrival order.
  * Cross-batch ordering is the source's responsibility (late fills
  * would need watermark + buffering, as in the reference's
  * hot-block window).
  */
object StreamingLedger {

  final case class LotsState(lots: Map[Long, Seq[(Double, Double)]],
                             lastPrice: Map[Long, Double] = Map.empty)

  def updateWallet(wallet: Long, fills: Iterator[Fill],
                   state: GroupState[LotsState]): Iterator[LedgerRow] = {
    val prev = state.getOption
    val sorted = fills.toSeq.sortBy(f => (f.ts.getTime, f.seq, !f.isBuy, f.usd))
    val (rows, remaining, lp) = Ledger.foldWalletStateful(sorted.iterator,
      prev.map(_.lots).getOrElse(Map.empty),
      prev.map(_.lastPrice).getOrElse(Map.empty))
    state.update(LotsState(remaining, lp))
    rows.iterator
  }

  def track(spark: SparkSession, fills: Dataset[Fill]): Dataset[LedgerRow] = {
    import spark.implicits._
    fills.groupByKey(_.wallet)
      .flatMapGroupsWithState[LotsState, LedgerRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateWallet)
  }
}
