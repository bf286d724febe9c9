package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** FIFO-lot PnL ledger engine.
  *
  * Reference: src/ledger-engine.ts:66-150 (`PositionManager`: lots are
  * consumed FIFO; a sell realizes qty·(sellPrice − lotUnitCost)) and
  * the wallet_ledger table (001:292-313).
  *
  * Spark-first: this is inherently a per-wallet sequential fold, so it
  * cannot be a plain SQL aggregate — but it distributes perfectly by
  * wallet. We repartition by wallet and sort within partitions by
  * (wallet, ts, seq), then stream each partition once with
  * `mapPartitions`, carrying only the open-lot state of the *current*
  * wallet. One shuffle, no driver collect, memory bounded by a single
  * wallet's open lots — this scales to any number of wallets/executors
  * (the reference runs the same fold single-threaded per wallet).
  */
object Ledger {

  /** One buy/sell fill from one wallet's perspective. */
  final case class Fill(wallet: Long, ts: java.sql.Timestamp, seq: Long,
                        tokenId: Long, isBuy: Boolean, qty: Double, usd: Double,
                        fee: Double = 0.0)

  /** Output ledger row (reference wallet_ledger columns). */
  final case class LedgerRow(wallet: Long, ts: java.sql.Timestamp, seq: Long,
                             token_id: Long, event_type: String, qty: Double,
                             usd_delta: Double, cost_basis: Double,
                             realized_pnl: Double, fee: Double)

  private final case class Lot(var qty: Double, unitCost: Double)

  /** Fold one wallet's fills (already sorted by ts, seq) into ledger
    * rows. Buys append lots; sells consume lots FIFO and realize
    * proceeds − cost basis (ledger-engine.ts consumeTokens). Oversold
    * quantity (no lots left) has zero basis, like the reference. */
  def foldWallet(fills: Iterator[Fill]): Iterator[LedgerRow] =
    foldWalletInto(fills, mutable.Map.empty, _ => ())

  /** Fold one wallet's fills, then settle remaining open lots against
    * market resolutions: tokens with a defined payout emit one
    * "redeem" row each — realized = qty·payout − cost basis (a zero
    * payout is the reference's resolutionLoss: the full basis is
    * realized as loss). Mirrors PayoutRedemption handling in
    * ledger-engine.ts. */
  def foldWalletResolved(fills: Iterator[Fill],
                         resolutions: Long => Option[Double]): Iterator[LedgerRow] = {
    val lots = mutable.Map.empty[Long, mutable.Queue[Lot]]
    var wallet = 0L
    var lastTs: java.sql.Timestamp = null
    var lastSeq = 0L
    val traded = foldWalletInto(fills, lots, f => {
      wallet = f.wallet; lastTs = f.ts; lastSeq = math.max(lastSeq, f.seq)
    })
    def settlements: Iterator[LedgerRow] =
      lots.iterator.filter(_._2.nonEmpty).flatMap { case (token, q) =>
        resolutions(token).map { payout =>
          val qty = q.iterator.map(_.qty).sum
          val basis = q.iterator.map(l => l.qty * l.unitCost).sum
          LedgerRow(wallet, lastTs, lastSeq + 1, token, "redeem", -qty,
            qty * payout, basis, qty * payout - basis, 0.0)
        }
      }.toSeq.sortBy(_.token_id).iterator
    traded ++ settlements
  }

  /** Shared fold core: emits trade rows, mutating `lots`; `observe`
    * sees every fill (for wallet/ts bookkeeping). */
  private def foldWalletInto(fills: Iterator[Fill],
      lots: mutable.Map[Long, mutable.Queue[Lot]],
      observe: Fill => Unit): Iterator[LedgerRow] =
    fills.map { f =>
      observe(f)
      if (f.isBuy) {
        val unit = if (f.qty > 0) f.usd / f.qty else 0.0
        lots.getOrElseUpdate(f.tokenId, mutable.Queue.empty) += Lot(f.qty, unit)
        LedgerRow(f.wallet, f.ts, f.seq, f.tokenId, "buy", f.qty, -f.usd, f.usd,
          0.0, f.fee)
      } else {
        val q = lots.getOrElse(f.tokenId, mutable.Queue.empty)
        var remaining = f.qty
        var basis = 0.0
        while (remaining > 1e-7 && q.nonEmpty) {
          val lot = q.head
          val take = math.min(remaining, lot.qty)
          basis += take * lot.unitCost
          lot.qty -= take
          remaining -= take
          if (lot.qty <= 1e-7) q.dequeue()
        }
        LedgerRow(f.wallet, f.ts, f.seq, f.tokenId, "sell", -f.qty, f.usd,
          basis, f.usd - basis, f.fee)
      }
    }

  /** Resumable fold: start from carried-over open lots, return the
    * emitted rows plus the surviving lot state — the seam the
    * streaming ledger uses to persist FIFO state across micro-batches
    * (token → [(qty, unitCost)], FIFO order preserved). */
  def foldWalletStateful(fills: Iterator[Fill],
      initial: Map[Long, Seq[(Double, Double)]])
      : (Seq[LedgerRow], Map[Long, Seq[(Double, Double)]]) = {
    val lots = mutable.Map.empty[Long, mutable.Queue[Lot]]
    initial.foreach { case (token, ls) =>
      lots(token) = mutable.Queue(ls.map(p => Lot(p._1, p._2)): _*)
    }
    val rows = foldWalletInto(fills, lots, _ => ()).toSeq
    val out = lots.iterator.collect { case (token, q) if q.nonEmpty =>
      token -> q.iterator.map(l => (l.qty, l.unitCost)).toSeq
    }.toMap
    (rows, out)
  }

  /** Distributed ledger build over the two-sided trade view. */
  def build(spark: SparkSession, walletTrades: DataFrame): Dataset[LedgerRow] =
    buildWith(spark, walletTrades, foldWallet)

  /** Distributed build with end-of-history resolution settlement.
    * `resolutions` (token → payout/share) is a small dim broadcast to
    * executors; at 100 TB it rides the closure exactly like a
    * broadcast-hash-join build side. */
  def buildResolved(spark: SparkSession, walletTrades: DataFrame,
                    resolutions: Map[Long, Double]): Dataset[LedgerRow] = {
    val bc = spark.sparkContext.broadcast(resolutions)
    buildWith(spark, walletTrades, fills => foldWalletResolved(fills, bc.value.get))
  }

  private def buildWith(spark: SparkSession, walletTrades: DataFrame,
      folder: Iterator[Fill] => Iterator[LedgerRow]): Dataset[LedgerRow] = {
    import spark.implicits._
    val fills: Dataset[Fill] = walletTrades.select(
        col("wallet").cast("long").as("wallet"),
        col("ts"),
        col("trade_id").cast("long").as("seq"),
        col("token_id").cast("long").as("tokenId"),
        (col("side") === "buy").as("isBuy"),
        col("qty").cast("double").as("qty"),
        col("usd").cast("double").as("usd"),
        col("fee").cast("double").as("fee"))
      .as[Fill]
    fills
      .repartition(col("wallet"))
      .sortWithinPartitions(col("wallet"), col("ts"), col("seq"))
      .mapPartitions { it =>
        // partitions hold many wallets, contiguously after the sort —
        // flush state at each wallet boundary
        new Iterator[LedgerRow] {
          private var cur: Iterator[LedgerRow] = Iterator.empty
          private val grouped = new Iterator[Iterator[Fill]] {
            private val buf = it.buffered
            def hasNext: Boolean = buf.hasNext
            def next(): Iterator[Fill] = {
              val w = buf.head.wallet
              val fills = mutable.ArrayBuffer.empty[Fill]
              while (buf.hasNext && buf.head.wallet == w) fills += buf.next()
              fills.iterator
            }
          }
          def hasNext: Boolean = {
            while (!cur.hasNext && grouped.hasNext)
              cur = folder(grouped.next())
            cur.hasNext
          }
          def next(): LedgerRow = { hasNext; cur.next() }
        }
      }
  }

  /** Wallet-level realized PnL summary from the ledger rows
    * (reference: PnlResult realizedFromSells / realizedFromFees /
    * totalRealized). */
  def realizedSummary(ledger: DataFrame): DataFrame =
    ledger.groupBy(col("wallet"))
      .agg(
        sum(when(col("event_type") === "sell", col("realized_pnl"))
          .otherwise(0.0).cast("decimal(18,6)")).cast("double").as("realized_pnl"),
        sum(col("fee").cast("decimal(18,6)")).cast("double").as("fees_paid"),
        (sum(when(col("event_type") === "sell", col("realized_pnl"))
          .otherwise(0.0).cast("decimal(18,6)")) -
          sum(col("fee").cast("decimal(18,6)"))).cast("double").as("net_realized"),
        sum(when(col("event_type") === "sell", 1L).otherwise(0L)).as("sells"),
        sum(when(col("event_type") === "buy", 1L).otherwise(0L)).as("buys"))

  /** Summary decomposed by realization source (reference: PnlResult
    * realizedFromSells / realizedFromRedemptions / resolution losses). */
  def resolvedSummary(ledger: DataFrame): DataFrame =
    ledger.groupBy(col("wallet"))
      .agg(
        sum(when(col("event_type") === "sell", col("realized_pnl"))
          .otherwise(0.0).cast("decimal(18,6)")).cast("double")
          .as("realized_from_sells"),
        sum(when(col("event_type") === "redeem" && col("realized_pnl") >= 0,
          col("realized_pnl")).otherwise(0.0).cast("decimal(18,6)")).cast("double")
          .as("realized_from_redemptions"),
        sum(when(col("event_type") === "redeem" && col("realized_pnl") < 0,
          col("realized_pnl")).otherwise(0.0).cast("decimal(18,6)")).cast("double")
          .as("realized_from_resolution_losses"),
        sum(col("realized_pnl").cast("decimal(18,6)")).cast("double")
          .as("total_realized"))
}
