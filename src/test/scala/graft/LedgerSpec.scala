package graft

import graft.operators.Ledger
import graft.operators.Ledger.{Fill, LedgerRow}
import java.sql.Timestamp

/** FIFO lot-consumption oracle, hand-computed (mirrors
  * ledger-engine.ts consumeTokens semantics). */
class LedgerSpec extends SparkSpec {

  private def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("FIFO fold: sells consume earliest lots first") {
    val fills = Seq(
      Fill(1, ts(1), 1, 100, isBuy = true, qty = 10, usd = 10.0),  // lot @1.00
      Fill(1, ts(2), 2, 100, isBuy = true, qty = 10, usd = 20.0),  // lot @2.00
      Fill(1, ts(3), 3, 100, isBuy = false, qty = 15, usd = 45.0)  // sell @3.00
    )
    val rows = Ledger.foldWallet(fills.iterator).toSeq
    assert(rows.size == 3)
    val sell = rows(2)
    // basis = 10×1.00 + 5×2.00 = 20; realized = 45 − 20 = 25
    assert(math.abs(sell.cost_basis - 20.0) < 1e-9)
    assert(math.abs(sell.realized_pnl - 25.0) < 1e-9)
  }

  test("tied (ts, trade_id) fills fold in value-determined order: buys first, then usd") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // real data duplicates trade_id within an order, so (ts, trade_id)
    // alone under-determines the fold; the sort must break ties by
    // values (side, then usd) — the same refinement the oracle twins'
    // SQL windows use — or results depend on shuffle arrival order
    val rows = Seq(
      // adversarial input order: sell first, larger buy before smaller
      (1L, ts(1), 7L, 100L, "sell", 1.0, 30.0, 0.0),
      (1L, ts(1), 7L, 100L, "buy", 1.0, 20.0, 0.0),
      (1L, ts(1), 7L, 100L, "buy", 1.0, 10.0, 0.0))
      .toDF("wallet", "ts", "trade_id", "token_id", "side", "qty", "usd", "fee")
    val out = Ledger.build(spark, rows).toDF()
      .filter(col("event_type") === "sell")
      .select(col("cost_basis"), col("realized_pnl")).collect()
    assert(out.length == 1)
    // buys fold first (side tie-break), usd-10 buy before usd-20
    // (usd tie-break) → the sell consumes the 10-basis lot: +20
    assert(math.abs(out(0).getDouble(0) - 10.0) < 1e-9)
    assert(math.abs(out(0).getDouble(1) - 20.0) < 1e-9)
  }

  test("oversell beyond lots has zero basis for the uncovered part") {
    val fills = Seq(
      Fill(1, ts(1), 1, 100, isBuy = true, qty = 5, usd = 5.0),
      Fill(1, ts(2), 2, 100, isBuy = false, qty = 8, usd = 16.0)
    )
    val sell = Ledger.foldWallet(fills.iterator).toSeq.last
    assert(math.abs(sell.cost_basis - 5.0) < 1e-9)   // only the 5 held
    assert(math.abs(sell.realized_pnl - 11.0) < 1e-9)
  }

  test("lots are per-token: selling token B doesn't touch token A") {
    val fills = Seq(
      Fill(1, ts(1), 1, 100, isBuy = true, qty = 10, usd = 10.0),
      Fill(1, ts(2), 2, 200, isBuy = true, qty = 10, usd = 30.0),
      Fill(1, ts(3), 3, 200, isBuy = false, qty = 10, usd = 50.0)
    )
    val sell = Ledger.foldWallet(fills.iterator).toSeq.last
    assert(math.abs(sell.cost_basis - 30.0) < 1e-9)
    assert(math.abs(sell.realized_pnl - 20.0) < 1e-9)
  }

  test("resolutions settle open lots: redemption gains and losses") {
    val fills = Seq(
      Fill(1, ts(1), 1, 100, isBuy = true, qty = 10, usd = 5.0),  // @0.50
      Fill(1, ts(2), 2, 200, isBuy = true, qty = 4, usd = 2.0),   // @0.50
      Fill(1, ts(3), 3, 100, isBuy = false, qty = 2, usd = 1.6)   // sell 2 @0.80
    )
    // token 100 resolves to 1.0, token 200 resolves to 0.0
    val rows = Ledger.foldWalletResolved(fills.iterator,
      Map(100L -> 1.0, 200L -> 0.0).get).toSeq
    val redeems = rows.filter(_.event_type == "redeem").map(r => r.token_id -> r).toMap
    // token 100: 8 left @0.50 → payout 8×1 − basis 4 = +4
    assert(math.abs(redeems(100L).realized_pnl - 4.0) < 1e-9)
    // token 200: 4 left @0.50 → payout 0 − basis 2 = −2 (resolution loss)
    assert(math.abs(redeems(200L).realized_pnl - (-2.0)) < 1e-9)
    // unresolved tokens emit nothing; qty is negated holdings
    assert(redeems(100L).qty == -8.0 && redeems(200L).qty == -4.0)
  }

  test("split mints both outcome legs at uniform cost; merge realizes vs FIFO basis") {
    val fills = Seq(
      // pay 10 collateral, mint 10 of token 100 AND 10 of token 101 @0.50
      Fill(1, ts(1), 1, 100, isBuy = false, qty = 10, usd = 10.0,
        kind = "split", tokenId2 = 101),
      // burn 4 of each leg for 4.4 proceeds; basis 4×0.5×2 = 4 → +0.4
      Fill(1, ts(2), 2, 100, isBuy = false, qty = 4, usd = 4.4,
        kind = "merge", tokenId2 = 101),
      // sell the remaining 6 of token 100 @1.00: basis 3 → +3
      Fill(1, ts(3), 3, 100, isBuy = false, qty = 6, usd = 6.0)
    )
    val rows = Ledger.foldWallet(fills.iterator).toSeq
    val Seq(split, merge, sell) = rows
    assert(split.event_type == "split" && split.qty == 20.0 &&
      split.usd_delta == -10.0 && split.realized_pnl == 0.0)
    assert(merge.event_type == "merge" && merge.qty == -8.0)
    assert(math.abs(merge.cost_basis - 4.0) < 1e-9)
    assert(math.abs(merge.realized_pnl - 0.4) < 1e-9)
    assert(math.abs(sell.cost_basis - 3.0) < 1e-9)
    assert(math.abs(sell.realized_pnl - 3.0) < 1e-9)
    // the other leg still holds 6 @0.5
  }

  test("multi-outcome split mints per-leg amounts at uniform cost; merge consumes per leg") {
    // 3-outcome condition, transfer-derived UNEQUAL amounts
    // (ledger-engine.ts adapter_split: unitCost = totalCost / totalMintQty)
    val fills = Seq(
      // pay 12 collateral, mint 1×t100 + 2×t200 + 3×t300 @ 12/6 = 2.00
      Fill(1, ts(1), 1, 100, isBuy = false, qty = 0, usd = 12.0,
        kind = "split", legTokens = Seq(100L, 200L, 300L),
        legQtys = Seq(1.0, 2.0, 3.0)),
      // burn 1 of each leg for 4.5 proceeds; basis 3×2.00 = 6 → −1.5
      Fill(1, ts(2), 2, 100, isBuy = false, qty = 0, usd = 4.5,
        kind = "merge", legTokens = Seq(100L, 200L, 300L),
        legQtys = Seq(1.0, 1.0, 1.0)),
      // sell the remaining 2 of token 300 @3.00: basis 4 → +2
      Fill(1, ts(3), 3, 300, isBuy = false, qty = 2, usd = 6.0)
    )
    val rows = Ledger.foldWallet(fills.iterator).toSeq
    val Seq(split, merge, sell) = rows
    assert(split.event_type == "split" && split.qty == 6.0 &&
      split.usd_delta == -12.0 && split.cost_basis == 12.0 &&
      split.realized_pnl == 0.0)
    assert(merge.event_type == "merge" && merge.qty == -3.0)
    assert(math.abs(merge.cost_basis - 6.0) < 1e-9)
    assert(math.abs(merge.realized_pnl - (-1.5)) < 1e-9)
    assert(math.abs(sell.cost_basis - 4.0) < 1e-9)
    assert(math.abs(sell.realized_pnl - 2.0) < 1e-9)
    // leftovers: 1×t200 @2.00 — prove it via the open-state fold
    val open = Ledger.foldWalletOpen(fills.iterator).toSeq
      .filter(_.event_type == "_open")
    assert(open.map(r => r.token_id -> r.qty).toMap == Map(200L -> 1.0))
    assert(math.abs(open.head.cost_basis - 2.0) < 1e-9)
  }

  test("multi-leg merge past holdings: unmatched remainder burns with zero basis") {
    val fills = Seq(
      Fill(1, ts(1), 1, 100, isBuy = false, qty = 0, usd = 6.0,
        kind = "split", legTokens = Seq(100L, 200L, 300L),
        legQtys = Seq(1.0, 1.0, 1.0)),     // each leg 1 @2.00
      // merge 2 of each: only 1 held per leg → basis 3×2.00 = 6,
      // remainder consumes nothing (reference consumeTokens remainder)
      Fill(1, ts(2), 2, 100, isBuy = false, qty = 0, usd = 9.0,
        kind = "merge", legTokens = Seq(100L, 200L, 300L),
        legQtys = Seq(2.0, 2.0, 2.0)))
    val rows = Ledger.foldWallet(fills.iterator).toSeq
    val merge = rows.last
    assert(merge.qty == -6.0 && math.abs(merge.cost_basis - 6.0) < 1e-9)
    assert(math.abs(merge.realized_pnl - 3.0) < 1e-9)
  }

  test("NegRisk conversion: burn NO legs, mint YES legs at reallocated basis") {
    // reference fallback path (ledger-engine.ts:1690-1706), 3-question
    // market, index set {0,1}: burn NO_0 and NO_1 (perQuestionQty = 2
    // each), mint YES_2 (qty 2). Hand oracle:
    //   basis = FIFO(NO_0, 2) + FIFO(NO_1, 2) = 2×0.40 + 2×0.60 = 2.00
    //   mint unit cost = 2.00 / 2 = 1.00; nothing realizes
    val fills = Seq(
      Fill(1, ts(1), 1, 10, isBuy = true, qty = 2, usd = 0.8),   // NO_0 @0.40
      Fill(1, ts(2), 2, 20, isBuy = true, qty = 2, usd = 1.2),   // NO_1 @0.60
      Fill(1, ts(3), 3, 10, isBuy = false, qty = 0, usd = 0.0,
        kind = "convert",
        legTokens = Seq(10L, 20L), legQtys = Seq(2.0, 2.0),      // burn side
        legTokens2 = Seq(30L), legQtys2 = Seq(2.0)),             // mint side
      // sell the converted YES_2 @1.20: basis 2×1.00 → realized +0.4
      Fill(1, ts(4), 4, 30, isBuy = false, qty = 2, usd = 2.4))
    val rows = Ledger.foldWallet(fills.iterator).toSeq
    val convert = rows(2)
    assert(convert.event_type == "convert" && convert.qty == 2.0)
    assert(convert.usd_delta == 0.0 && convert.realized_pnl == 0.0)
    assert(math.abs(convert.cost_basis - 2.0) < 1e-9)
    val sell = rows(3)
    assert(math.abs(sell.cost_basis - 2.0) < 1e-9)
    assert(math.abs(sell.realized_pnl - 0.4) < 1e-9)
    // no NO lots remain
    val open = Ledger.foldWalletOpen(fills.iterator).toSeq
      .filter(_.event_type == "_open")
    assert(open.isEmpty)
  }

  test("NegRisk conversion with zero burned basis falls back to last-seen price") {
    val fills = Seq(
      // trade YES_2 once so the wallet has a last price for it (sell
      // unit price 0.70 — the wallet holds nothing afterwards)
      Fill(1, ts(1), 1, 30, isBuy = true, qty = 1, usd = 0.5),
      Fill(1, ts(2), 2, 30, isBuy = false, qty = 1, usd = 0.7),
      // convert burning a token with NO open lots: basis 0, so the
      // minted YES_2 is booked at lastPrice(30) = 0.70 (:1723)
      Fill(1, ts(3), 3, 99, isBuy = false, qty = 0, usd = 0.0,
        kind = "convert",
        legTokens = Seq(99L), legQtys = Seq(2.0),
        legTokens2 = Seq(30L), legQtys2 = Seq(2.0)),
      // sell both @1.00: basis 2×0.70 = 1.40 → realized +0.6
      Fill(1, ts(4), 4, 30, isBuy = false, qty = 2, usd = 2.0))
    val rows = Ledger.foldWallet(fills.iterator).toSeq
    assert(rows(2).cost_basis == 0.0)
    assert(math.abs(rows(3).cost_basis - 1.4) < 1e-9)
    assert(math.abs(rows(3).realized_pnl - 0.6) < 1e-9)
  }

  test("multi-leg redemption burns transfer-derived amounts for a lump payout") {
    // adapter_redemption (ledger-engine.ts:1360-1460): burn 2×YES_0
    // (@0.40) and 1×YES_1 (@0.60), lump payout 2.0 →
    // realized = 2.0 − (0.8 + 0.6) = +0.6
    val fills = Seq(
      Fill(1, ts(1), 1, 10, isBuy = true, qty = 2, usd = 0.8),
      Fill(1, ts(2), 2, 20, isBuy = true, qty = 1, usd = 0.6),
      Fill(1, ts(3), 3, 10, isBuy = false, qty = 0, usd = 2.0,
        kind = "redeem", legTokens = Seq(10L, 20L), legQtys = Seq(2.0, 1.0)))
    val rows = Ledger.foldWallet(fills.iterator).toSeq
    val redeem = rows(2)
    assert(redeem.event_type == "redeem" && redeem.qty == -3.0)
    assert(math.abs(redeem.cost_basis - 1.4) < 1e-9)
    assert(math.abs(redeem.usd_delta - 2.0) < 1e-9)
    assert(math.abs(redeem.realized_pnl - 0.6) < 1e-9)
    // single-leg form: redeem qty of tokenId without legs
    val single = Ledger.foldWallet(Seq(
      Fill(2, ts(1), 1, 10, isBuy = true, qty = 2, usd = 0.8),
      Fill(2, ts(2), 2, 10, isBuy = false, qty = 2, usd = 2.0,
        kind = "redeem")).iterator).toSeq.last
    assert(single.qty == -2.0 && math.abs(single.realized_pnl - 1.2) < 1e-9)
  }

  test("mid-stream resolution wipes losing positions at event time") {
    val fills = Seq(
      Fill(1, ts(1), 1, 100, isBuy = true, qty = 10, usd = 4.0),  // @0.40
      // losing outcome resolves: whole position wiped, −4.0 realized
      Fill(1, ts(2), 2, 100, isBuy = false, qty = 0, usd = 0.0,
        kind = "resolution"),
      // a later sell of the same token finds an EMPTY book: oversold,
      // zero basis, full proceeds realized
      Fill(1, ts(3), 3, 100, isBuy = false, qty = 3, usd = 0.6))
    val rows = Ledger.foldWallet(fills.iterator).toSeq
    val loss = rows(1)
    assert(loss.event_type == "resolution_loss" && loss.qty == -10.0)
    assert(math.abs(loss.cost_basis - 4.0) < 1e-9)
    assert(math.abs(loss.realized_pnl - (-4.0)) < 1e-9)
    assert(loss.usd_delta == 0.0)
    val sell = rows(2)
    assert(sell.cost_basis == 0.0 && math.abs(sell.realized_pnl - 0.6) < 1e-9)
    // multi-token form via legs; tokens never held contribute nothing
    val multi = Ledger.foldWallet(Seq(
      Fill(2, ts(1), 1, 10, isBuy = true, qty = 2, usd = 1.0),
      Fill(2, ts(2), 2, 10, isBuy = false, qty = 0, usd = 0.0,
        kind = "resolution", legTokens = Seq(10L, 20L),
        legQtys = Seq(0.0, 0.0))).iterator).toSeq.last
    assert(multi.qty == -2.0 && math.abs(multi.realized_pnl - (-1.0)) < 1e-9)
  }

  test("transfer_out consumes basis without realizing; transfer_in uses own avg cost") {
    val fills = Seq(
      Fill(1, ts(1), 1, 100, isBuy = true, qty = 10, usd = 10.0),  // @1.00
      Fill(1, ts(2), 2, 100, isBuy = true, qty = 10, usd = 30.0),  // @3.00, avg 2.00
      Fill(1, ts(3), 3, 100, isBuy = false, qty = 5, usd = 0.0,
        kind = "transfer_in"),                                     // in @avg 2.00
      Fill(1, ts(4), 4, 100, isBuy = false, qty = 12, usd = 0.0,
        kind = "transfer_out"),                  // out: 10@1 + 2@3 = basis 16
      Fill(1, ts(5), 5, 100, isBuy = false, qty = 13, usd = 39.0)
        // sell all: 8@3 + 5@2 = basis 34, realized 5
    )
    val rows = Ledger.foldWallet(fills.iterator).toSeq
    val tin = rows(2); val tout = rows(3); val sell = rows(4)
    assert(tin.event_type == "transfer_in" && tin.qty == 5.0)
    assert(math.abs(tin.cost_basis - 10.0) < 1e-9 && tin.realized_pnl == 0.0)
    assert(tout.event_type == "transfer_out" && tout.qty == -12.0 &&
      tout.usd_delta == 0.0 && tout.realized_pnl == 0.0)
    assert(math.abs(tout.cost_basis - 16.0) < 1e-9)
    assert(math.abs(sell.cost_basis - 34.0) < 1e-9)
    assert(math.abs(sell.realized_pnl - 5.0) < 1e-9)
  }

  test("transfer_in with no prior lots carries zero basis") {
    val fills = Seq(
      Fill(1, ts(1), 1, 100, isBuy = false, qty = 5, usd = 0.0, kind = "transfer_in"),
      Fill(1, ts(2), 2, 100, isBuy = false, qty = 5, usd = 4.0)  // sell: 0 basis
    )
    val rows = Ledger.foldWallet(fills.iterator).toSeq
    assert(rows(0).cost_basis == 0.0)
    assert(math.abs(rows(1).realized_pnl - 4.0) < 1e-9)
  }

  test("convert carries FIFO basis to the new token; fee events move cash and fees only") {
    val fills = Seq(
      Fill(1, ts(1), 1, 100, isBuy = true, qty = 10, usd = 10.0),  // @1.00
      Fill(1, ts(2), 2, 100, isBuy = true, qty = 10, usd = 30.0),  // @3.00
      // convert 12 of token 100 → token 500: basis 10·1 + 2·3 = 16
      Fill(1, ts(3), 3, 100, isBuy = false, qty = 12, usd = 0.0,
        kind = "convert", tokenId2 = 500),
      // sell all 12 of token 500 @2.00: realized 24 − 16 = 8
      Fill(1, ts(4), 4, 500, isBuy = false, qty = 12, usd = 24.0),
      Fill(1, ts(5), 5, 0, isBuy = false, qty = 0, usd = 3.0, kind = "fee_refund"),
      Fill(1, ts(6), 6, 0, isBuy = false, qty = 0, usd = 1.0, kind = "fee_withdrawal"))
    val rows = Ledger.foldWallet(fills.iterator).toSeq
    val conv = rows(2); val sell = rows(3); val refund = rows(4); val draw = rows(5)
    assert(conv.event_type == "convert" && conv.token_id == 500)
    assert(math.abs(conv.cost_basis - 16.0) < 1e-9 && conv.realized_pnl == 0.0)
    assert(math.abs(sell.cost_basis - 16.0) < 1e-9)
    assert(math.abs(sell.realized_pnl - 8.0) < 1e-9)
    assert(refund.usd_delta == 3.0 && refund.fee == -3.0 && refund.qty == 0.0)
    // fee_withdrawal is income like fee_refund (ledger-engine.ts:1838-1862)
    assert(draw.usd_delta == 1.0 && draw.fee == -1.0)
    // token 100 still holds 8 @3.00 after the partial convert
    val open = Ledger.foldWalletOpen(fills.iterator).toSeq
      .filter(_.event_type == "_open")
    assert(open.map(r => r.token_id -> r.qty).toMap == Map(100L -> 8.0))
    assert(math.abs(open.head.cost_basis - 24.0) < 1e-9)
  }

  test("period PnL modes: lot provenance splits realized and unrealized") {
    import graft.operators.Ledger.PeriodPnl
    val ps = Timestamp.valueOf("2024-06-01 00:00:00")
    val pe = Timestamp.valueOf("2024-07-01 00:00:00")
    def t(s: String) = Timestamp.valueOf(s)
    val fills = Seq(
      // token 100: lot opened BEFORE period @1.00, sold IN period @3.00
      //   → mode2 realized +20, mode1 nothing (lot predates period)
      Fill(1, t("2024-05-01 00:00:00"), 1, 100, isBuy = true, qty = 10, usd = 10.0),
      Fill(1, t("2024-06-10 00:00:00"), 2, 100, isBuy = false, qty = 10, usd = 30.0),
      // token 200: opened IN period @2.00, half sold IN period @5.00
      //   → mode1 = mode2 = +15; 5 left open, period-opened, basis 10
      Fill(1, t("2024-06-05 00:00:00"), 3, 200, isBuy = true, qty = 10, usd = 20.0),
      Fill(1, t("2024-06-20 00:00:00"), 4, 200, isBuy = false, qty = 5, usd = 25.0),
      // token 300: opened BEFORE period @1.00, never sold
      //   → open (history) 4 @1.00
      Fill(1, t("2024-01-01 00:00:00"), 5, 300, isBuy = true, qty = 4, usd = 4.0),
      // token 400: sold AFTER the period — no realized in any mode
      Fill(1, t("2024-06-15 00:00:00"), 6, 400, isBuy = true, qty = 2, usd = 2.0),
      Fill(1, t("2024-08-01 00:00:00"), 7, 400, isBuy = false, qty = 2, usd = 6.0))
    val out = Ledger.foldWalletPeriod(fills.iterator, ps, pe)
      .map(p => p.token_id -> p).toMap
    val t100 = out(100L)
    assert(math.abs(t100.realized_with_history - 20.0) < 1e-9)
    assert(t100.realized_period_only == 0.0 && t100.open_qty_all == 0.0)
    val t200 = out(200L)
    assert(math.abs(t200.realized_period_only - 15.0) < 1e-9)
    assert(math.abs(t200.realized_with_history - 15.0) < 1e-9)
    assert(t200.open_qty_period == 5.0 && math.abs(t200.open_basis_period - 10.0) < 1e-9)
    val t300 = out(300L)
    assert(t300.open_qty_all == 4.0 && t300.open_qty_period == 0.0)
    assert(!out.contains(400L) || out(400L).realized_with_history == 0.0)
  }

  test("DataFrame-dim resolution settlement matches the Map-based fold") {
    import org.apache.spark.sql.functions._
    val wt = operators.Leaderboard.walletTrades(model.Tables.trades(spark, sf))
    val resMap: Map[Long, Double] = (1L to 3000L).map(t => t -> (if (t % 2 == 0) 1.0 else 0.0)).toMap
    val resDf = spark.range(1, 3001).select(col("id").as("token_id"),
      when(col("id") % 2 === 0, 1.0).otherwise(0.0).as("payout"))
    val a = Ledger.resolvedSummary(Ledger.buildResolved(spark, wt, resMap).toDF())
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val b = Ledger.resolvedSummary(Ledger.buildResolved(spark, wt, resDf).toDF())
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (w, v) =>
      assert(math.abs(v - b(w)) < 1e-6, s"wallet $w: $v vs ${b(w)}")
    }
  }

  test("property: realized total = cashflow + inventory at cost (random fills)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.{Test => SCTest}
    val fillGen = for {
      n <- Gen.choose(1, 60)
      fills <- Gen.listOfN(n, for {
        tok <- Gen.oneOf(1L, 2L, 3L)
        isBuy <- Gen.oneOf(true, false)
        qty <- Gen.choose(1, 20)
        price <- Gen.choose(1, 99)
      } yield (tok, isBuy, qty.toDouble, qty * price / 100.0))
    } yield fills.zipWithIndex.map { case ((tok, b, q, usd), i) =>
      Fill(7L, ts(i % 60), i.toLong, tok, b, q, usd)
    }
    val prop = Prop.forAll(fillGen) { fills =>
      val rows = Ledger.foldWallet(fills.iterator).toSeq
      // invariant: Σ realized = Σ usd_delta (cashflow) + open inventory at cost.
      // usd_delta: buys −usd, sells +usd; realized counts only matched basis,
      // the rest is still on the books as open-lot cost.
      val realized = rows.map(_.realized_pnl).sum
      val cashflow = rows.map(_.usd_delta).sum
      // recompute open cost: buys' basis minus consumed basis
      val openCost = rows.filter(_.event_type == "buy").map(_.cost_basis).sum -
        rows.filter(_.event_type == "sell").map(_.cost_basis).sum
      // oversold beyond inventory realizes full proceeds (zero basis), so
      // the identity holds only when nothing was oversold; detect & skip
      val oversold = {
        val pos = scala.collection.mutable.Map.empty[Long, Double]
        var bad = false
        fills.foreach { f =>
          val d = if (f.isBuy) f.qty else -f.qty
          val v = pos.getOrElse(f.tokenId, 0.0) + d
          if (v < -1e-9) bad = true
          pos(f.tokenId) = v
        }
        bad
      }
      oversold || math.abs(realized - (cashflow + openCost)) < 1e-6
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("whale wallet: 2M-fill history folds streaming, state = open lots") {
    // SURVEY §5 claims the per-wallet fold is bounded by OPEN-LOT
    // state, not history length (the fill slice is a streaming
    // sub-iterator; rows emit lazily). Evidence: fold one wallet's
    // 2M-fill history off a LAZY iterator — a buffered design would
    // materialize 2M Fill + 2M LedgerRow objects and blow the test
    // heap; the streaming fold holds ≤ 3 open lots (alternating
    // buy/sell per token) and completes in seconds. The
    // realized = cashflow + inventory-at-cost identity is checked on
    // running sums so the output is never materialized either.
    val n = 2000000
    def fills: Iterator[Fill] = Iterator.range(0, n).map { i =>
      val tok = (i % 3 + 1).toLong
      val isBuy = (i / 3) % 2 == 0 // per token: buy then sell, repeat
      Fill(9L, ts(i % 60), i.toLong, tok, isBuy, 1.0, 1.0 + (i % 7) * 0.25)
    }
    var rows = 0L; var opens = 0L
    var realized = 0.0; var cash = 0.0; var buyBasis = 0.0; var sellBasis = 0.0
    Ledger.foldWalletOpen(fills).foreach { r =>
      if (r.event_type == "_open") opens += 1
      else {
        rows += 1; realized += r.realized_pnl; cash += r.usd_delta
        if (r.event_type == "buy") buyBasis += r.cost_basis
        if (r.event_type == "sell") sellBasis += r.cost_basis
      }
    }
    assert(rows == n)
    assert(opens <= 3, s"open-lot state must stay bounded, got $opens")
    assert(math.abs(realized - (cash + (buyBasis - sellBasis))) < 1.0,
      s"identity drift: $realized vs ${cash + (buyBasis - sellBasis)}")
  }

  test("distributed build under whale skew: one wallet holds half of all fills") {
    // ledger-engine.ts processes wallets sequentially; Spark's win is
    // parallelism ACROSS wallets, so the bound is the worst single
    // wallet. 1 whale with 50% of fills + 2000 small wallets: the
    // build completes (whale = one streaming task, small wallets fan
    // out) and the whale's realized matches the sequential fold
    // exactly.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val n = 40000
    val whale = (0 until n).map { i =>
      (9999999L, ts(i % 60), i.toLong, (i % 3 + 1).toLong,
        (i / 3) % 2 == 0, 1.0, 1.0 + (i % 7) * 0.25)
    }
    val small = (0 until n).map { i =>
      ((i % 2000).toLong, ts(i % 60), (n + i).toLong, (i % 5 + 1).toLong,
        i % 2 == 0, 1.0, 1.0 + (i % 11) * 0.125)
    }
    val df = (whale ++ small)
      .toDF("wallet", "ts", "trade_id", "token_id", "isbuy", "qty", "usd")
      .select(col("wallet"), col("ts"), col("trade_id"), col("token_id"),
        when(col("isbuy"), "buy").otherwise("sell").as("side"),
        col("qty"), col("usd"), lit(0.0).as("fee"))
    val ledger = Ledger.build(spark, df).toDF()
    assert(ledger.count() == 2L * n)
    val got = ledger
      .filter(col("wallet") === 9999999L && col("event_type") === "sell")
      .agg(sum(col("realized_pnl"))).head.getDouble(0)
    val want = Ledger.foldWallet(
        whale.sortBy(f => (f._2.getTime, f._3)).iterator.map { f =>
          Fill(f._1, f._2, f._3, f._4, f._5, f._6, f._7)
        })
      .filter(_.event_type == "sell").map(_.realized_pnl).sum
    assert(math.abs(got - want) < 1e-6, s"whale realized: $got vs $want")
  }

  test("distributed build matches single-threaded fold per wallet") {
    import org.apache.spark.sql.functions._
    val wt = operators.Leaderboard.walletTrades(model.Tables.trades(spark, sf))
    val ledger = Ledger.build(spark, wt)
    // per-wallet sequential oracle on the driver
    val fills = wt.select(col("wallet").cast("long"), col("ts"),
        col("trade_id").cast("long"), col("token_id").cast("long"),
        (col("side") === "buy"), col("qty").cast("double"),
        col("usd").cast("double"))
      .collect()
      .map(r => Fill(r.getLong(0),
        r.get(1) match {
          case t: Timestamp => t
          case t: java.time.LocalDateTime => Timestamp.valueOf(t)
        }, r.getLong(2), r.getLong(3), r.getBoolean(4), r.getDouble(5),
        r.getDouble(6)))
    val expected = fills.groupBy(_.wallet).view.mapValues { fs =>
      Ledger.foldWallet(fs.sortBy(f => (f.ts.getTime, f.seq)).iterator)
        .filter(_.event_type == "sell").map(_.realized_pnl).sum
    }.toMap
    val got = ledger.toDF().groupBy("wallet")
      .agg(sum(when(col("event_type") === "sell", col("realized_pnl"))
        .otherwise(0.0)).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (w, r) =>
      assert(math.abs(r - expected(w)) < 1e-6, s"wallet $w: $r vs ${expected(w)}")
    }
  }

  test("backfill of dirty wallets is row-identical to a full rebuild") {
    import graft.model.Tables
    import graft.operators.Leaderboard
    val wt = Leaderboard.walletTrades(Tables.trades(spark, sf))
    val full = Ledger.build(spark, wt).toDF()
    // pretend wallets 1..200 changed: start from a full build, drop +
    // refold only those
    val dirty = spark.range(1, 201).toDF("wallet")
    val back = Ledger.backfill(spark, full, wt, dirty)
    assert(back.count() == full.count())
    // exact row-multiset equality both directions (same fold, same
    // per-wallet input order → bit-identical doubles)
    assert(back.exceptAll(full).isEmpty && full.exceptAll(back).isEmpty)
  }

  test("fold invariants hold for random fill sequences (scalacheck)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.{Test => SCTest}
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val fillGen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        token <- Gen.choose(1L, 3L)
        buy <- Gen.oneOf(true, false)
        qty <- Gen.choose(1, 20)
        price <- Gen.choose(1, 500)
      } yield (token, buy, qty.toDouble, qty.toDouble * price))
    } yield rows
    val prop = Prop.forAll(fillGen) { rows =>
      val fills = rows.zipWithIndex.map { case ((tok, buy, qty, usd), i) =>
        Ledger.Fill(1L, new Timestamp(base + i * 1000L), i.toLong, tok,
          buy, qty, usd)
      }
      val out = Ledger.foldWallet(fills.iterator).toSeq
      val byTok = out.groupBy(_.token_id)
      byTok.forall { case (tok, rs) =>
        val buys = rs.filter(_.event_type == "buy")
        val sells = rs.filter(_.event_type == "sell")
        val buyUsd = buys.map(-_.usd_delta).sum
        val consumedBasis = sells.map(_.cost_basis).sum
        val realized = sells.map(_.realized_pnl).sum
        val proceeds = sells.map(_.usd_delta).sum
        // (a) realized = proceeds − consumed basis
        // (b) consumed basis never exceeds what was ever bought
        // (c) one ledger row per fill
        math.abs(realized - (proceeds - consumedBasis)) < 1e-6 &&
          consumedBasis <= buyUsd + 1e-6 &&
          rs.size == fills.count(_.tokenId == tok)
      }
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("differential: distributed generalized fold ≡ local fold, any partitioning") {
    // buildEvents' machinery under test is everything AROUND the
    // per-wallet fold: the repartition, the value-determined tie sort,
    // and the streaming wallet-slice iterator. A seeded random stream
    // over EVERY event kind (with deliberate ts ties across wallets
    // and events) folded locally per wallet must equal the distributed
    // build row-for-row at 1, 3 and 7 input partitions.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val kinds = Seq("buy", "sell", "split", "merge", "transfer_in",
      "transfer_out", "redeem", "convert", "resolution", "fee_refund",
      "fee_withdrawal")
    val events = for {
      w <- 1L to 4L
      i <- 0 until 120
    } yield {
      val kind = kinds(rnd.nextInt(kinds.length))
      val tok = rnd.nextInt(3) + 1L
      val qty = (rnd.nextInt(5) + 1).toDouble
      val usd = (rnd.nextInt(400) + 25) / 4.0
      val legs = kind match {
        case "split" | "merge" if rnd.nextBoolean() =>
          (Seq(tok + 10L, tok + 20L, tok + 30L), Seq(qty, qty + 1, qty + 2))
        case "redeem" | "resolution" if rnd.nextBoolean() =>
          (Seq(tok, tok + 10L), Seq(qty, qty))
        case _ => (Seq.empty[Long], Seq.empty[Double])
      }
      val legs2 = kind match {
        case "convert" if rnd.nextBoolean() =>
          (Seq(tok + 40L), Seq(qty))
        case _ => (Seq.empty[Long], Seq.empty[Double])
      }
      // ts ties everywhere (only 7 distinct seconds); seq unique per
      // wallet so the fold order is total
      (w, ts(i % 7), i.toLong, tok, kind, qty, usd,
        (rnd.nextInt(100)) / 10.0, tok + 5L,
        legs._1, legs._2, legs2._1, legs2._2)
    }
    val df = events.toDF("wallet", "ts", "seq", "token_id", "kind", "qty",
      "usd", "fee", "token_id2", "leg_tokens", "leg_qtys", "leg_tokens2",
      "leg_qtys2")
    // local reference: the same Fill mapping, grouped and sorted in
    // plain Scala, folded with the single-wallet fold
    def key(r: LedgerRow) = (r.wallet, r.ts, r.seq, r.token_id, r.event_type,
      math.round(r.qty * 1e6), math.round(r.usd_delta * 1e6),
      math.round(r.cost_basis * 1e6), math.round(r.realized_pnl * 1e6),
      math.round(r.fee * 1e6))
    val local = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val fills = es.sortBy(e => (e._2.getTime, e._3,
          if (e._5 == "buy") 0 else 1, e._7))
        .map(e => Fill(e._1, e._2, e._3, e._4, e._5 == "buy", e._6, e._7,
          e._8, if (e._5 == "buy" || e._5 == "sell") "" else e._5, e._9,
          e._10, e._11, e._12, e._13))
      Ledger.foldWallet(fills.iterator)
    }.map(key).groupBy(identity).view.mapValues(_.size).toMap
    for (parts <- Seq(1, 3, 7)) {
      val got = Ledger.buildEvents(spark, df.repartition(parts))
        .collect().map(key).groupBy(identity).view.mapValues(_.size).toMap
      assert(got == local, s"distributed fold diverged at $parts partitions")
    }
  }
}
