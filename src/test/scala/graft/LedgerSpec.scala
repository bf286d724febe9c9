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
}
