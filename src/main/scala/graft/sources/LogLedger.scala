package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raw-log → ledger-event topology: the seams that turn DECODED event
  * rows into [[graft.operators.Ledger.buildEvents]] input.
  *
  * Reference: main.ts's handler fan-out is exactly this shape — one
  * log stream, per-family handlers (main.ts:254-633) that decode their
  * family and append the corresponding ledger events to the wallet
  * ledger (ledger-engine.ts buildEvents): OrderFilled → maker+taker
  * fills, ERC1155 transfers → transfer_out/in pairs, ConditionalTokens
  * PositionSplit/PositionsMerge/PayoutRedemption → split/merge/redeem,
  * ConditionResolution → mid-stream losing-outcome wipes, NegRisk
  * PositionsConverted → conversions, FeeModule → fee cash events.
  *
  * Spark-first: every seam is a pure column projection over a decoded
  * frame — stateless, scan-stage, no shuffle of its own; the single
  * shuffle of the whole ingest→ledger pipeline is the per-wallet fold
  * repartition inside buildEvents. At 100 TB the decode+seam is the
  * map side of ingest, exactly like the reference's streaming handlers.
  *
  * Position-token registry: the reference resolves (conditionId,
  * indexSet) → ERC1155 position id through the CTF's getPositionId /
  * its token registry tables. Every token-producing seam takes an
  * optional `registry` dim — schema (condition, index_set, token_id
  * [, yes_token_id]) — that is broadcast-joined as a per-condition
  * set→token map, so a real deployment injects the CTF registry
  * table and the mapping is arbitrary (ids of any magnitude; no
  * arithmetic-range assumption). [[formulaRegistry]] builds the
  * deterministic stand-in as a dim —
  *   token(c, is) = (c − TokenIdBase) + 100000·is, YES at +50000
  * — which is also what the seams fall back to inline when no
  * registry is passed (fixture convenience; valid while base token
  * ids stay < 50000, true at the driver SFs).
  *
  * Amount conventions match [[LogDecode.decodedToTrades]]: on-chain
  * 6-decimal integers; event `qty` = amount/1e6 shares, event `usd` =
  * amount/100 (1e-4-USD integer units, the exact-twin scale).
  */
object LogLedger {
  import LogDecode._

  /** positionToken slot stride (see registry note above). */
  val SlotStride = 100000L

  /** NegRisk YES-token offset from its NO token. */
  val YesOffset = 50000L

  /** The fixture's counterparty wallet for aux fills (sells every aux
    * position it never held — the oversold path, zero basis). */
  val SinkWallet = 4999999L

  /** Offset of the transfer fixture's receiving wallet. */
  val TransferPeer = 5000000L

  private val noLegs = Seq(
    lit(null).cast("array<long>").as("leg_tokens"),
    lit(null).cast("array<double>").as("leg_qtys"),
    lit(null).cast("array<long>").as("leg_tokens2"),
    lit(null).cast("array<double>").as("leg_qtys2"))

  /** (conditionHexWord, indexSet) → position token id — the inline
    * formula stand-in (see the registry note above). */
  private def positionToken(conditionHex: Column, indexSet: Column): Column =
    (wordLong(conditionHex) - TokenIdBase) + lit(SlotStride) * indexSet

  // ---------------------------------------------------------------
  // position-token registry dim
  // ---------------------------------------------------------------

  /** The deterministic formula as a registry DIM: one row per
    * (condition word, index set 1..maxSet), token ids by the stand-in
    * arithmetic, YES complements at +[[YesOffset]]. The test
    * fixture's dim — a real deployment feeds the seams the CTF
    * registry table (getPositionId materialized) with this schema
    * instead: `condition` (raw 32-byte-word value), `index_set`,
    * `token_id`, optional `yes_token_id`. */
  def formulaRegistry(conditionWords: DataFrame, maxSet: Int = 2): DataFrame =
    conditionWords
      .select(col("condition").cast("long").as("condition"))
      .where(col("condition").isNotNull).distinct()
      .select(col("condition"),
        explode(sequence(lit(1L), lit(maxSet.toLong))).as("index_set"))
      .select(col("condition"), col("index_set"),
        (col("condition") - TokenIdBase + lit(SlotStride) * col("index_set"))
          .as("token_id"))
      .withColumn("yes_token_id", col("token_id") + YesOffset)

  /** Registry → one row per condition carrying a set→tokens map.
    * Dim-sized by construction (markets × slot count), so it rides a
    * broadcast join and array-valued legs look tokens up per element
    * with no explode/re-group shuffle. */
  private def tokenMapDim(registry: DataFrame): DataFrame = {
    val yes = if (registry.columns.contains("yes_token_id"))
      col("yes_token_id") else lit(null)
    registry.groupBy(col("condition"))
      .agg(map_from_entries(collect_list(struct(
        col("index_set").cast("long"),
        struct(col("token_id").cast("long").as("no"),
          yes.cast("long").as("yes"))))).as("__tok_map"))
  }

  /** Broadcast-attach `__tok_map` keyed by the hex condition/market
    * word. Left join: a condition missing from the registry keeps a
    * null map, so its legs surface as nulls downstream (a visible
    * registry gap) instead of the event silently disappearing. */
  private def withTokenMap(decoded: DataFrame, condHex: Column,
                           registry: DataFrame): DataFrame =
    decoded.join(broadcast(tokenMapDim(registry)),
      wordLong(condHex) === col("condition"), "left").drop("condition")

  /** Per-element token lookup: registry map when injected, the
    * formula stand-in otherwise. */
  private def lookupToken(registry: Option[DataFrame], condHex: Column)
                         (is: Column): Column = registry match {
    case Some(_) =>
      element_at(col("__tok_map"), is.cast("long")).getField("no")
    case None => positionToken(condHex, is)
  }

  // ---------------------------------------------------------------
  // seams: decoded frames → Ledger.buildEvents rows
  // ---------------------------------------------------------------

  /** Decoded OrderFilled → buy/sell fill events for BOTH wallets of
    * each fill (main.ts:262-300 writes maker- and taker-side rows).
    * `seqOf` maps the decoded trade id (= log index) to the event
    * sequence number. usd lands in 1e-4-USD units. */
  def tradeEvents(decodedOrderFilled: DataFrame,
                  seqOf: Column => Column): DataFrame =
    graft.operators.Leaderboard
      .walletTrades(decodedToTrades(decodedOrderFilled))
      .select(Seq(
        col("wallet").cast("long").as("wallet"), col("ts"),
        seqOf(col("trade_id")).cast("long").as("seq"),
        col("token_id").cast("long").as("token_id"),
        col("side").as("kind"),
        col("qty").cast("double").as("qty"),
        round(col("usd") * 10000).cast("long").cast("double").as("usd"),
        lit(0.0).as("fee"), lit(0L).as("token_id2")) ++ noLegs: _*)

  /** Decoded ConditionalTokens split/merge/redeem rows → ledger events
    * (main.ts:305-380): the index-set array becomes the per-outcome
    * leg list through the position-token registry; split/merge move
    * `amount` per outcome (the CTF 1:1 mint/burn), redemption burns
    * `redeemQtyPerLeg` per outcome (the reference derives redemption
    * quantities from the tx's ERC1155 transfers, not the log — this
    * parameter is that injection point; the fixture uses unit lots). */
  def conditionEvents(decoded: DataFrame,
                      redeemQtyPerLeg: Column = lit(1.0),
                      registry: Option[DataFrame] = None): DataFrame = {
    val cPrime = wordLong(col("condition_hex")) - TokenIdBase
    val shares = (col("amount_i") / 1000000L).cast("double")
    val isRedeem = col("kind") === "redeem"
    val tok = lookupToken(registry, col("condition_hex")) _
    registry.fold(decoded)(withTokenMap(decoded, col("condition_hex"), _))
      .select(Seq(
      col("wallet").cast("long").as("wallet"), col("ts"),
      col("log_index").cast("long").as("seq"),
      cPrime.as("token_id"),
      col("kind"),
      lit(0.0).as("qty"),
      (col("amount_i") / 100L).cast("double").as("usd"),
      lit(0.0).as("fee"), lit(0L).as("token_id2"),
      transform(col("index_sets"), is => tok(is)).as("leg_tokens"),
      when(isRedeem, transform(col("index_sets"), _ => redeemQtyPerLeg))
        .otherwise(transform(col("index_sets"), _ => shares)).as("leg_qtys"),
      lit(null).cast("array<long>").as("leg_tokens2"),
      lit(null).cast("array<double>").as("leg_qtys2")): _*)
  }

  /** Decoded ConditionResolution rows → mid-stream resolution events
    * wiping the position tokens of every ZERO-payout slot
    * (main.ts:380-435; ledger-engine.ts:1865-1908 resolution losses).
    * Winning slots keep their lots — their payout rides the
    * settlement path, not the wipe. Conditions with no losing slot
    * emit nothing. */
  def resolutionEvents(decodedLifecycle: DataFrame,
                       registry: Option[DataFrame] = None): DataFrame = {
    val cPrime = wordLong(col("condition_hex")) - TokenIdBase
    // greatest(…, 1): sequence(1, 0) is DESCENDING [1, 0] in Spark, so
    // an empty payouts array (a reordered foreign row) must not reach
    // it; try_element_at keeps the probe null-safe there too
    val losing = filter(
      sequence(lit(1), greatest(size(col("payouts")), lit(1))),
      i => try_element_at(col("payouts"), i) === 0L)
    val tok = lookupToken(registry, col("condition_hex")) _
    val filtered = decodedLifecycle
      .filter(col("kind") === "resolve" && size(col("payouts")) > 0)
    registry.fold(filtered)(withTokenMap(filtered, col("condition_hex"), _))
      .select(Seq(
        col("ts"),
        col("log_index").cast("long").as("seq"),
        cPrime.as("token_id"),
        lit("resolution").as("kind"),
        lit(0.0).as("qty"), lit(0.0).as("usd"), lit(0.0).as("fee"),
        lit(0L).as("token_id2"),
        transform(losing, i => tok(i)).as("leg_tokens"),
        transform(losing, _ => lit(0.0)).as("leg_qtys"),
        lit(null).cast("array<long>").as("leg_tokens2"),
        lit(null).cast("array<double>").as("leg_qtys2")): _*)
      .filter(size(col("leg_tokens")) > 0)
  }

  /** Expand a per-condition resolution event to every affected wallet.
    * A resolution log names no wallet — the reference applies it to
    * every holder of the losing tokens; `holders` is the (wallet,
    * token_id) dim of wallets that ever touched a token. One
    * leg-explode + join keyed by token, re-grouped per (wallet, log):
    * at 100 TB both sides partition by token, and the re-group is
    * per-wallet-sized. */
  def resolutionEventsPerWallet(resolutions: DataFrame,
                                holders: DataFrame): DataFrame = {
    val exploded = resolutions.select(
      col("ts"), col("seq"), col("token_id"), col("kind"),
      explode(col("leg_tokens")).as("leg"))
    exploded
      .join(holders.select(col("wallet").cast("long").as("wallet"),
        col("token_id").cast("long").as("leg")), Seq("leg"))
      .groupBy(col("wallet"), col("ts"), col("seq"), col("token_id"),
        col("kind"))
      .agg(sort_array(collect_set(col("leg"))).as("leg_tokens"))
      .select(Seq(
        col("wallet"), col("ts"), col("seq"), col("token_id"), col("kind"),
        lit(0.0).as("qty"), lit(0.0).as("usd"), lit(0.0).as("fee"),
        lit(0L).as("token_id2"),
        col("leg_tokens"),
        transform(col("leg_tokens"), _ => lit(0.0)).as("leg_qtys"),
        lit(null).cast("array<long>").as("leg_tokens2"),
        lit(null).cast("array<double>").as("leg_qtys2")): _*)
  }

  /** Decoded TransferSingle → transfer_out (sender) + transfer_in
    * (receiver) events (main.ts:440-483). Zero-address counterparties
    * (mint/burn) emit no wallet event, like the reference's guards. */
  def transferEvents(decoded: DataFrame): DataFrame = {
    val qty = (col("amount_i") / 1000000L).cast("double")
    val token = (col("token_id") - TokenIdBase).as("token_id")
    def side(wallet: Column, kind: String) =
      decoded.filter(wallet =!= 0L).select(Seq(
        wallet.cast("long").as("wallet"), col("ts"),
        col("log_index").cast("long").as("seq"),
        token, lit(kind).as("kind"), qty.as("qty"),
        lit(0.0).as("usd"), lit(0.0).as("fee"),
        lit(0L).as("token_id2")) ++ noLegs: _*)
    side(col("from"), "transfer_out")
      .unionByName(side(col("to"), "transfer_in"))
  }

  /** Decoded NegRisk PositionsConverted → convert events
    * (main.ts:483-590; ledger-engine.ts:1670-1750). The binary
    * identity-swap form: burn the NO token of the index-set question,
    * mint its YES complement at the same basis. (The multi-question
    * leg-list form is exercised relationally in q_ledger_events /
    * LedgerSpec — the registry stand-in keeps the log path binary.) */
  def convertEvents(decodedNegRisk: DataFrame,
                    registry: Option[DataFrame] = None): DataFrame = {
    val entry = element_at(col("__tok_map"), col("index_set").cast("long"))
    val noTok = registry.fold(
      positionToken(col("market_hex"), col("index_set")))(
      _ => entry.getField("no"))
    val yesTok = registry.fold(noTok + YesOffset)(_ => entry.getField("yes"))
    val converts = decodedNegRisk.filter(col("kind") === "convert")
    registry.fold(converts)(withTokenMap(converts, col("market_hex"), _))
      .select(Seq(
        col("wallet").cast("long").as("wallet"), col("ts"),
        col("log_index").cast("long").as("seq"),
        noTok.as("token_id"),
        lit("convert").as("kind"),
        (col("amount_i") / 1000000L).cast("double").as("qty"),
        lit(0.0).as("usd"), lit(0.0).as("fee"),
        yesTok.as("token_id2")) ++ noLegs: _*)
  }

  /** Decoded FeeModule rows → fee_refund / fee_withdrawal cash events
    * (main.ts:590-633): usdc in, fees_paid down; kind names already
    * match the ledger's cash-event kinds. */
  def feeEvents(decodedFees: DataFrame): DataFrame = {
    val usd = (when(col("kind") === "fee_refund", col("refund_i"))
      .otherwise(col("amount_i")) / 100L).cast("double")
    decodedFees.select(Seq(
      col("to_wallet").cast("long").as("wallet"), col("ts"),
      col("log_index").cast("long").as("seq"),
      lit(0L).as("token_id"),
      col("kind"),
      lit(0.0).as("qty"), usd.as("usd"), lit(0.0).as("fee"),
      lit(0L).as("token_id2")) ++ noLegs: _*)
  }

  // ---------------------------------------------------------------
  // fixture: deterministic raw logs exercising every event family
  // ---------------------------------------------------------------

  /** Deterministic raw-log fixture covering every non-fill ledger
    * event family, driven by the taker-side fills (columns: trade_id,
    * ts, wallet, token_id, usd). All values are closed-form functions
    * of (trade_id, token_id, ui = usd·1e4) that the DuckDB oracle
    * recomputes relationally. Sequence layout per source trade j
    * (seq = j·10 + off, matching the fill's own seq j·10):
    *
    * | off | family (selector)            | logs                      |
    * |-----|------------------------------|---------------------------|
    * | 1   | aux position buys (4 fams)   | OrderFilled, sink maker   |
    * | 2   | convert (j%41)               | NR PositionsConverted     |
    * | 3   | redeem (j%43)                | CT PayoutRedemption       |
    * | 4   | resolution (j%47)            | CT ConditionResolution    |
    * | 5/6 | split+merge (j%13)           | CT PositionSplit/Merge    |
    * | 7   | transfer (j%19)              | ERC1155 TransferSingle    |
    * | 9   | fees (j%29 refund, j%31 wd)  | FeeModule both events     |
    *
    * Condition/market words per family (position tokens through the
    * registry rule, all ranges disjoint while base ids < 50000):
    * split/merge cond = t (legs t+100000, t+200000, amount k·1e6 with
    * k = ui%100000+1, merge amount ⌊k/2⌋·1e6); redeem cond = t+200000
    * (leg t+300000, payout ⌊ui/2⌋·100); resolution cond = t+300000
    * (numerators [0,1] → slot-1 token t+400000 loses); convert market
    * = t+400000, set 1 (NO t+500000 → YES t+550000); transfers move
    * token t+600000 to wallet+5000000. Each family's position is
    * seeded by an off-1 aux OrderFilled buy of 1 share at the fill's
    * own usd. NegRisk convert and fee-refund rows are ALSO emitted
    * from the wrong contract address as decoys the address filters
    * must drop. */
  def encodeTopologyLogs(takerFills: DataFrame): DataFrame = {
    val f = takerFills.select(col("trade_id"), col("ts"), col("wallet"),
      col("token_id"), col("usd"),
      round(col("usd") * 10000).cast("long").as("ui"))
    def fam(m: Int): DataFrame = f.filter(pmod(col("trade_id"), lit(m)) === 0)
    def seq(off: Int): Column = (col("trade_id") * 10 + off).as("log_index")

    // off 1: one aux OrderFilled buy per family — taker buys 1 share
    // of the family's position token at the fill's usd; the sink
    // wallet takes the (oversold) sell side
    val auxTrades = Seq(19 -> 600000L, 41 -> 500000L, 43 -> 300000L,
        47 -> 400000L)
      .map { case (m, off) =>
        fam(m).select(
          (col("trade_id") * 10 + 1).as("trade_id"), col("ts"),
          lit(SinkWallet).as("maker"), col("wallet").as("taker"),
          (col("token_id") + off).as("token_id"),
          lit(1.0).as("qty"), col("usd"), lit(0.0).as("fee"),
          lit(false).as("is_maker_buy"))
      }
      .reduce(_.unionByName(_))
    val auxLogs = encodeOrderFilled(auxTrades)
      .withColumn("addr", lit(toAddr(777000L)))

    // off 5/6: CT PositionSplit / PositionsMerge on condition t —
    // data = [collateral, offset, amount, |sets|, 1, 2]
    val k = pmod(col("ui"), lit(100000L)) + 1L
    val mAmt = ((k - pmod(k, lit(2L))) / 2).cast("long")
    def condLog(off: Int, topic: String, amt: Column) =
      fam(13).select(
        seq(off), col("ts"), lit(ConditionalTokensAddr).as("addr"),
        lit(topic).as("topic0"),
        toWord(col("wallet")).as("topic1"),
        toWord(lit(0L)).as("topic2"),
        toWord(col("token_id") + TokenIdBase).as("topic3"),
        concat(toWord(lit(CollateralToken)), toWord(lit(96L)), toWord(amt),
          toWord(lit(2L)), toWord(lit(1L)), toWord(lit(2L))).as("data"))
    val splitLogs = condLog(5, PositionSplitTopic, k * 1000000L)
    val mergeLogs = condLog(6, PositionsMergeTopic, mAmt * 1000000L)

    // off 3: CT PayoutRedemption on condition t+200000 — redeem
    // layout (conditionId in data word 0, collateral indexed),
    // payout = ⌊ui/2⌋ in 1e-4 units → ·100 on-chain, index set [1]
    val payout = ((col("ui") - pmod(col("ui"), lit(2L))) / 2).cast("long")
    val redeemLogs = fam(43).select(
      seq(3), col("ts"), lit(ConditionalTokensAddr).as("addr"),
      lit(PayoutRedemptionTopic).as("topic0"),
      toWord(col("wallet")).as("topic1"),
      toWord(lit(CollateralToken)).as("topic2"),
      toWord(lit(0L)).as("topic3"),
      concat(toWord(col("token_id") + 200000L + TokenIdBase),
        toWord(lit(96L)), toWord(payout * 100L),
        toWord(lit(1L)), toWord(lit(1L))).as("data"))

    // off 4: CT ConditionResolution on condition t+300000 —
    // numerators [0, 1]: slot 1 (token t+400000) is the losing
    // outcome the seam wipes
    val resolutionLogs = fam(47).select(
      seq(4), col("ts"), lit(ConditionalTokensAddr).as("addr"),
      lit(ConditionResolutionTopic).as("topic0"),
      toWord(col("token_id") + 300000L + TokenIdBase).as("topic1"),
      toWord(col("wallet") + 900000L).as("topic2"),
      toWord(col("trade_id") + 7000000L).as("topic3"),
      concat(toWord(lit(2L)), toWord(lit(64L)), toWord(lit(2L)),
        toWord(lit(0L)), toWord(lit(1L))).as("data"))

    // off 2: NegRisk PositionsConverted on market t+400000, set 1,
    // amount 1 share
    val convertLogs = fam(41).select(
      seq(2), col("ts"), lit(NegRiskAdapterAddr).as("addr"),
      lit(NrPositionsConvertedTopic).as("topic0"),
      toWord(col("wallet")).as("topic1"),
      toWord(col("token_id") + 400000L + TokenIdBase).as("topic2"),
      toWord(lit(1L)).as("topic3"),
      toWord(lit(1000000L)).as("data"))

    // off 7: TransferSingle of 1 share of t+600000 to wallet+peer
    val transferLogs = encodeTransferSingle(
      fam(19).select(
        (col("trade_id") * 10 + 7).as("transfer_id"), col("ts"),
        col("wallet").as("from"),
        (col("wallet") + TransferPeer).as("to"),
        (col("token_id") + 600000L).as("token_id"),
        lit(1.0).as("value")))
      .withColumn("addr", lit(ConditionalTokensAddr))

    // off 9: FeeRefunded (⌊ui/100⌋) / FeeWithdrawn (⌊ui/200⌋)
    val refund = ((col("ui") - pmod(col("ui"), lit(100L))) / 100).cast("long")
    val withdraw = ((col("ui") - pmod(col("ui"), lit(200L))) / 200).cast("long")
    val refundLogs = fam(29).select(
      seq(9), col("ts"), lit(FeeModuleAddr).as("addr"),
      lit(FeeRefundedTopic).as("topic0"),
      toWord(col("trade_id")).as("topic1"),
      toWord(col("wallet")).as("topic2"),
      toWord(refund * 100L).as("topic3"),
      concat(toWord(col("token_id") + TokenIdBase),
        toWord(refund * 100L)).as("data"))
    val withdrawLogs = fam(31).select(
      seq(9), col("ts"), lit(FeeModuleAddr).as("addr"),
      lit(FeeWithdrawnTopic).as("topic0"),
      toWord(lit(0L)).as("topic1"),
      toWord(lit(0L)).as("topic2"),
      toWord(lit(0L)).as("topic3"),
      concat(toWord(lit(CollateralToken)), toWord(col("wallet")),
        toWord(col("token_id") + TokenIdBase),
        toWord(withdraw * 100L)).as("data"))

    // wrong-address decoys: the convert and fee-refund handlers must
    // drop these (topic0 matches, emitting contract doesn't)
    val decoys = convertLogs.withColumn("addr", lit(ConditionalTokensAddr))
      .unionByName(refundLogs.withColumn("addr", lit(NegRiskAdapterAddr)))

    spread(auxLogs
      .unionByName(splitLogs).unionByName(mergeLogs)
      .unionByName(redeemLogs).unionByName(resolutionLogs)
      .unionByName(convertLogs).unionByName(transferLogs)
      .unionByName(refundLogs).unionByName(withdrawLogs)
      .unionByName(decoys))
  }
}
