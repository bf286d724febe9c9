package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-user and per-market analytics.
  *
  * Reference: `/user/stats` (trades, volume, buy/sell split, best/worst
  * trade) and `/market/stats` (traders, volume, holders) endpoints in
  * src/api.ts.
  */
object Stats {

  /** Per-wallet stats over the two-sided trade view. Best/worst trade =
    * max/min signed cashflow of a single fill. */
  def userStats(walletTrades: DataFrame): DataFrame = {
    val signed = col("signed_usd")
    val sums = walletTrades
      .withColumn("signed_usd",
        when(col("side") === "sell", col("usd")).otherwise(-col("usd"))
          .cast("double"))
      .groupBy(col("wallet"))
      .agg(
        count(lit(1)).as("trades"),
        sum(col("usd")).cast("double").as("volume_usd"),
        sum(when(col("side") === "buy", 1L).otherwise(0L)).as("buy_count"),
        sum(when(col("side") === "sell", 1L).otherwise(0L)).as("sell_count"),
        max(signed).as("best_trade_usd"),
        min(signed).as("worst_trade_usd"),
        min(col("ts")).as("first_trade_ts"),
        max(col("ts")).as("last_trade_ts"))
    // distinct-pair markets count: no Expand doubling of the 8-state
    // aggregate input (see PLANS.md r3)
    val markets = walletTrades.select(col("wallet"), col("token_id")).distinct()
      .groupBy(col("wallet")).agg(count(lit(1)).as("markets"))
    sums.join(markets, Seq("wallet"))
      .select(col("wallet"), col("trades"), col("volume_usd"),
        col("buy_count"), col("sell_count"), col("markets"),
        col("best_trade_usd"), col("worst_trade_usd"),
        col("first_trade_ts"), col("last_trade_ts"))
  }

  /** Per-market stats: distinct traders, fills, volume, holder count.
    * `markets` is a broadcast dim token_id → market; `balances` feeds
    * the holder count (positive balances only). */
  def marketStats(walletTrades: DataFrame, balances: DataFrame,
                  markets: DataFrame): DataFrame = {
    // Each fill appears twice in walletTrades (maker + taker row):
    // count distinct traders over both roles, but count fills/volume
    // from the taker rows only so nothing is double-counted.
    val tokenSums = walletTrades
      .groupBy(col("token_id"))
      .agg(sum(when(col("role") === "taker", 1L).otherwise(0L)).as("fills"),
        sum(when(col("role") === "taker", col("usd"))
          .otherwise(lit(0).cast("decimal(18,4)"))).as("volume_dec"))
    val traders = walletTrades.select(col("token_id"), col("wallet")).distinct()
      .groupBy(col("token_id")).agg(count(lit(1)).as("traders"))
    val perToken = tokenSums.join(traders, Seq("token_id"))
    val holders = balances.filter(col("balance") > 0)
      .groupBy(col("token_id")).agg(count(lit(1)).as("holders"))
    perToken
      .join(holders, Seq("token_id"), "left")
      .join(broadcast(markets), Seq("token_id"))
      .groupBy(col("market"))
      .agg(sum(col("traders")).as("trader_slots"),
        sum(col("fills")).as("fills"),
        // decimal all the way to the final cast: exact, order-independent
        sum(col("volume_dec")).cast("double").as("volume_usd"),
        sum(coalesce(col("holders"), lit(0L))).as("holders"),
        count(lit(1)).as("tokens"))
  }

  /** [[userStats]] with the distinct-market count served from the
    * (wallet, token) flows rollup: the rollup's grain IS the distinct
    * pair set, so `markets` is a per-wallet row count over the MV —
    * the raw explode is scanned once (for the row-level best/worst/
    * first/last aggregates the rollup cannot carry) instead of twice. */
  def userStatsFromFlows(walletTrades: DataFrame, flows: DataFrame): DataFrame = {
    val signed = col("signed_usd")
    val sums = walletTrades
      .withColumn("signed_usd",
        when(col("side") === "sell", col("usd")).otherwise(-col("usd"))
          .cast("double"))
      .groupBy(col("wallet"))
      .agg(
        count(lit(1)).as("trades"),
        sum(col("usd")).cast("double").as("volume_usd"),
        sum(when(col("side") === "buy", 1L).otherwise(0L)).as("buy_count"),
        sum(when(col("side") === "sell", 1L).otherwise(0L)).as("sell_count"),
        max(signed).as("best_trade_usd"),
        min(signed).as("worst_trade_usd"),
        min(col("ts")).as("first_trade_ts"),
        max(col("ts")).as("last_trade_ts"))
    val markets = flows.groupBy(col("wallet"))
      .agg(count(lit(1)).as("markets"))
    sums.join(markets, Seq("wallet"))
      .select(col("wallet"), col("trades"), col("volume_usd"),
        col("buy_count"), col("sell_count"), col("markets"),
        col("best_trade_usd"), col("worst_trade_usd"),
        col("first_trade_ts"), col("last_trade_ts"))
  }

  /** [[marketStats]] re-aggregated from the (wallet, token) flows
    * rollup — identical output (FlowsRollupSpec pins row-identity):
    * each fill appears exactly TWICE in the explode (maker + taker row,
    * same usd), so per token `fills = Σtrades div 2` is exact, the
    * taker volume in 1e-4 longs is `(Σbi + Σsi) div 2` (each fill's
    * scaled usd is counted once per role), and the distinct trader
    * count is the rollup's per-token row count. The final
    * `long/10000.0` double equals `CAST(decimal AS DOUBLE)` of the
    * same exact rational (both correctly rounded once). */
  def marketStatsFromFlows(flows: DataFrame, balances: DataFrame,
                           markets: DataFrame): DataFrame = {
    val perToken = flows.groupBy(col("token_id"))
      .agg(expr("sum(trades) div 2").as("fills"),
        expr("(sum(bi) + sum(si)) div 2").as("vol_i"),
        count(lit(1)).as("traders"))
    val holders = balances.filter(col("balance") > 0)
      .groupBy(col("token_id")).agg(count(lit(1)).as("holders"))
    perToken
      .join(holders, Seq("token_id"), "left")
      .join(broadcast(markets), Seq("token_id"))
      .groupBy(col("market"))
      .agg(sum(col("traders")).as("trader_slots"),
        sum(col("fills")).as("fills"),
        (sum(col("vol_i")) / 10000.0).as("volume_usd"),
        sum(coalesce(col("holders"), lit(0L))).as("holders"),
        count(lit(1)).as("tokens"))
  }

  /** Market concentration: Herfindahl–Hirschman index and top-10
    * wallet volume share per market. Shares are exact decimal ratios
    * cast to double; share² summands are scaled ×10¹² and floored to
    * BIGINT before summing, so the cross-wallet sum is exact and
    * order-independent (the SURVEY §3 money discipline applied to a
    * nonlinear metric). */
  def marketConcentration(walletTrades: DataFrame, markets: DataFrame,
                          topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vol = walletTrades
      .join(broadcast(markets), Seq("token_id"))
      .groupBy(col("market"), col("wallet"))
      .agg(sum(col("usd")).as("v"))
    val tot = vol.groupBy(col("market")).agg(sum(col("v")).as("tot"))
    val w = Window.partitionBy(col("market"))
      .orderBy(col("v").desc, col("wallet"))
    // tot is one row per market — broadcast instead of re-shuffling
    // the (market, wallet) volumes by market for a shuffle join; the
    // tot subtree still reuses vol's exchange (ReusedExchange)
    vol.join(broadcast(tot), Seq("market"))
      .withColumn("share", col("v").cast("double") / col("tot").cast("double"))
      .withColumn("rank", row_number().over(w))
      .groupBy(col("market"))
      .agg(count(lit(1)).as("wallets"),
        (sum(floor(col("share") * col("share") * 1e12).cast("long")) / 1e12)
          .as("hhi"),
        (sum(when(col("rank") <= topK, col("v"))
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
          max(col("tot")).cast("double")).as("top10_share"))
  }

  /** [[marketConcentration]] re-aggregated from the (wallet, token)
    * flows rollup: the (market, wallet) volume folds from the exact
    * 1e-4-scaled long partials (bi + si = both-role usd). The share
    * doubles are bit-identical to the decimal path's — `l/10000.0` and
    * `CAST(decimal(l·1e-4) AS DOUBLE)` are both the one correctly-
    * rounded double of the same exact rational — so every floored
    * share² summand, rank and ratio is unchanged. */
  def marketConcentrationFromFlows(flows: DataFrame, markets: DataFrame,
                                   topK: Int = 10): DataFrame = {
    // NOT a row_number window: partitionBy(market) has only a handful
    // of partitions, so the rank sort serializes the whole corpus into
    // ~|markets| tasks (guide §2.5 — a window cannot be skew-split).
    // The top-K volumes come from the cap-bounded buffer aggregate
    // (the #94 RecentTopK shape, keyed (vl, -wallet) so "largest
    // volume, smallest wallet on ties" is the buffer's retention
    // order — exactly row_number's (v DESC, wallet) pick): partial
    // aggregation runs map-side, and both final aggregates ride ONE
    // hash(market) exchange of pre-aggregated rows.
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.functions.RecentTopK
    val vol = flows
      .join(broadcast(markets), Seq("token_id"))
      .groupBy(col("market"), col("wallet"))
      .agg(sum(col("bi") + col("si")).as("vl"))
    val tot = vol.groupBy(col("market")).agg(sum(col("vl")).as("totl"))
    val topAgg = ColumnBridge.column(RecentTopK(
      ColumnBridge.expression(col("vl")),
      ColumnBridge.expression(-col("wallet")),
      ColumnBridge.expression(col("vl")),
      topK).toAggregateExpression())
    vol.join(broadcast(tot), Seq("market"))
      .withColumn("share", (col("vl") / 10000.0) / (col("totl") / 10000.0))
      .groupBy(col("market"))
      .agg(count(lit(1)).as("wallets"),
        (sum(floor(col("share") * col("share") * 1e12).cast("long")) / 1e12)
          .as("hhi"),
        topAgg.as("topv"),
        max(col("totl")).as("totl"))
      .select(col("market"), col("wallets"), col("hhi"),
        ((aggregate(col("topv"), lit(0L), (acc, x) => acc + x) / 10000.0) /
          (col("totl") / 10000.0)).as("top10_share"))
  }

  /** Trade-size distribution per market (ClickHouse `quantile()`
    * surface): exact interpolated median/p90 over the per-market
    * quantity sets — via [[Rank.groupedQuantiles]] rank arithmetic,
    * NOT Spark's `percentile()` aggregate, whose buffer holds every
    * value of a group (with ~6 markets, one merge task would hold
    * ~1/6 of all trades — the r8 verdict's flagged scale-killer).
    * Bit-identical to `percentile()` (RankSpec) at bounded memory:
    * one range shuffle per value column, broadcast offsets/targets.
    * PlanAuditSpec pins that no exact-percentile buffer reappears. */
  def tradeSizeQuantiles(walletTrades: DataFrame, markets: DataFrame): DataFrame = {
    val t = walletTrades.join(broadcast(markets), Seq("token_id"))
    tradeSizeQuantilesBucketed(Rank.bucketized(t, "market", col("qty")),
      Rank.bucketized(t, "market", col("usd")))
  }

  /** [[tradeSizeQuantiles]] over pre-built [[Rank.bucketized]] bases.
    * SparkEntry materializes the two narrow (market, value, bucket)
    * projections as session MVs shared with q_quantile_gate: the four
    * groupedQuantiles calls per bench pass then scan one cached
    * columnar copy each instead of re-joining wt⋈markets up to 8×,
    * and their pinned histograms canonicalize to one entry per value
    * column (VERDICT r9 #1). */
  def tradeSizeQuantilesBucketed(qtyBase: DataFrame,
                                 usdBase: DataFrame): DataFrame = {
    val qty = Rank.groupedQuantilesBucketed(qtyBase, "market",
      Seq("median_qty" -> 0.5, "p90_qty" -> 0.9), countName = "trades")
    val usd = Rank.groupedQuantilesBucketed(usdBase, "market",
      Seq("median_usd" -> 0.5), countName = "__c")
    qty.join(usd.drop("__c"), Seq("market"))
      .select(col("market"), col("trades"), col("median_qty"),
        col("p90_qty"), col("median_usd"))
  }

  /** Sketch twin of [[tradeSizeQuantiles]] (ClickHouse quantileTDigest):
    * `approx_percentile` carries a bounded Greenwald-Khanna summary per
    * group — aggregate-buffer size depends on the accuracy parameter,
    * not the group's row count, so a whale market costs the same as a
    * quiet one. Rank error ≤ 1/accuracy. */
  def tradeSizeQuantilesSketch(walletTrades: DataFrame, markets: DataFrame,
                               accuracy: Int = 1000): DataFrame =
    walletTrades
      .join(broadcast(markets), Seq("token_id"))
      .groupBy(col("market"))
      .agg(count(lit(1)).as("trades"),
        expr(s"approx_percentile(CAST(qty AS DOUBLE), 0.5, $accuracy)")
          .as("median_qty_approx"),
        expr(s"approx_percentile(CAST(usd AS DOUBLE), 0.9, $accuracy)")
          .as("p90_usd_approx"))

  /** [[tradeSizeQuantilesSketch]] over the pre-bucketized bases — same
    * sketch aggregate over the same (non-null) value sets, scanning the
    * session-cached projections instead of re-joining wt⋈markets. Used
    * by q_quantile_gate, whose envelopes already ride those bases;
    * q_quantiles_sketch keeps measuring the direct path. */
  def tradeSizeQuantilesSketchBucketed(qtyBase: DataFrame, usdBase: DataFrame,
                                       accuracy: Int = 1000): DataFrame = {
    val q = qtyBase.groupBy(col("__g"))
      .agg(count(lit(1)).as("__cq"),
        expr(s"approx_percentile(__v, 0.5, $accuracy)")
        .as("median_qty_approx"))
    val u = usdBase.groupBy(col("__g"))
      .agg(count(lit(1)).as("__cu"),
        expr(s"approx_percentile(__v, 0.9, $accuracy)")
        .as("p90_usd_approx"))
    // FULL OUTER on __g: a group whose qty values are all null (absent
    // from the null-filtered qty base) but whose usd values exist must
    // still appear — with a null approx quantile, exactly like the
    // direct tradeSizeQuantilesSketch — so a gate joining against the
    // envelope side keeps an identical market population. `trades` is
    // the larger non-null value count (= the group row count whenever
    // values are non-null, as in the trade data), keeping the direct
    // variant's count column in the surface.
    q.join(u, Seq("__g"), "full_outer")
      .select(col("__g").as("market"),
        greatest(coalesce(col("__cq"), lit(0L)), coalesce(col("__cu"), lit(0L)))
          .as("trades"),
        col("median_qty_approx"), col("p90_usd_approx"))
  }

  /** Exact weighted quantile per group (the ClickHouse
    * quantileExactWeighted surface): the smallest value whose
    * cumulative weight reaches qNum/qDen of the group total. One
    * value-ordered partitioned window for the running weight plus one
    * full-partition total (both O(n) frames — no per-row suffix
    * frame), then min over the qualifying rows. Deterministic under
    * ties: the pick depends only on W(≤ v), never on intra-tie order;
    * with decimal weights and an integer q ratio the threshold
    * comparison is exact on any engine. */
  def weightedQuantile(df: DataFrame, groupCol: String, value: Column,
                       weight: Column, qNum: Int, qDen: Int): DataFrame = {
    require(qNum > 0 && qDen > 0 && qNum <= qDen, "need 0 < qNum/qDen <= 1")
    import org.apache.spark.sql.expressions.Window
    val run = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy(col(groupCol))
    df.select(col(groupCol), value.as("__v"), weight.as("__w"))
      .withColumn("__cum", sum(col("__w")).over(run))
      .withColumn("__tot", sum(col("__w")).over(tot))
      .filter(col("__cum") * qDen >= col("__tot") * qNum)
      .groupBy(col(groupCol))
      .agg(min(col("__v")).as("wq"))
  }

  /** Equi-width histogram of a value per group (the ClickHouse
    * `histogram()` report surface, with fixed bin count): bins span
    * [min, max] per group, bin = min(floor((x − mn)/w), bins − 1) with
    * w = (mx − mn)/bins, and a constant-valued group lands entirely in
    * bin 0 (its width is 0, lo = hi = mn). Bounds are a tiny per-group
    * aggregate broadcast back onto the scan — two partial-agg passes,
    * no window sort, no skew sensitivity; bin edges are pure IEEE
    * arithmetic reproducible on any engine. */
  def histogram(df: DataFrame, groupCol: String, value: Column,
                bins: Int, weight: Column = lit(1L)): DataFrame = {
    val x = value.cast("double")
    val bounds = df.groupBy(col(groupCol))
      .agg(min(x).as("mn"), max(x).as("mx"))
    df.select(col(groupCol), x.as("x"), weight.cast("long").as("__w"))
      .join(broadcast(bounds), Seq(groupCol))
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(floor((col("x") - col("mn")) /
            ((col("mx") - col("mn")) / bins)), lit((bins - 1).toLong))))
      .groupBy(col(groupCol), col("bin"), col("mn"), col("mx"))
      .agg(sum(col("__w")).as("n"))
      .select(col(groupCol), col("bin"), col("n"),
        (col("mn") + col("bin") * ((col("mx") - col("mn")) / bins))
          .as("bin_lo"),
        (col("mn") + (col("bin") + 1) * ((col("mx") - col("mn")) / bins))
          .as("bin_hi"))
  }

  /** Spearman rank correlation per group (ClickHouse `rankCorr(x, y)`):
    * Pearson correlation of the AVERAGE ranks of x and y — the
    * tie-correct textbook form (ties share the mean of the rank run
    * they occupy, so the statistic is permutation-stable; plain
    * row_number ranks would make it depend on shuffle order).
    *
    * Average rank as ONE window pass per variable: `rank()` gives the
    * tie run's min rank and a RANGE-framed count (unbounded preceding →
    * current row, which includes all PEERS of the current value) gives
    * the run's MAX rank, so avg = (min + max)/2. Both functions share
    * the identical (partitionBy group, orderBy value) spec, so Catalyst
    * plans them in a single Window operator over a single sort — two
    * sorts total, both riding ONE hash(group) exchange (a window
    * partitioned by a SUPERSET of the exchange keys would instead
    * re-sort on normalized float keys, which is why the tie-run count
    * is NOT expressed as `count over (partition by grp, value)`). The
    * corr() re-agg reuses the same exchange — one keyed shuffle end to
    * end, map-side partials at the group grain, the 100 TB shape.
    * Output: (group, n, rank_corr). */
  def rankCorr(df: DataFrame, groupCol: String, x: Column, y: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = col(groupCol)
    val base = df.select(g.as("grp"), x.as("x"), y.as("y"))
    def withAvgRank(in: DataFrame, c: String): DataFrame = {
      val wOrd = Window.partitionBy(col("grp")).orderBy(col(c))
      val wCume = wOrd.rangeBetween(Window.unboundedPreceding,
        Window.currentRow)
      in.withColumn(s"${c}_r",
        (rank().over(wOrd) + count(lit(1)).over(wCume)) / 2.0)
    }
    withAvgRank(withAvgRank(base, "x"), "y")
      .groupBy(col("grp").as(groupCol))
      .agg(count(lit(1)).as("n"),
        corr(col("x_r"), col("y_r")).as("rank_corr"))
  }
}
