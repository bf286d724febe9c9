package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Activity feed, per-token trade history, discovery ranking.
  *
  * Reference: `/activity` (typed feed + filters + pagination,
  * src/api.ts:907), `/trades?tokenId=` (api.ts, bloom-filter indexed
  * token scan — in Spark the token predicate is pushed to the parquet
  * scan), `/discover/markets` trending feed (api.ts:1942).
  */
object Activity {

  /** Paginated, type-filtered activity feed, newest first. Filters are
    * plain column predicates → pushed to the parquet scan. */
  def feed(events: DataFrame, types: Seq[String], limit: Int, offset: Int): DataFrame =
    events
      .filter(col("event_type").isin(types: _*))
      .orderBy(col("ts").desc, col("event_id").desc)
      .offset(offset).limit(limit)

  /** Keyset-paginated feed — the scale-correct cursor form the
    * reference's API uses: the `(ts, event_id) < cursor` predicate is
    * pushed to the scan, so page N costs the same as page 1 (an
    * `offset` skip instead sorts and discards N·limit rows). Cursor =
    * the last row of the previous page. */
  def feedAfter(events: DataFrame, types: Seq[String], cursorTs: String,
                cursorId: Long, limit: Int): DataFrame =
    events
      .filter(col("event_type").isin(types: _*))
      .filter(col("ts") < lit(cursorTs) ||
        (col("ts") === lit(cursorTs) && col("event_id") < cursorId))
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(limit)

  /** Trade history for one token, newest first (PushedFilters does the
    * work of ClickHouse's bloom_filter skip index). */
  def tokenTrades(trades: DataFrame, tokenId: Long, limit: Int): DataFrame =
    trades.filter(col("token_id") === tokenId)
      .orderBy(col("ts").desc, col("trade_id").desc)
      .select(col("trade_id"), col("ts"), col("maker"), col("taker"),
        col("qty"), col("usd").cast("double").as("usd"), col("price"))
      .limit(limit)

  /** Trending discovery: volume/trader momentum over the trailing
    * window ending at the stream's max ts, top-k tokens joined with
    * their market dim. */
  def discover(ticks: DataFrame, markets: DataFrame, windowHours: Int,
               k: Int): DataFrame = {
    // data-dependent cutoff computed in the same job: the 1-row max-ts
    // aggregate is broadcast (a scalar-subquery shape), not collected
    // to the driver as a separate blocking action
    val maxTs = ticks.agg(max(col("ts")).as("_max_ts"))
    ticks.join(broadcast(maxTs))
      .filter(col("ts") > col("_max_ts") - expr(s"INTERVAL $windowHours HOURS"))
      .groupBy(col("token_id"))
      .agg(sum(col("usd")).cast("double").as("volume_usd"),
        count(lit(1)).as("trades"),
        countDistinct(col("wallet")).as("traders"))
      .join(broadcast(markets), Seq("token_id"), "left")
      .orderBy(col("volume_usd").desc, col("token_id"))
      .limit(k)
  }
}
