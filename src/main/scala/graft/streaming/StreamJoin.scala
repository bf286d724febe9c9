package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join.
  *
  * Reference shape: the indexer correlates order placements with their
  * fills as both arrive from the chain (main.ts decodes OrderFilled
  * against earlier order events). In ClickHouse that correlation is a
  * batch join after landing; Structured Streaming can do it on the
  * wire: both sides are watermarked, the join carries an event-time
  * interval condition, and Spark bounds each side's state buffer to
  * the watermark + interval — no unbounded state, late rows beyond the
  * watermark are dropped.
  */
object StreamJoin {

  /** Join a fills stream to its orders stream on key equality plus
    * `fill_ts ∈ [order_ts, order_ts + maxDelay]`. Column requirements:
    * orders(order_id, order_ts, ...), fills(fill_id, order_id,
    * fill_ts, ...). Both input streams must be append-mode sources;
    * the result is an append-mode stream whose rows are final as soon
    * as emitted (inner join). */
  def fillsWithOrders(orders: DataFrame, fills: DataFrame,
                      maxDelayMinutes: Int): DataFrame = {
    val wm = s"$maxDelayMinutes minutes"
    val o = orders.withWatermark("order_ts", wm)
      .withColumnRenamed("order_id", "o_order_id")
    val f = fills.withWatermark("fill_ts", wm)
    f.join(o, expr(
      s"""order_id = o_order_id AND
         |fill_ts >= order_ts AND
         |fill_ts <= order_ts + interval $maxDelayMinutes minutes"""
        .stripMargin))
      .drop("o_order_id")
  }
}
