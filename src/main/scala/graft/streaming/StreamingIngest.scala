package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming ingest path.
  *
  * Reference: the indexer's hot-block processing (src/main.ts —
  * re-delivered blocks are idempotent via ReplacingMergeTree; candles
  * update incrementally via the candles_1m MV). Here the same two
  * semantics as a streaming pipeline: watermark + drop-duplicates for
  * idempotent delivery, and a windowed OHLCV aggregate as the
  * incremental materialized view.
  */
object StreamingIngest {

  /** Idempotent delivery: duplicates of `idCol` within the watermark
    * window are dropped; state is evicted past the watermark so it
    * never grows unboundedly (the streaming ReplacingMergeTree). */
  def dedupedStream(events: DataFrame, tsCol: String, idCol: String,
                    watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq(idCol))

  /** Incremental 1-minute OHLCV candles over a tick stream — the
    * streaming twin of Candles.fromTicks (append mode once the
    * watermark passes the window end). */
  def candleStream(ticks: DataFrame, watermark: String): DataFrame =
    ticks.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute").as("w"), col("token_id"))
      .agg(
        min_by(col("price"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), struct(col("ts"), col("event_id"))).as("close"),
        sum(col("usd")).as("volume_dec"),
        count(lit(1)).as("trades"))
      .select(col("w.start").as("bucket"), col("token_id"), col("open"),
        col("high"), col("low"), col("close"),
        col("volume_dec").cast("double").as("volume"), col("trades"))

  /** Drive a streaming query from a bounded source synchronously into
    * an in-memory table (local smoke harness). */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
                  outputMode: String): Unit = {
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
  }
}
