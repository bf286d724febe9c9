package graft

import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ingest smoke: bounded parquet drives the streaming
  * plans synchronously into memory sinks (SURVEY §2 #28). */
class StreamingSpec extends SparkSpec {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),  // nanos (legacy read)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  // readStream needs a directory source: stage the single parquet file
  private lazy val stageDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def streamingEvents = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsSchema)
      .parquet(stageDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  test("windowed candle stream produces the batch candle totals") {
    val ticks = streamingEvents.select(col("event_id"), col("ts"),
      get_json_object(col("props"), "$.k").cast("long").as("token_id"),
      col("value").as("price"), col("value").cast("decimal(18,4)").as("usd"))
    StreamingIngest.runToMemory(spark,
      StreamingIngest.candleStream(ticks, "10 minutes"), "candles_out",
      outputMode = "complete")
    val got = spark.table("candles_out")
    val batch = graft.operators.Candles.finalize(
      graft.operators.Candles.fromTicks(
        graft.model.Tables.eventStream(spark, sf), "minute",
        col("token_id"), col("ts"), col("event_id"), col("price"), col("usd")))
    assert(got.count() == batch.count())
    val g = got.agg(sum("volume"), sum("trades")).head()
    val b = batch.agg(sum("volume"), sum("trades")).head()
    assert(math.abs(g.getDouble(0) - b.getDouble(0)) < 1e-6)
    assert(g.getLong(1) == b.getLong(1))
  }

  test("streaming dedup drops within-watermark re-deliveries") {
    val dup = streamingEvents.unionAll(streamingEvents)
    StreamingIngest.runToMemory(spark,
      StreamingIngest.dedupedStream(dup, "ts", "event_id", "10 minutes"),
      "dedup_out", outputMode = "append")
    val n = spark.table("dedup_out").count()
    val expected = graft.model.Tables.events(spark, sf).count()
    assert(n == expected)
  }
}
