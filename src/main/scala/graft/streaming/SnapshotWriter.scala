package graft.streaming

import graft.operators.Snapshots
import graft.sources.PartitionedStore
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental wallet-PnL snapshot writer.
  *
  * Reference: snapshot-scheduler.ts — on a cadence, re-derive each
  * target wallet's wallet_pnl_snapshots rows and replace them
  * (delete + insert per wallet). Streaming-first equivalent: a
  * foreachBatch job over the fill stream where each micro-batch
  *
  *  1. appends the batch's (wallet, token, day) flow partials to the
  *     flows table — the additive wallet-day MV the reference
  *     maintains at ingest; append-only, re-aggregated on read, so
  *     no upsert storage is needed, and
  *  2. recomputes snapshot rows ONLY for the batch's dirty wallets
  *     from the accumulated flows, keeps every other wallet's rows
  *     (left_anti — the [[graft.operators.Ledger.backfill]] shape),
  *     and swaps the result in crash-safely
  *     ([[PartitionedStore.swapDir]]).
  *
  * At 100 TB the dirty-wallet semi-join is the whole point: a
  * micro-batch touches a few thousand wallets, so the snapshot
  * recompute reads and rewrites a sliver of the table instead of
  * refolding the world — while staying row-identical to the batch
  * [[Snapshots.pnlSnapshots]] over the full history
  * (SnapshotWriterSpec proves equality after every batch).
  */
object SnapshotWriter {

  /** One micro-batch step; exposed for tests and backfills.
    *
    * @param batch     the batch's wallet-trades slice
    * @param flowsDir  append-only flow-partials table
    * @param snapsDir  the snapshot table being maintained
    * @param lastPrice (token_id, last_price) dim for the unrealized
    *                  mark — the serving dim at the time of the batch
    */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   flowsDir: String, snapsDir: String,
                   lastPrice: DataFrame): Unit = {
    Snapshots.dailyFlowPartials(batch)
      .write.mode(SaveMode.Append).parquet(flowsDir)
    val dirty = batch.select(col("wallet")).distinct()
    val flows = Snapshots.mergeDailyFlows(
      spark.read.parquet(flowsDir)
        .join(broadcast(dirty), Seq("wallet"), "left_semi"))
    val fresh = Snapshots.pnlSnapshotsFromDaily(flows, lastPrice)
    val existing = new java.io.File(snapsDir).exists()
    val out =
      if (existing)
        spark.read.parquet(snapsDir)
          .join(broadcast(dirty), Seq("wallet"), "left_anti")
          .unionByName(fresh)
      else fresh
    val tmp = s"$snapsDir.tmp"
    out.write.mode(SaveMode.Overwrite).parquet(tmp)
    PartitionedStore.swapDir(snapsDir, tmp, s"$snapsDir.old")
  }

  /** Wire the incremental writer onto a wallet-trades stream. */
  def run(spark: SparkSession, stream: DataFrame, flowsDir: String,
          snapsDir: String, lastPrice: DataFrame, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        processBatch(spark, batch.toDF(), flowsDir, snapsDir, lastPrice)
      }
      .start()
}
