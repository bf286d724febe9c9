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
  *  1. writes the batch's (wallet, token, day) flow partials under
  *     `flows/batch=<id>` — the additive wallet-day MV the reference
  *     maintains at ingest. Overwriting the batch's own directory
  *     makes foreachBatch's at-least-once replay idempotent: a
  *     crash-retry rewrites the same partition instead of appending
  *     a duplicate copy, and
  *  2. recomputes snapshot rows ONLY for the batch's dirty wallets
  *     from the accumulated flows, keeps every other wallet's rows
  *     (left_anti — the [[graft.operators.Ledger.backfill]] shape),
  *     and swaps in ONLY the wallet-hash buckets that contain a
  *     dirty wallet ([[PartitionedStore.swapDir]] per `wb=` dir).
  *
  * The table is hash-bucketed by wallet (`wb = xxhash64(wallet) %
  * buckets`): at 100 TB a micro-batch touches a few thousand
  * wallets, so the job reads (partition-pruned) and rewrites only
  * the dirty buckets — O(dirty slice), not O(table) — while staying
  * row-identical to the batch [[Snapshots.pnlSnapshots]] over the
  * full history (SnapshotWriterSpec proves equality after every
  * batch). Flow partials carry the same bucket column, so the
  * re-fold's read is pruned too.
  */
object SnapshotWriter {

  /** One micro-batch step; exposed for tests and backfills.
    *
    * @param batch     the batch's wallet-trades slice
    * @param flowsDir  flow-partials table, one subdir per batch id
    * @param snapsDir  the snapshot table being maintained
    * @param lastPrice (token_id, last_price) dim for the unrealized
    *                  mark — the serving dim at the time of the batch
    * @param batchId   foreachBatch's batch id (replay dedup key)
    * @param buckets   wallet-hash bucket count for partial rewrites
    */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   flowsDir: String, snapsDir: String,
                   lastPrice: DataFrame, batchId: Long,
                   buckets: Int = 64): Unit = {
    // recover a half-finished swap from a previous crash before
    // reading either table (the aside dir holds the only live copy)
    (0 until buckets).foreach { k =>
      PartitionedStore.restoreAside(s"$snapsDir/wb=$k", s"$snapsDir/.old-$k")
    }
    val wb = pmod(xxhash64(col("wallet")), lit(buckets.toLong)).cast("int")
    Snapshots.dailyFlowPartials(batch).withColumn("wb", wb)
      .write.partitionBy("wb").mode(SaveMode.Overwrite)
      .parquet(s"$flowsDir/batch=$batchId")
    val dirty = batch.select(col("wallet")).distinct()
    // dirty bucket ids: a bounded (≤ buckets) driver-side list used
    // only to prune partitions and name the per-bucket swaps
    val dirtyBuckets = dirty.select(wb.as("wb")).distinct()
      .collect().map(_.getInt(0)).sorted
    val inDirty = col("wb").isin(dirtyBuckets.map(Integer.valueOf): _*)
    val flows = Snapshots.mergeDailyFlows(
      spark.read.parquet(flowsDir).filter(inDirty)
        .join(broadcast(dirty), Seq("wallet"), "left_semi"))
    val fresh = Snapshots.pnlSnapshotsFromDaily(flows, lastPrice)
      .withColumn("wb", wb)
    val existing = new java.io.File(snapsDir).exists() &&
      dirtyBuckets.exists(k => new java.io.File(s"$snapsDir/wb=$k").exists())
    val out =
      if (existing)
        spark.read.parquet(snapsDir).filter(inDirty)
          .join(broadcast(dirty), Seq("wallet"), "left_anti")
          .unionByName(fresh)
      else fresh
    val tmp = s"$snapsDir.tmp"
    out.write.partitionBy("wb").mode(SaveMode.Overwrite).parquet(tmp)
    dirtyBuckets.foreach { k =>
      val tmpK = new java.io.File(s"$tmp/wb=$k")
      if (!tmpK.exists()) tmpK.mkdirs() // bucket emptied: swap in a bare dir
      new java.io.File(snapsDir).mkdirs()
      PartitionedStore.swapDir(s"$snapsDir/wb=$k", s"$tmp/wb=$k",
        s"$snapsDir/.old-$k")
    }
  }

  /** Wire the incremental writer onto a wallet-trades stream. */
  def run(spark: SparkSession, stream: DataFrame, flowsDir: String,
          snapsDir: String, lastPrice: DataFrame, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        processBatch(spark, batch.toDF(), flowsDir, snapsDir, lastPrice, id)
      }
      .start()
}
