package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Stream-MAINTAINED rollups served through the transparent rewrite
  * (VERDICT r15 #7).
  *
  * Through r15 RollupRewrite served session MVs — batch plans cached
  * per (session, dir). At 100 TB the rollups are maintained by the
  * ingest stream instead (the reference's SummingMergeTree tables are
  * written BY ingest, and ClickHouse's PROJECTION parts are built as
  * data arrives); this wires that topology end-to-end on the
  * versioned store:
  *
  *   fact stream ─ stateful groupBy(dims).agg(partials), UPDATE mode
  *     └─ foreachBatch: idempotent vectored upsert by dims
  *          (VersionedStore.mergeBatchVectored — retries can neither
  *          double-apply a batch nor tear a commit)
  *        then RollupRewrite.registerReplacing(source, fresh snapshot)
  *
  * Update mode emits ONE CUMULATIVE row per key per batch it changed
  * — the streaming state holds the running partials, so the upsert
  * REPLACES by key and the table always equals
  * `ingested-so-far.groupBy(dims).agg(partials)`. Re-registering the
  * fresh snapshot after every commit gives batch queries that name
  * the RAW source exactly ClickHouse's freshness contract: they serve
  * from the latest COMMITTED state of the ingest-maintained table.
  *
  * Scale notes: the streaming state is one row per live (dims) group
  * — the rollup's own cardinality, the same bound the batch MV
  * carries; the per-batch sink writes only CHANGED keys (delta-sized
  * commits, O(touched) manifest metadata); the re-registration is
  * driver-side plan surgery, no data movement.
  */
object StreamingRollup {

  /** Start maintenance of the rollup at `path` from `stream` (same
    * column names/types as `source`). `source` is the BATCH plan
    * queries name — each committed micro-batch re-registers the fresh
    * table snapshot against it. Caller owns checkpointing (pass
    * `checkpoint` for restartability) and the exclusively-maintained
    * table contract of [[graft.sources.VersionedStore.mergeBatchVectored]]. */
  def maintain(stream: DataFrame, source: DataFrame, path: String,
               dims: Seq[(Column, String)],
               sums: Seq[(Column, String)],
               countCol: Option[String],
               mins: Seq[(Column, String)] = Nil,
               maxs: Seq[(Column, String)] = Nil,
               checkpoint: Option[String] = None,
               queryName: String = "rollup_maintenance"): StreamingQuery = {
    val spark = stream.sparkSession
    val aggCols =
      sums.map { case (c, n) => sum(c).as(n) } ++
        countCol.map(n => count(lit(1)).as(n)) ++
        mins.map { case (c, n) => min(c).as(n) } ++
        maxs.map { case (c, n) => max(c).as(n) }
    require(aggCols.nonEmpty, "a rollup needs at least one partial")
    val agg = stream
      .groupBy(dims.map { case (c, n) => c.as(n) }: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val keys = dims.map(_._2)
    val writer = agg.writeStream
      .outputMode("update")
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // empty batches still commit: the sink's version counter is
        // the batchId, and skipping one would wedge the NEXT batch's
        // version precondition
        graft.sources.VersionedStore.mergeBatchVectored(batch, path, keys, id)
        graft.plans.RollupRewrite.registerReplacing(spark, source,
          graft.sources.VersionedStore.read(spark, path),
          dims, sums, countCol, mins, maxs)
        ()
      }
    checkpoint.foreach(cp => writer.option("checkpointLocation", cp))
    writer.start()
  }
}
