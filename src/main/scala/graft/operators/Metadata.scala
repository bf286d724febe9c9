package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Metadata shaping: array explode, SCD2 history, watermarks, dedup
  * ingest.
  *
  * Reference: token_metadata ARRAY JOIN MV (001:463-477), the SCD2
  * `market_categories_history` view via leadInFrame (001:493-522),
  * `indexer_status` watermark (001:337), and ReplacingMergeTree
  * keep-latest ingest semantics (001:42, src/main.ts).
  */
object Metadata {

  /** Market → ordered token list → exploded (token, outcome_index) rows.
    * Mirrors `arrayZip(token_ids, outcomes, arrayEnumerate(...))` +
    * ARRAY JOIN: build the array per market, then posexplode. */
  def tokenMetadata(markets: DataFrame, marketCol: String, tokenCol: String,
                    nameCol: String): DataFrame =
    markets
      .groupBy(col(marketCol).as("market"))
      .agg(sort_array(collect_list(struct(col(tokenCol).as("token_id"),
        col(nameCol).as("outcome")))).as("toks"))
      .select(col("market"), posexplode(col("toks")).as(Seq("outcome_index", "t")))
      .select(col("market"), col("t.token_id").as("token_id"),
        col("t.outcome").as("outcome"), col("outcome_index"))

  /** SCD2: derive valid_to as the next version's valid_from (open
    * intervals end 2100-01-01), exactly the reference's leadInFrame
    * window — no UPDATE-heavy writes, valid_to is derived at read. */
  def scd2(history: DataFrame, keyCol: String, validFromCol: String,
           tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(validFromCol), col(tieBreak))
    history.withColumn("valid_to",
      lead(col(validFromCol), 1,
        java.sql.Timestamp.valueOf("2100-01-01 00:00:00")).over(w))
  }

  /** Current-version projection of the SCD2 history (reference:
    * market_categories_current view, 001:525-535): the rows whose
    * validity interval is still open, i.e. the last version per key —
    * detected as `lead(valid_from) IS NULL` so no sentinel literal is
    * compared. */
  def scd2Current(history: DataFrame, keyCol: String, validFromCol: String,
                  tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(validFromCol), col(tieBreak))
    history.withColumn("__next", lead(col(validFromCol), 1).over(w))
      .filter(col("__next").isNull).drop("__next")
  }

  /** Sync watermark per processor (reference: indexer_status). */
  def watermark(stream: DataFrame, processorCol: String, seqCol: String,
                tsCol: String): DataFrame =
    stream.groupBy(col(processorCol).as("processor_id"))
      .agg(max(col(seqCol)).as("last_seq"), max(col(tsCol)).as("last_ts"),
        count(lit(1)).as("rows_ingested"))

  /** Reorg-safe hot-range rewrite (reference: HOT_BLOCKS_DEPTH /
    * FINALITY_CONFIRMATION in main.ts — the last N blocks may be
    * replaced wholesale when the chain reorganizes). Stored rows at or
    * past the rewrite point are dropped; the corrected rows take their
    * place. Pure column ops: a filter plus a union, no state. */
  def replaceHotRange(stored: DataFrame, incoming: DataFrame, seqCol: String,
                      fromSeq: Long): DataFrame =
    stored.filter(col(seqCol) < fromSeq)
      .unionAll(incoming.filter(col(seqCol) >= fromSeq))

  /** [[replaceHotRange]] with a data-dependent rewrite point: `cutoff`
    * is a 1-row (single-column) aggregate computed in the same job and
    * broadcast to both branches — a scalar-subquery shape, so no
    * driver-blocking `.count()`/`.head()` pre-action runs before the
    * rewrite. */
  def replaceHotRangeAt(stored: DataFrame, incoming: DataFrame, seqCol: String,
                        cutoff: DataFrame): DataFrame = {
    val cut = cutoff.toDF("__from_seq")
    stored.join(broadcast(cut)).filter(col(seqCol) < col("__from_seq"))
      .unionAll(incoming.join(broadcast(cut))
        .filter(col(seqCol) >= col("__from_seq")))
      .drop("__from_seq")
  }

  /** Change-detection changelog: keep only rows whose value differs
    * from the key's previous row (reference:
    * sync-indexer-metadata.ts — a new taxonomy version row is written
    * only when the categories actually changed). First row per key is
    * always a change. */
  def changelog(history: DataFrame, keyCol: String, orderCol: String,
                tieBreak: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieBreak))
    history
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(valueCol))
      .drop("__prev")
  }

  /** Idempotent ingest: drop re-delivered rows, keeping the latest
    * version per id (ReplacingMergeTree(height) semantics). One
    * window, partitioned by id — at scale this is a single hash
    * shuffle on the primary key, the same cost ClickHouse pays at
    * merge time. */
  def dedupIngest(rows: DataFrame, idCol: String, versionCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(versionCol).desc)
    rows.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
