package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON log ingest with corrupt-record quarantine — the ingest seam
  * itself.
  *
  * Reference: src/main.ts consumes `eth_getLogs` JSON pages (address,
  * topics[], data, blockNumber, logIndex). The parquet fixtures
  * elsewhere in graft.sources stand in for the feed AFTER ingestion;
  * this source covers the step before: schema-on-read JSON (batch or
  * stream), PERMISSIVE parsing with the raw line preserved for
  * malformed records — a bad RPC page must neither kill the job nor
  * vanish silently. The quarantine frame carries the original line
  * for replay/audit (the reference's retry loop re-fetches; a batch
  * engine keeps the evidence instead).
  *
  * [[good]] flattens the on-chain `topics` array and strips the `0x`
  * prefixes down to the (address, topic0..topic3, data, block_number,
  * log_index, ts) layout every [[LogDecode]] decoder takes, so
  * JSON → quarantine-split → decode composes with the existing
  * decode → trades/ledger capstones.
  *
  * Scale shape: Spark's JSON datasource splits by file/line — the
  * parse, the corrupt test, the topic flatten and the prefix strip
  * are all scan-stage column work; nothing shuffles until the
  * decoder's consumer does.
  */
object JsonLogs {

  val CorruptCol = "_corrupt_record"

  /** eth_getLogs page row + the corrupt-record capture column. */
  val schema: StructType = StructType(Seq(
    StructField("address", StringType),
    StructField("topics", ArrayType(StringType)),
    StructField("data", StringType),
    StructField("block_number", LongType),
    StructField("log_index", LongType),
    StructField("ts", TimestampType),
    StructField(CorruptCol, StringType)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Streaming twin: same schema, same PERMISSIVE contract. */
  def stream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  private def strip0x(c: org.apache.spark.sql.Column) =
    regexp_replace(c, "^0x", "")

  /** Well-formed rows, flattened to the LogDecode layout (topics
    * exploded to topic0..topic3, `0x` prefixes stripped from topics
    * and data so the 64-char word arithmetic applies unchanged).
    * Rows that parsed but miss the contract (no topics) are dropped
    * here and auditable via [[shapeRejects]].
    *
    * topic1..topic3 use `try_element_at` (null on missing index):
    * Spark 4 runs ANSI-on by default, where a plain `element_at` past
    * the array end THROWS — a valid 3-topic log (e.g. ERC-20
    * Transfer) or a 1-topic anonymous event would otherwise kill the
    * whole ingest, violating this module's quarantine contract. */
  def good(raw: DataFrame): DataFrame =
    raw.filter(col(CorruptCol).isNull &&
        col("topics").isNotNull && size(col("topics")) >= 1)
      .select(col("address"),
        strip0x(element_at(col("topics"), 1)).as("topic0"),
        strip0x(try_element_at(col("topics"), lit(2))).as("topic1"),
        strip0x(try_element_at(col("topics"), lit(3))).as("topic2"),
        strip0x(try_element_at(col("topics"), lit(4))).as("topic3"),
        strip0x(col("data")).as("data"),
        col("block_number"), col("log_index"), col("ts"))

  /** Lines that failed to parse, with the raw line preserved.
    * (`address` rides along — null for corrupt rows — because Spark
    * disallows queries whose referenced columns are ONLY the internal
    * corrupt-record column; any sibling column lifts the restriction
    * without materializing the frame.) */
  def quarantine(raw: DataFrame): DataFrame =
    raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"), col("address"))

  /** Parsed-but-shapeless rows (valid JSON, no topics array): not
    * corrupt, not decodable — the audit bucket between the two. */
  def shapeRejects(raw: DataFrame): DataFrame =
    raw.filter(col(CorruptCol).isNull &&
      (col("topics").isNull || size(col("topics")) < 1))
}
