package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, batched decode → feature-extract.
  *
  * The decode step is a clearly-marked DETERMINISTIC FAKE — the
  * container has no image/audio codecs — but everything Spark-side is
  * real: the schema, the per-partition batch shape (decoders amortize
  * setup over a batch, exactly like a pandas-UDF batch), partitioning,
  * and the typed Dataset output.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, data: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 checksum: Long, features: Array[Float])

  /** FAKE decode: stands in for image decode / audio PCM / video
    * frame-sampling. Deterministic in the bytes, so tests are stable.
    * A real deployment swaps only this function (and ships the codec
    * in the executor image). */
  private[operators] def fakeDecodeBatch(batch: Seq[MediaRow], dim: Int): Seq[MediaFeatures] =
    batch.map { r =>
      var h = 1125899906842597L
      var i = 0
      while (i < r.data.length) { h = h * 31 + (r.data(i) & 0xff); i += 1 }
      val feats = new Array[Float](dim)
      var j = 0
      var s = h
      while (j < dim) {
        s = s * 6364136223846793005L + 1442695040888963407L
        feats(j) = (s >>> 40).toFloat / (1 << 24).toFloat
        j += 1
      }
      MediaFeatures(r.media_id, r.kind, r.data.length, h, feats)
    }

  /** Batched feature extraction over a binary media column. Batches of
    * `batchSize` rows per decoder call inside each partition — the
    * Scala analogue of `mapInPandas` batch semantics. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"), col("data"))
      .as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(b => fakeDecodeBatch(b, dim)))
  }

  /** Near-dup clustering over media: exact via checksum groupBy (the
    * binary twin of Dedup.exact). */
  def exactDupes(features: DataFrame): DataFrame =
    features.groupBy(col("checksum"))
      .agg(count(lit(1)).as("copies"), min(col("media_id")).as("canonical_id"))
      .filter(col("copies") > 1)

  final case class FrameRow(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Video frame sampling: treat `data` as consecutive fixed-size
    * frames (the fake container format — a real one parses the codec's
    * index instead) and emit every `stride`-th frame as its own row.
    * Iterator-based fan-out: one media row becomes many frame rows
    * lazily, so a long video never materializes all frames in one
    * executor buffer; downstream per-frame ops (decode, resize,
    * embed) then run on a row-per-frame Dataset that repartitions
    * freely. */
  def sampleFrames(spark: SparkSession, media: DataFrame, frameBytes: Int,
                   stride: Int): Dataset[FrameRow] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"), col("data"))
      .as[MediaRow]
      .flatMap { r =>
        Iterator.range(0, r.data.length / frameBytes)
          .filter(_ % stride == 0)
          .map(i => FrameRow(r.media_id, i,
            java.util.Arrays.copyOfRange(r.data, i * frameBytes,
              (i + 1) * frameBytes)))
      }
  }
}
