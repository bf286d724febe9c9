package graft

import graft.operators.Multimodal

/** Binary media column plumbing (SURVEY §2 #40): schema, batched
  * decode shape, typed output, dedup over checksums. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "image", "fake-png-bytes-aaaa".getBytes("UTF-8")),
    (2L, "image", "fake-png-bytes-bbbb".getBytes("UTF-8")),
    (3L, "audio", "fake-wav-bytes-cccc".getBytes("UTF-8")),
    (4L, "image", "fake-png-bytes-aaaa".getBytes("UTF-8"))  // dup of 1
  ).toDF("media_id", "kind", "data")

  test("feature extraction is deterministic, batched, and typed") {
    val f1 = Multimodal.extractFeatures(spark, media, dim = 16, batchSize = 2)
      .collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, media, dim = 16, batchSize = 3)
      .collect().sortBy(_.media_id)
    assert(f1.length == 4)
    assert(f1.forall(_.features.length == 16))
    // batch size must not change results
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.checksum == b.checksum && a.features.sameElements(b.features))
    }
    // identical bytes → identical features
    assert(f1(0).checksum == f1(3).checksum)
    assert(f1(0).checksum != f1(1).checksum)
  }

  test("exact media dedup finds the planted duplicate") {
    val feats = Multimodal.extractFeatures(spark, media, dim = 8).toDF()
    val dupes = Multimodal.exactDupes(feats).collect()
    assert(dupes.length == 1)
    assert(dupes(0).getAs[Long]("copies") == 2)
    assert(dupes(0).getAs[Long]("canonical_id") == 1L)
  }
}
