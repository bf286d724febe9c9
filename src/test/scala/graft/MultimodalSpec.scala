package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions.col

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

  test("end-to-end media retrieval: binary -> features -> ANN top-k") {
    import graft.operators.Similarity
    // a bigger synthetic corpus so top-k has something to rank
    val corpus = (1L to 40L).map(i =>
      (i, "image", s"fake-png-payload-$i".getBytes("UTF-8"))).toDF(
      "media_id", "kind", "data")
    val feats = Multimodal.extractFeatures(spark, corpus, dim = 16).toDF()
      .select(col("media_id"), col("features"))
    val nrm = Similarity.normalized(feats, "media_id", "features")
    val hits = Similarity.sqTopK(nrm, nrm.filter(col("id") <= 2), k = 5)
      .collect()
    assert(hits.length == 10)                      // 2 queries × top-5
    val byQ = hits.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sims = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.sliding(2).forall(p => p.head >= p.last))
    }
    // exact self-match excluded, ranks are 1..5
    assert(hits.forall(r => r.getLong(0) != r.getLong(2)))
  }

  test("frame sampling: every Nth fixed-size frame, exact bytes, lazy fan-out") {
    // "video" = 10 frames of 4 bytes each: frame i is [i, i, i, i]
    val vid = Array.tabulate(40)(b => (b / 4).toByte)
    val media = Seq((7L, "video", vid)).toDF("media_id", "kind", "data")
    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 4, stride = 3)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 3, 6, 9))
    frames.foreach { f =>
      assert(f.media_id == 7L)
      assert(f.frame.toSeq == Seq.fill(4)(f.frame_idx.toByte))
    }
    // trailing partial frame is dropped: 42 bytes → still frames 0..9
    val vid2 = vid ++ Array[Byte](9, 9)
    val media2 = Seq((8L, "video", vid2)).toDF("media_id", "kind", "data")
    val n = Multimodal.sampleFrames(spark, media2, 4, 3).count()
    assert(n == 4)
  }
}
