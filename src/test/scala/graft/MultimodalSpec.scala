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

  // ---- REAL header decode (VERDICT r14 #6) ----------------------------

  private def pngBytes(w: Int, h: Int, depth: Int, colorType: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w).putInt(h)
    bb.put(depth.toByte).put(colorType.toByte)
    bb.put(0.toByte).put(0.toByte).put(0.toByte)  // comp/filter/interlace
    bb.putInt(0xdeadbeef)                         // fake CRC
    bb.array()
  }

  private def jpegBytes(w: Int, h: Int, nComp: Int,
                        withSof: Boolean = true): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    b(0xff, 0xd8)                                       // SOI
    b(0xff, 0xe0, 0x00, 0x10)                           // APP0 len 16
    out.write("JFIF".getBytes("US-ASCII")); b(0x00)
    b(0x01, 0x02, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00)
    if (withSof) {
      b(0xff, 0xc0, 0x00, 8 + 3 * nComp, 0x08)          // SOF0
      b(h >> 8, h & 0xff, w >> 8, w & 0xff, nComp)
      (1 to nComp).foreach(i => b(i, 0x11, 0x00))
    }
    b(0xff, 0xda, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3f, 0x00) // SOS
    b(0xff, 0xd9)                                       // EOI
    out.toByteArray
  }

  test("PNG IHDR + JPEG SOF0 parse real bytes; corrupt headers quarantine") {
    val rows = Seq(
      (1L, "png", pngBytes(640, 480, 8, 2)),      // rgb → 3 channels
      (2L, "png", pngBytes(31, 7, 16, 6)),        // rgba16 → 4 channels
      (3L, "jpeg", jpegBytes(1920, 1080, 3)),
      (4L, "jpeg", jpegBytes(5, 9, 1)),
      (5L, "png", pngBytes(10, 10, 8, 0).take(20)),          // truncated
      (6L, "jpeg", jpegBytes(64, 64, 3, withSof = false)),   // no SOF
      (7L, "???", "not an image at all".getBytes("UTF-8")),  // unknown
      (8L, "png", { val b = pngBytes(9, 9, 8, 0); b(25) = 9; b })
    ).toDF("media_id", "kind", "data")
    val got = Multimodal.decodeHeaders(spark, rows, batchSize = 3)
      .collect().map(r => r.media_id -> r).toMap
    def dims(id: Long) = {
      val r = got(id)
      (r.format, r.width.get, r.height.get, r.bit_depth.get, r.channels.get)
    }
    assert(dims(1L) == ("png", 640L, 480L, 8L, 3L))
    assert(dims(2L) == ("png", 31L, 7L, 16L, 4L))
    assert(dims(3L) == ("jpeg", 1920L, 1080L, 8L, 3L))
    assert(dims(4L) == ("jpeg", 5L, 9L, 8L, 1L))
    // corrupt rows quarantine into (ok=false, err) — never an exception
    for ((id, fmt, err) <- Seq(
        (5L, "png", "truncated"), (6L, "jpeg", "no SOF before scan"),
        (7L, "unknown", "unknown format"), (8L, "png", "bad color type 9"))) {
      val r = got(id)
      assert(!r.ok && r.format == fmt && r.err.contains(err) &&
        r.width.isEmpty && r.channels.isEmpty, s"row $id: $r")
    }
    assert(got.values.count(_.ok) == 4)
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
