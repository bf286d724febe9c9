package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "completely different content about spark engines and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (5L, "unrelated short text")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val d = Dedup.exact(docs, "doc_id", "text").filter($"copies" > 1).collect()
    assert(d.length == 1)
    assert(d(0).getAs[Long]("copies") == 2)
    assert(d(0).getAs[Long]("canonical_id") == 1L)
  }

  test("incremental dedup flags exactly the batch texts present in the corpus") {
    val corpus = Seq(
      (10L, "alpha beta gamma"),
      (11L, "delta epsilon zeta"),
      (12L, "eta theta iota")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (20L, "alpha beta gamma"),    // dup of 10
      (21L, "brand new document"),  // fresh
      (22L, "eta theta iota"),      // dup of 12
      (23L, "another fresh one")
    ).toDF("doc_id", "text")
    val got = Dedup.incremental(batch, corpus, "text", expectedCorpusKeys = 3L)
      .select($"doc_id", $"is_dup").as[(Long, Long)].collect().toMap
    assert(got == Map(20L -> 1L, 21L -> 0L, 22L -> 1L, 23L -> 0L))
    // bloom acceleration must not change schema or row count vs the batch
    assert(Dedup.incremental(batch, corpus, "text", 3L).count() == 4)
  }

  test("minhash LSH finds the planted near-dup pair") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        ngramN = 2, bands = 8, rowsPerBand = 2, jaccardThreshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"missing (1,2) in $pairs")
    assert(pairs.contains((1L, 4L)))  // exact dups always collide
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash expression matches a slow reference implementation") {
    val grams = Dedup.wordNgrams($"text", 2)
    val got = docs.select($"doc_id", Dedup.simhash64(grams).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // slow reference: same xxhash64 features via Spark, vote in Scala
    val feats = docs.select($"doc_id",
        transform(grams, s => xxhash64(s)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    feats.foreach { case (id, hs) =>
      val votes = Array.fill(64)(0)
      hs.foreach { h =>
        (0 until 64).foreach { b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1 } }
      val want = (0 until 64).foldLeft(0L) { (acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc }
      assert(got(id) == want, s"doc $id")
    }
  }

  test("simhash pairs: exact dup has hamming 0; near-dup is close") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", ngramN = 2, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 4L)) == 0)
    assert(pairs.get((1L, 2L)).exists(_ <= 16))
  }

  test("inverted-index jaccard equals brute-force jaccard") {
    val withBkt = docs.withColumn("bkt", lit("all"))
    val got = Dedup.ngramJaccardPairs(withBkt, "doc_id", "text", "bkt",
        ngramN = 2, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute force over all pairs
    val sets = docs.select($"doc_id", Dedup.wordNgrams($"text", 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    for (a <- sets.keys; b <- sets.keys if a < b) {
      val inter = (sets(a) & sets(b)).size
      val uni = (sets(a) | sets(b)).size
      val want = inter.toDouble / uni
      if (inter > 0)
        assert(math.abs(got((a, b)) - want) < 1e-12, s"pair ($a,$b)")
      else
        assert(!got.contains((a, b)), s"pair ($a,$b) should be absent")
    }
  }

  test("connected components collapse pair graph into clusters") {
    val pairs = Seq((1L, 2L), (2L, 4L), (7L, 9L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L, 4L, 7L, 9L).toDF("doc_id")
    val got = Dedup.clusters(spark, pairs, ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L) && got(2L) == got(4L))   // {1,2,4}
    assert(got(7L) == got(9L) && got(7L) != got(1L))   // {7,9}
    assert(got(3L) != got(1L) && got(3L) != got(7L))   // singleton
  }

  test("embedding near-dup via LSH buckets finds identical vectors") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.001f, 0.0f, 0.0f)),  // nearly identical to 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val nrm = Similarity.normalized(vecs, "vec_id", "embedding")
    val pairs = Similarity.lshTopK(nrm, nrm, dim = 4, planes = 4, k = 2)
      .filter($"cosine" >= 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 1L)))
  }

  test("semdedup: chains close transitively, far vectors stay out") {
    // cluster A: three vectors on a chain at angles 0° / 5° / 10° in
    // the (x,y) plane — threshold 0.99 sits between cos5° (0.9962)
    // and cos10° (0.9848), so only the adjacent pairs qualify and CC
    // must close the chain into ONE group keeping the min id.
    // cluster B: two orthogonal-direction vectors far from A and from
    // each other — no pair, so no output rows for them.
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat, 0f, 0f)
    }
    val vecs = Seq(
      (10L, at(0)), (11L, at(5)), (12L, at(10)),
      (20L, Array(0f, 0f, 1f, 0f)), (21L, Array(0f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.semDedup(spark, vecs, "vec_id", "embedding",
        corpusKey = "semdedup-spec", nlist = 2, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got.keySet == Set(10L, 11L, 12L), s"members: ${got.keySet}")
    assert(got(10L) == ((10L, true)))
    assert(got(11L) == ((10L, false)))
    assert(got(12L) == ((10L, false)))
  }
}
