package graft

import graft.model.Tables
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("dot/norm column math is correct") {
    import spark.implicits._
    val df = Seq((Array(3.0, 4.0), Array(1.0, 0.0))).toDF("a", "b")
    val r = df.select(Similarity.dot($"a", $"b").as("d"),
      Similarity.norm($"a").as("n")).head()
    assert(r.getDouble(0) == 3.0 && r.getDouble(1) == 5.0)
  }

  test("brute-force top-k is self-consistent and ordered") {
    val nrm = Similarity.normalized(Tables.embeddings(spark, sf), "vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(nrm, nrm.filter(col("id") < 3), 5).collect()
    val byQ = topk.groupBy(_.getLong(0))
    assert(byQ.size == 3)
    byQ.values.foreach { rows =>
      val sims = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.sliding(2).forall(p => p.head >= p.last), "descending cosine")
      assert(rows.length == 5)
    }
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    val nrm = Similarity.normalized(Tables.embeddings(spark, sf), "vec_id", "embedding")
    nrm.cache()
    val q = nrm.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(nrm, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.lshTopK(nrm, q, dim = 64, planes = 4, k = 5,
        tables = 8).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 8 tables × 16 buckets: approximate by design, but multi-probe
    // should recover most true neighbors
    assert(recall > 0.5, s"recall=$recall")
  }

  test("PQ at full probe with an exhaustive shortlist equals brute force " +
    "exactly (the rerank is the proof the ADC path feeds real candidates)") {
    import graft.operators.{IvfIndex, PqIndex}
    val nrm = Similarity.normalized(Tables.embeddings(spark, sf), "vec_id",
      "embedding")
    val n = nrm.count().toInt
    val q = nrm.filter(col("id") < 3)
    val ivf = IvfIndex.buildCached(spark, nrm, corpusKey = sf + "#pqspec",
      nlist = 16)
    val pq = PqIndex.buildCached(spark, ivf, corpusKey = sf + "#pqspec",
      dim = 64, m = 8)
    // nprobe = all cells, shortlist > corpus: the PQ path degenerates
    // to exact brute force — codes only order the shortlist, and the
    // rerank reads true vectors
    val want = Similarity.bruteForceTopK(nrm, q, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = PqIndex.topK(spark, ivf, pq, q, k = 5, nprobe = 16,
        refine = n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want, "full-probe exhaustive-shortlist PQ must equal " +
      "brute force row-for-row")
    // codes are byte-range: m values in [0, ksub) with ksub <= 256
    val mx = pq.coded.select(max(array_max(col("codes")))).head().getInt(0)
    assert(pq.ksub <= 256 && mx < pq.ksub)
    // same property for the BY-RESIDUAL variant (the cell_dot term
    // changes the ADC order, never the exhaustive-shortlist rerank)
    val pqr = PqIndex.buildCached(spark, ivf, corpusKey = sf + "#pqspec",
      dim = 64, m = 8, byResidual = true)
    val gotR = PqIndex.topK(spark, ivf, pqr, q, k = 5, nprobe = 16,
        refine = n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(gotR == want, "full-probe exhaustive-shortlist residual PQ " +
      "must equal brute force row-for-row")
  }

  test("int8 quantization round-trips within scale/127 per component") {
    import spark.implicits._
    val df = Seq((1L, Array(0.6, -0.8, 0.0, 0.05))).toDF("id", "unit")
    val r = Similarity.quantized(df).head()
    assert(math.abs(r.getDouble(2) - 0.8) < 1e-12)        // scale = abs max
    val q = r.getSeq[Byte](3)
    assert(q == Seq[Byte](95, -127, 0, 8))                // round(127·x/0.8)
  }

  test("SQ8 top-k with exact rerank matches brute force almost everywhere") {
    val nrm = Similarity.normalized(Tables.embeddings(spark, sf), "vec_id", "embedding")
    nrm.cache()
    val q = nrm.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(nrm, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val sq = Similarity.sqTopK(nrm, q, 5, refine = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & sq).size.toDouble / exact.size
    // int8 error is ~1/127 per component; with 4x rerank headroom the
    // exact rerank should recover nearly all true neighbors
    assert(recall > 0.9, s"recall=$recall")
  }

  test("group centroids: per-(label, dim) mean, floored micro-units") {
    import spark.implicits._
    val df = Seq(
      (1, Seq(1.0f, 2.0f)), (1, Seq(3.0f, 6.0f)),   // label 1 mean (2, 4)
      (2, Seq(-1.0f, 0.5f))                          // label 2 mean (-1, 0.5)
    ).toDF("label", "embedding")
    val r = Similarity.groupCentroids(df, "label", "embedding")
      .collect().map(x => (x.getInt(0), x.getInt(1)) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r((1, 0)) == (2L, 2000000L) && r((1, 1)) == (2L, 4000000L))
    assert(r((2, 0)) == (1L, -1000000L) && r((2, 1)) == (1L, 500000L))
  }

  test("pca: a one-line corpus compresses losslessly to k=1") {
    import spark.implicits._
    import graft.operators.EmbeddingCompress
    // every vector on span{e1} → PC1 = ±e1, variance explained 1,
    // reconstruction exact; |proj| must equal |v| sign-agnostically
    val corpus = Seq(1.0, 2.0, 3.0, -1.0, -2.5)
      .zipWithIndex
      .map { case (c, i) => (i.toLong, Array(c, 0.0, 0.0, 0.0)) }
      .toDF("id", "unit")
    val m = EmbeddingCompress.fit(spark, corpus, k = 1)
    assert(math.abs(m.explained.sum - 1.0) < 1e-9, s"explained=${m.explained.toSeq}")
    val proj = EmbeddingCompress.project(corpus, m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    Seq(1.0, 2.0, 3.0, -1.0, -2.5).zipWithIndex.foreach { case (c, i) =>
      assert(proj(i.toLong).length == 1)
      assert(math.abs(math.abs(proj(i.toLong).head) - math.abs(c)) < 1e-9)
    }
    val gate = EmbeddingCompress.gate(corpus, m, varBar = 0.9, errBar = 0.01)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3)))
      .toMap
    assert(gate("pca_var_explained") == ((5L, true)))
    assert(gate("pca_recon_rel_err") == ((5L, true)))
  }
}
