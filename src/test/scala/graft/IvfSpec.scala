package graft

import graft.model.Tables
import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  test("IVF top-k recall vs brute force") {
    val nrm = Similarity.normalized(Tables.embeddings(spark, sf), "vec_id", "embedding")
    nrm.cache()
    val q = nrm.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(nrm, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet

    val model = IvfIndex.build(spark, nrm, nlist = 8)
    val approx = IvfIndex.topK(spark, model, q, k = 5, nprobe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.5, s"recall=$recall")

    // probing every cell must reproduce brute force exactly
    val full = IvfIndex.topK(spark, model, q, k = 5, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(full == exact)

    // the unbroadcast batch-query plan is row-identical to serving
    val batch = IvfIndex.topKBatch(spark, model, q, k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val serving = IvfIndex.topK(spark, model, q, k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(batch == serving)
  }

  test("two-level residual IVF: full probe reproduces brute force " +
    "exactly; partial probe holds recall; cells address as c1*l2+c2") {
    val nrm = Similarity.normalized(Tables.embeddings(spark, sf),
      "vec_id", "embedding")
    nrm.cache()
    val q = nrm.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(nrm, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hier = IvfIndex.buildHierarchical(spark, nrm, nlistTotal = 16)
    assert(hier.coarse.length == 4 && hier.residual.length == 4 &&
      hier.l2 == 4, "16 effective cells as 4 coarse x 4 residual")
    // every corpus row lands in a valid pair cell
    val cells = hier.assigned.select(col("cell")).distinct()
      .collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < 16), s"cells ${cells.toSeq}")
    // probing EVERY pair cell must reproduce brute force exactly —
    // the hierarchy changes addressing, never membership
    val full = IvfIndex.topKHier(spark, hier, q, k = 5,
      nprobe1 = 4, nprobe2 = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(full == exact, "full probe == brute force")
    // the documented operating point keeps useful recall
    val approx = IvfIndex.topKHier(spark, hier, q, k = 5,
      nprobe1 = 3, nprobe2 = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.5, s"recall=$recall")
  }

  // the r17 x10 crosscheck find: PQ codes live in their IVF model's
  // cell space, so the session cache must key on the model identity —
  // two callers sharing a corpusKey around different-nlist models used
  // to poison each other (invisible at reference scale, where every
  // derived nlist clamps to the same 16)
  test("PQ cache: same corpusKey, different IVF models -> distinct codes") {
    val nrm = Similarity.normalized(Tables.embeddings(spark, sf), "vec_id",
      "embedding")
    val m16 = IvfIndex.buildCached(spark, nrm, corpusKey = "pqkey-spec",
      nlist = 16)
    val m32 = IvfIndex.buildCached(spark, nrm, corpusKey = "pqkey-spec",
      nlist = 32)
    val pq16 = graft.operators.PqIndex.buildCached(spark, m16,
      corpusKey = "pqkey-spec:pq", dim = 64, m = 8)
    val pq32 = graft.operators.PqIndex.buildCached(spark, m32,
      corpusKey = "pqkey-spec:pq", dim = 64, m = 8)
    assert(!(pq16 eq pq32),
      "different IVF models behind one corpusKey must not share a PqModel")
    // and each codes frame lives in ITS model's cell space
    assert(pq16.coded.agg(max(col("cell"))).head().getInt(0) < 16)
    assert(pq32.coded.agg(max(col("cell"))).head().getInt(0) >= 16,
      "32-cell assignment should use cells beyond 16")
  }

  test("NearestCells expression ranks cells by squared L2 distance") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.0, 0.9)), (2L, Seq(1.0, 0.1))).toDF("id", "unit")
    // centroids: cell0 = (0,1), cell1 = (1,0), cell2 = (0.6, 0.6)
    val flat = typedLit(Seq(0.0, 1.0, 1.0, 0.0, 0.6, 0.6))
    val out = df.select(col("id"),
        graft.functions.NearestCells.nearest_cells(col("unit"), flat, 2)
          .as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out(1L) == Seq(0, 2)) // (0,0.9): d0=0.01, d2=0.45, d1=1.64
    assert(out(2L) == Seq(1, 2)) // (1,0.1): d1=0.01, d2=0.41, d0=1.81
  }
}
