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
  }
}
