package graft

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.{Dedup, HeavyHitters}

/** The sketch/LSH accuracy gates behind q_neardup_recall, q_hll_gate,
  * q_topk_gate, q_quantile_gate: raw-number assertions at sf0.001
  * (the driver's hash gate pins the booleans at sf0.01). */
class GatesSpec extends SparkSpec {

  test("planted twins: minhash-LSH recalls >= 0.75, simhash pinned >= 0.1") {
    val rows = Dedup.plantedRecall(Tables.documents(spark, sf), "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val (nMh, mh) = rows("minhash_lsh")
    val (nSh, sh) = rows("simhash_h3")
    assert(nMh > 10 && nMh == nSh, "truth set non-vacuous, shared")
    assert(mh >= 0.75, s"minhash recall $mh at 8x4 on j>=0.6 twins")
    // simhash@hamming<=3 saturates on ~54-word docs — the gate PINS the
    // low recall so a silent regression (or improvement) surfaces
    assert(sh >= 0.1, s"simhash recall $sh")
  }

  test("spacesaving bounds are partitioning-independent theorems") {
    val words = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), " +")).as("word"))
      .filter(length(col("word")) > 0)
    val exact = words.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    for (parts <- Seq(1, 7)) {
      val approx = HeavyHitters.topKApprox(
        spark, words.repartition(parts), "word", 50, 200)
      val bad = approx.join(exact, approx("item") === exact("word"))
        .filter(!(col("count_est") - col("err") <= col("cnt") &&
          col("count_est") <= col("cnt") + col("err")))
      assert(bad.isEmpty, s"bounds violated at $parts partitions")
    }
  }

  test("weighted spacesaving ranks by total weight, bounds hold across layouts") {
    import spark.implicits._
    // "heavy" occurs once with weight 1000; "light" 100 times with
    // weight 1 — count order and weight order are OPPOSITE, so a
    // weighted sketch must put heavy first
    val items = (Seq(("heavy", 1000L)) ++ Seq.fill(100)(("light", 1L)) ++
      (0 until 300).map(i => (s"noise$i", 2L))).toDF("item", "w")
    val exact = items.groupBy(col("item")).agg(sum(col("w")).as("wt"))
    for (parts <- Seq(1, 7)) {
      val approx = HeavyHitters.topKWeightedApprox(
        spark, items.repartition(parts), "item", "w", 10, 50)
      val top = approx.orderBy(col("weight_est").desc).head()
      assert(top.getString(0) == "heavy", s"top item at $parts partitions")
      val bad = approx.join(exact, approx("item") === exact("item"))
        .filter(!(col("weight_est") - col("err") <= col("wt") &&
          col("weight_est") <= col("wt") + col("err")))
      assert(bad.isEmpty, s"weight bounds violated at $parts partitions")
    }
  }

  test("gk sketch p50/p90 land in the exact rank envelopes per market") {
    val out = SparkEntry.queries("q_quantile_gate")(spark, sf).collect()
    assert(out.length == 2 && out.forall(_.getBoolean(2)),
      out.mkString("; "))
  }

  test("hll per-wallet and global errors stay inside the pinned bars") {
    val out = SparkEntry.queries("q_hll_gate")(spark, sf).collect()
    assert(out.length == 3 && out.forall(_.getBoolean(3)),
      out.mkString("; "))
  }

  test("quality distillation: student recovers the heuristic verdict") {
    import graft.operators.QualityModel
    val docs = Tables.documents(spark, sf)
    val data = QualityModel.labeled(docs, "doc_id", "text")
    val prev = data.agg(avg(col("label"))).collect().head.getDouble(0)
    assert(prev > 0.1 && prev < 0.9, s"teacher label prevalence $prev")
    val a = QualityModel.auc(
        QualityModel.trainScore(spark, docs, "doc_id", "text"))
      .collect().head
    assert(a.getLong(0) > 50, "held-out slice non-vacuous")
    assert(a.getDouble(1) >= 0.75, s"auc ${a.getDouble(1)}")
    assert(a.getDouble(1) < 0.999,
      "a perfect score would mean the label leaked into the features")
  }
}
