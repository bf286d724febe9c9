package graft

import graft.model.Tables
import graft.operators.{CorpusPipeline, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("mixSample: raising a stratum's rate only adds rows (monotone nesting)") {
    val base = docs.select(col("doc_id"), col("source"))
    def rates(webRate: Double) = base.select(col("source")).distinct()
      .withColumn("rate",
        when(col("source") === "src1", webRate).otherwise(0.3))
    val low = Sampling.mixSample(base, "source", col("doc_id"), rates(0.2))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val high = Sampling.mixSample(base, "source", col("doc_id"), rates(0.8))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high))
    assert(high.size > low.size)
    // rate ≥ 1 keeps the whole stratum
    val all = Sampling.mixSample(base, "source", col("doc_id"), rates(1.0))
    val src1 = base.filter(col("source") === "src1").count()
    assert(all.filter(col("source") === "src1").count() == src1)
  }

  test("packSequences invariants: offsets in range, packs fill in order, tokens conserved") {
    val (ws, _) = TextAnalysis.tokenCounts(col("text"))
    val cap = 512
    val packed = CorpusPipeline.packSequences(
      docs.select(col("doc_id"), col("lang"), col("text")),
      Seq(col("lang")), col("doc_id"), ws, cap)
    assert(packed.filter(col("pack_offset") < 0 ||
      col("pack_offset") >= cap).count() == 0)
    // pack_id never decreases in doc order within a group
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    assert(packed
      .withColumn("prev", lag(col("pack_id"), 1, 0L).over(w))
      .filter(col("pack_id") < col("prev")).count() == 0)
    // conservation: per group, last doc's cum-before + tokens = Σ tokens
    val sums = packed.groupBy(col("lang"))
      .agg(sum(col("tokens")).as("total"),
        max(struct(col("doc_id"), (col("pack_id") * cap + col("pack_offset")
          + col("tokens")).as("endpos"))).as("last"))
    assert(sums.filter(col("total") =!= col("last.endpos")).count() == 0)
  }
}
