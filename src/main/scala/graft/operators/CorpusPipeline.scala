package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composed training-corpus cleaning pipeline: language filter →
  * quality filter → exact dedup (keep canonical) — the standard
  * pretraining data prep flow, each stage a pushed-down column
  * predicate or one hash groupBy. Stages report what they dropped (no
  * silent shrinkage).
  */
object CorpusPipeline {

  final case class Thresholds(minChars: Int = 50, maxNonAlpha: Double = 0.3,
                              minStopword: Double = 0.02)

  def qualityPredicate(text: Column, t: Thresholds): Column = {
    val q = TextAnalysis.quality(text)
    (q.getField("n_chars") >= t.minChars) &&
      (q.getField("nonalpha_ratio") <= t.maxNonAlpha) &&
      (q.getField("stopword_ratio") >= t.minStopword)
  }

  /** Clean corpus: rows that pass lang + quality and are the canonical
    * (lowest-id) copy of their exact-duplicate group. */
  def clean(docs: DataFrame, idCol: String, textCol: String, langCol: String,
            keepLang: String, t: Thresholds): DataFrame = {
    val filtered = docs
      .filter(col(langCol) === keepLang)
      .filter(qualityPredicate(col(textCol), t))
    val canonical = filtered.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    filtered.join(canonical, Seq(idCol), "left_semi")
  }

  /** Per-stage survival counts — the pipeline's audit row. Stages are
    * nested filters, so every count is a conditional aggregate of one
    * flagged pass over the corpus (plus the dedup groupBy) — a single
    * job, no driver-blocking per-stage `.head()` actions. */
  def stats(docs: DataFrame, idCol: String, textCol: String, langCol: String,
            keepLang: String, t: Thresholds): DataFrame = {
    val langOk = col(langCol) === keepLang
    val flagged = docs.select(col(idCol), col(textCol), langOk.as("lang_ok"),
      (langOk && qualityPredicate(col(textCol), t)).as("q_ok"))
    val base = flagged.agg(count(lit(1)).as("total"),
      sum(when(col("lang_ok"), 1L).otherwise(0L)).as("lang_pass"),
      sum(when(col("q_ok"), 1L).otherwise(0L)).as("quality_pass"))
    val ded = flagged.filter(col("q_ok"))
      .groupBy(md5(col(textCol))).agg(min(col(idCol)))
      .agg(count(lit(1)).as("dedup_pass"))
    base.join(ded).selectExpr(
      """stack(4, 'total', total, 'lang_pass', lang_pass,
        |'quality_pass', quality_pass, 'dedup_pass', dedup_pass)
        |AS (stage, docs)""".stripMargin)
  }
}
