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

  /** Per-stage survival counts — the pipeline's audit row. */
  def stats(docs: DataFrame, idCol: String, textCol: String, langCol: String,
            keepLang: String, t: Thresholds): DataFrame = {
    val total = docs.agg(count(lit(1))).head().getLong(0)
    val lang = docs.filter(col(langCol) === keepLang)
    val langN = lang.agg(count(lit(1))).head().getLong(0)
    val quality = lang.filter(qualityPredicate(col(textCol), t))
    val qualityN = quality.agg(count(lit(1))).head().getLong(0)
    val cleanN = clean(docs, idCol, textCol, langCol, keepLang, t)
      .agg(count(lit(1))).head().getLong(0)
    import docs.sparkSession.implicits._
    Seq(("total", total), ("lang_pass", langN), ("quality_pass", qualityN),
      ("dedup_pass", cleanN)).toDF("stage", "docs")
  }
}
