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

  /** Data-mix report ("data card"): documents and whitespace tokens
    * per (source, language), plus each cell's share of corpus tokens
    * in floored parts-per-million. One groupBy with map-side partial
    * counts; the 2-value global total is a broadcast scalar — the
    * report every training-mix recipe starts from. */
  def dataMix(docs: DataFrame, sourceCol: String, langCol: String,
              textCol: String): DataFrame = {
    val cells = docs
      .groupBy(col(sourceCol).as("source"), col(langCol).as("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(size(split(trim(col(textCol)), " +")).cast("long")).as("tokens"))
    val tot = cells.agg(sum(col("tokens")).as("total_tokens"))
    cells.join(broadcast(tot))
      .select(col("source"), col("lang"), col("docs"), col("tokens"),
        floor(col("tokens").cast("double") * 1e6 /
          col("total_tokens").cast("double")).cast("long").as("token_ppm"))
  }

  /** PII / sensitive-content signals per document: counts of emails,
    * URLs and long digit runs, and the document length after redacting
    * them — the scrubbing audit columns of a pretraining pipeline.
    * Pure regexp column expressions; the patterns stick to constructs
    * whose semantics agree across regex engines (no backreferences,
    * no lookaround), so the same counts are reproducible off-Spark. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val UrlRe = "https?://[^ ]+"
  val DigitRunRe = "[0-9]{7,}"

  def piiSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val redacted = regexp_replace(
      regexp_replace(regexp_replace(t, EmailRe, "<EMAIL>"),
        UrlRe, "<URL>"), DigitRunRe, "<NUM>")
    docs.select(col(idCol),
      regexp_count(t, lit(EmailRe)).as("emails"),
      regexp_count(t, lit(UrlRe)).as("urls"),
      regexp_count(t, lit(DigitRunRe)).as("digit_runs"),
      length(t).as("n_chars"),
      length(redacted).as("n_chars_redacted"))
  }

  /** Sequence packing for training-batch assembly: documents are
    * concatenated in deterministic `orderCol` order within each
    * packing group and cut into fixed-`capacity` token sequences —
    * each doc lands at (pack_id, pack_offset) = (cum-tokens-before
    * div/mod capacity), the standard no-padding streaming packer
    * (docs may span a pack boundary). A prefix sum IS the packer, so
    * the whole operator is one window — no sequential state.
    *
    * Scale shape: packing needs a total order per group by
    * definition, so the group key must bound the window's partition —
    * callers shard wide groups (the q_seq_pack query packs per
    * (lang, doc_id % 8)); each (group) partition then sorts
    * independently, and the shuffle carries (id, token-count) pairs,
    * not text. */
  def packSequences(docs: DataFrame, groupCols: Seq[Column],
                    orderCol: Column, tokens: Column,
                    capacity: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("tokens", tokens.cast("long"))
      .withColumn("_cb", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("_cb") / capacity).cast("long"))
      .withColumn("pack_offset", (col("_cb") % capacity).cast("long"))
      .drop("_cb")
  }
}
