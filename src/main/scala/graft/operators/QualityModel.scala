package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based corpus quality filtering — the FineWeb-Edu/DCLM shape:
  * score every document with a trained classifier, keep the top band.
  * The heuristic filters ([[CorpusPipeline.clean]]) are the recall
  * stage; a learned scorer is the precision stage at 100 TB, and its
  * Spark form matters: featurization and scoring are pure column/
  * `ml.Transformer` work that runs in the scan stage, while training
  * fits ONCE on a bounded sample — the same build-once/apply-
  * everywhere seam as [[IvfIndex]]'s k-means.
  *
  * The demo task is distillation — the production use of model-based
  * filters: the LABEL is the verdict of the FULL heuristic bundle
  * (the [[CorpusPipeline.qualityPredicate]] thresholds AND the
  * Gopher repetition thresholds), while the feature vector sees only
  * the cheap surface ratios — the repetition side of the label needs
  * a per-doc n-gram aggregation the scorer never gets. The student
  * model recovers most of the teacher's decisions (AUC well above
  * the 0.75 bar) but not all (the unseen repetition component), so
  * the pinned bar is a meaningful regression gate, not a tautology.
  * (A lang label would be unlearnable here: the synthetic corpus
  * assigns lang independently of the text — verified.)
  */
object QualityModel {

  private val FeatureCols = Seq("n_words", "chars_per_word",
    "words_per_char", "nonalpha_ratio", "stopword_ratio", "space_ratio")

  /** Per-doc feature row + teacher label: heuristic-quality AND
    * repetition thresholds (distinct-token ratio ≥ 0.40, duplicate
    * bigram fraction ≤ 0.05 — the corpus's median band). */
  def labeled(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val feats = docs
      .select(col(idCol),
        CorpusPipeline.qualityPredicate(col(textCol),
          CorpusPipeline.Thresholds()).as("q_pass"),
        TextAnalysis.quality(col(textCol)).as("q"))
      .select(col(idCol), col("q_pass"),
        col("q.n_words").cast("double").as("n_words"),
        (col("q.n_chars").cast("double") /
          greatest(col("q.n_words").cast("double"), lit(1.0)))
          .as("chars_per_word"),
        col("q.words_per_char").as("words_per_char"),
        col("q.nonalpha_ratio").as("nonalpha_ratio"),
        col("q.stopword_ratio").as("stopword_ratio"),
        col("q.space_ratio").as("space_ratio"))
    val rep = TextAnalysis.repetition(docs, idCol, textCol)
      .select(col("doc_id").as(idCol),
        (col("distinct_token_ratio") >= 0.40 &&
          col("dup_bigram_frac") <= 0.05).as("rep_pass"))
    feats.join(rep, Seq(idCol))
      .withColumn("label",
        (col("q_pass") && col("rep_pass")).cast("double"))
      .drop("q_pass", "rep_pass")
  }

  /** Train on doc_id % 5 ≠ 0, score the held-out fifth. Returns the
    * scored test slice: (id, label, score). Deterministic: fixed
    * split, fixed seed, L-BFGS on standardized features. */
  def trainScore(spark: SparkSession, docs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val data = labeled(docs, idCol, textCol)
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol("features")
    val train = assembler.transform(data.filter(col(idCol) % 5 =!= 0))
    val test = assembler.transform(data.filter(col(idCol) % 5 === 0))
    val model = new LogisticRegression()
      .setMaxIter(100).setRegParam(0.01).setStandardization(true)
      .fit(train)
    model.transform(test)
      .select(col(idCol), col("label"),
        vector_to_array(col("probability")).getItem(1).as("score"))
  }

  /** DataFrame-native ROC-AUC (Mann–Whitney U over score ranks): the
    * window is global but runs on the bounded held-out slice only —
    * an eval metric, not a data-path operator. Average ranks are not
    * needed because scores tie with probability ~0 (continuous). */
  def auc(scored: DataFrame): DataFrame = {
    val w = Window.orderBy(col("score"), col("label"))
    scored.withColumn("r", row_number().over(w).cast("double"))
      .agg(
        count(lit(1)).as("n_test"),
        sum(col("label")).cast("double").as("np"),
        sum(col("r") * col("label")).as("rp"))
      .select(col("n_test"),
        ((col("rp") - col("np") * (col("np") + 1) / 2) /
          (col("np") * (col("n_test").cast("double") - col("np"))))
          .as("auc"))
  }
}
