package graft.operators

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA embedding compression — the storage/bandwidth half of the
  * similarity stack ([[Similarity.sqTopK]]'s int8 scan is the compute
  * half): project d-dim embeddings onto the top-k principal
  * components before they are written, cutting the 100 TB embedding
  * footprint d/k× at a measured reconstruction-error budget.
  *
  * Spark shape: the component matrix is tiny (d × k doubles) and fits
  * the same build-once/apply-everywhere seam as [[IvfIndex]] — fitting
  * is ONE covariance pass (`ml.feature.PCA` → d×d covariance via
  * treeAggregate, eigendecomposition on the driver), and projection is
  * k native dot-product expressions against broadcast literal
  * component columns, codegen in the scan stage — no ML transformer in
  * the hot path, no UDF.
  *
  * Error accounting uses the orthonormal-projection identity
  * |v − PPᵀv|² = |v|² − |Pᵀv|², so the gate never materializes
  * reconstructed vectors.
  */
object EmbeddingCompress {

  /** pc(j) = component j as a dense array (length d); explained =
    * per-component variance proportions. */
  final case class Model(pc: Array[Array[Double]], explained: Array[Double])

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), Model]()

  /** Fit the top-k components on (id, unit) rows. Deterministic:
    * covariance + LAPACK eigendecomposition, no sampling. */
  def fit(spark: SparkSession, corpus: DataFrame, k: Int): Model = {
    val vecs = corpus.withColumn("fv", array_to_vector(col("unit")))
    val m = new PCA().setK(k).setInputCol("fv").setOutputCol("pfv").fit(vecs)
    val d = m.pc.numRows
    Model(Array.tabulate(k)(j => Array.tabulate(d)(i => m.pc(i, j))),
      m.explainedVariance.toArray)
  }

  /** Session-cached [[fit]] keyed by corpus key — the index-build-once
    * policy shared with [[IvfIndex.buildCached]]. */
  def fitCached(spark: SparkSession, corpus: DataFrame, corpusKey: String,
                k: Int): Model =
    cache.computeIfAbsent(
      (spark.sparkContext.applicationId, corpusKey, k),
      _ => fit(spark, corpus, k))

  /** Forget this app's cached models (driver arrays only) —
    * called from [[graft.model.Views.reset]]. */
  def reset(spark: SparkSession): Unit = {
    val app = spark.sparkContext.applicationId
    val it = cache.entrySet().iterator()
    while (it.hasNext) if (it.next().getKey._1 == app) it.remove()
  }

  /** (id, proj): k codegen dot products against broadcast literal
    * component columns. */
  def project(corpus: DataFrame, model: Model): DataFrame =
    corpus.select(col("id"),
      array(model.pc.map(c =>
        Similarity.dot(col("unit"), typedLit(c.toSeq))): _*).as("proj"))

  /** Accuracy gate rows (check_name, n, bar, within_bar): top-k
    * variance-explained proportion ≥ `varBar` (mathematically ≥ k/d —
    * top-k eigenvalues dominate the average — so the bar pins the
    * implementation, with margin for the estimate), and average
    * relative reconstruction error ≤ `errBar` via the projection
    * identity. Deterministic for a fixed corpus. */
  def gate(corpus: DataFrame, model: Model, varBar: Double,
           errBar: Double): DataFrame = {
    val varExplained = model.explained.sum
    val agg = project(corpus, model)
      .join(corpus, "id")
      .select(col("id"),
        Similarity.dot(col("unit"), col("unit")).as("v2"),
        Similarity.dot(col("proj"), col("proj")).as("p2"))
      .agg(count(lit(1)).as("n"),
        avg((col("v2") - col("p2")) / col("v2")).as("avg_err"))
    agg.select(explode(array(
        struct(lit("pca_var_explained").as("check_name"), col("n"),
          lit(varBar).as("bar"),
          (lit(varExplained) >= varBar).as("within_bar")),
        struct(lit("pca_recon_rel_err").as("check_name"), col("n"),
          lit(errBar).as("bar"),
          (col("avg_err") <= errBar).as("within_bar")))).as("g"))
      .select(col("g.check_name"), col("g.n"), col("g.bar"),
        col("g.within_bar"))
  }
}
