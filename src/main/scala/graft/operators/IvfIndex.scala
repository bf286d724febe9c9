package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour index.
  *
  * The second scale path beside LSH ([[Similarity.lshTopK]]): k-means
  * partitions the corpus into `nlist` cells; queries probe only the
  * `nprobe` nearest cells. Centroids are tiny (nlist × dim) and live
  * on the driver/broadcast — corpus assignment is one ML transform,
  * probing is a bucketed join, never a cross product.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]], assigned: DataFrame)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), Model]()

  /** Cluster the corpus (id, unit) into nlist cells. */
  def build(spark: SparkSession, corpus: DataFrame, nlist: Int,
            seed: Long = 42L): Model = {
    val vecs = corpus.withColumn("fv", array_to_vector(col("unit")))
    val km = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("fv")
      .setPredictionCol("cell")
    val m = km.fit(vecs)
    val assigned = m.transform(vecs).select(col("id"), col("unit"), col("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Model(m.clusterCenters.map(_.toArray), assigned)
  }

  /** Session-cached [[build]] keyed by a caller-chosen corpus key
    * (e.g. the table path): an IVF index is built once at ingest and
    * probed by every query — the reference's persistent-index
    * semantics, same policy as [[graft.model.Views]]. */
  def buildCached(spark: SparkSession, corpus: DataFrame, corpusKey: String,
                  nlist: Int, seed: Long = 42L): Model =
    cache.computeIfAbsent(
      (spark.sparkContext.applicationId, corpusKey, nlist),
      _ => build(spark, corpus, nlist, seed))

  /** Unpersist and forget this app's cached models —
    * [[graft.model.Views.reset]] calls this so index lifetime follows
    * the session-MV lifetime. */
  def reset(spark: SparkSession): Unit = {
    val app = spark.sparkContext.applicationId
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == app) { e.getValue.assigned.unpersist(); it.remove() }
    }
  }

  /** Top-k per query probing the nprobe nearest cells. */
  def topK(spark: SparkSession, model: Model, queries: DataFrame, k: Int,
           nprobe: Int): DataFrame = {
    import spark.implicits._
    // nearest-centroid ranking happens driver-side: nlist × dim floats
    val centroids = model.centroids
    val cellsFor = udf { (q: Seq[Double]) =>
      centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < c.length && j < q.length) {
          val diff = c(j) - q(j); d += diff * diff; j += 1
        }
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2)
    }
    val probes = queries.select(col("id").as("query_id"), col("unit").as("qu"),
        explode(cellsFor(col("unit"))).as("cell"))
    val joined = model.assigned
      .select(col("cell"), col("id").as("corpus_id"), col("unit").as("cu"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        round(Similarity.dot(col("cu"), col("qu")), 6).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }
}
