package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization over the IVF index — the ~32× ANN compression
  * rung (Faiss IVF-PQ; Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search").
  *
  * The vector is split into `m` subvectors; each subquantizer learns
  * its own `ksub`-centroid codebook (k-means on a deterministic hash
  * sample), and a vector is stored as `m` small codes — 8 codes of
  * <256 for a 64-dim float vector is 8 B against 256 B of floats, the
  * 32× shape. Queries score candidates with ASYMMETRIC DISTANCE
  * COMPUTATION: one m×ksub lookup table of exact sub-dot-products per
  * query, then every candidate's approximate score is m table reads —
  * no float vector is touched until the exact top-(k·refine) rerank.
  *
  * Spark-first shape: codebooks are broadcast literals (m·ksub·dsub
  * doubles), encoding and the ADC table are `slice`/`zip_with`/
  * `aggregate`/`transform` column expressions inside the scan stage
  * (the [[graft.functions.NearestCells]] codegen expression picks the
  * code per subspace), candidate pruning reuses the IVF cell join, and
  * the rerank is a window top-k over the shortlist. No Scala UDF, no
  * driver loop, no all-pairs anywhere.
  *
  * This implements the `by_residual = false` IVF-PQ variant (codes
  * quantize the raw vector, the IVF list only prunes candidates) —
  * the simpler of Faiss's two recipes and the one whose codes are
  * reusable by a flat (exhaustive-ADC) scan too. */
object PqIndex {

  /** `codebooks(j)` = subquantizer j's flattened ksub×dsub matrix;
    * `coded` = (id, unit, cell, codes) with `codes(j)` ∈ [0, ksub).
    * `byResidual` = true quantizes x − coarse_centroid(cell) (Faiss's
    * IVF-PQ default): the codes only have to cover the within-cell
    * spread, and ADC adds the exact ⟨q, centroid(cell)⟩ term per
    * probed cell. */
  final case class PqModel(codebooks: Array[Array[Double]], m: Int,
                           dsub: Int, ksub: Int, coded: DataFrame,
                           byResidual: Boolean = false)

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Int, Int, Long, Long, Boolean), PqModel]()

  /** Deterministic ~fitCap-row hash sample (the IvfIndex recipe: train
    * on a sample, encode everything). */
  // deterministic ordered sample — see IvfIndex.fitSample's scaladoc
  // (the codebook fits share the same cross-session-jitter fix)
  private def sampled(vecs: DataFrame, fitCap: Long, n: Long): DataFrame = {
    val s =
      if (fitCap <= 0 || n <= fitCap) vecs
      else vecs.filter(pmod(xxhash64(col("id").cast("string")), lit(n)) <
        lit(fitCap))
    s.coalesce(1).sortWithinPartitions(col("id"))
  }

  /** Train m subquantizers on the IVF model's assigned frame and
    * encode every vector. `ksub` adapts to corpus size (k-means wants
    * a multiple of ksub training points per subspace) up to the
    * standard 256 ceiling — at 256 each code fits one byte. */
  def build(spark: SparkSession, ivf: IvfIndex.Model, dim: Int, m: Int,
            seed: Long = 42L, fitCap: Long = 65536L,
            byResidual: Boolean = false): PqModel = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val flatIvf = typedLit(ivf.centroids.flatten.toSeq)
    // the vector the subquantizers see: the raw unit vector, or its
    // within-cell residual (one zip_with in the same scan)
    val encCol =
      if (byResidual)
        zip_with(col("unit"),
          slice(flatIvf, col("cell") * dim + 1, lit(dim)), (a, b) => a - b)
      else col("unit")
    val base = ivf.assigned // (id, unit, cell), session-persisted
    val n = graft.model.Views.memoizedStat(base)(_.count())
    val ksub = math.max(16L, math.min(256L, n / 8L)).toInt
    val sample = sampled(base, fitCap, n)
    // persist the filtered sample (8 fits re-read it) — but never
    // re-persist/unpersist the session-owned assigned frame itself
    val fitIsBase = sample eq base
    val fit = if (fitIsBase) sample
      else sample.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the m subquantizer fits are independent tiny jobs — run them
    // CONCURRENTLY (Spark schedules jobs from multiple threads);
    // serial fits paid ~1 s of fixed per-fit overhead × m on the
    // cold path of every gate that builds an index
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val codebooks = Await.result(Future.traverse((0 until m).toList) { j =>
      Future {
        val sub = fit.select(
          array_to_vector(slice(encCol, j * dsub + 1, dsub)).as("fv"))
        val km = new KMeans().setK(ksub).setSeed(seed + j)
          .setFeaturesCol("fv").setPredictionCol("c").fit(sub)
        km.clusterCenters.flatMap(_.toArray)
      }
    }, Duration.Inf).toArray
    if (!fitIsBase) { fit.unpersist(); () }
    val codeCols = (0 until m).map { j =>
      element_at(graft.functions.NearestCells.nearest_cells(
        slice(encCol, j * dsub + 1, dsub),
        typedLit(codebooks(j).toSeq), 1), 1).cast("int")
    }
    val coded = base.select(col("id"), col("unit"), col("cell"),
        array(codeCols: _*).as("codes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    PqModel(codebooks, m, dsub, ksub, coded, byResidual)
  }

  /** Session-cached [[build]] — ingest-time-index policy, same as
    * [[IvfIndex.buildCached]]. */
  def buildCached(spark: SparkSession, ivf: IvfIndex.Model, corpusKey: String,
                  dim: Int, m: Int, seed: Long = 42L,
                  fitCap: Long = 65536L,
                  byResidual: Boolean = false): PqModel =
    // The key MUST carry the wrapped IVF model's identity (its cell
    // count): PQ codes live in that model's cell space, and two
    // callers sharing a corpusKey around DIFFERENT IVF models would
    // otherwise poison each other — q_ann_pq (fixed nlist=16) and the
    // recall gate (corpus-derived nlist) collided exactly this way at
    // ×10, where the derived nlist first leaves the clamp (the gate
    // ranked probes in 51-cell space over codes assigned in 16-cell
    // space; found by the r17 ×10 crosscheck, invisible at reference
    // scale where both nlists clamp to 16).
    cache.computeIfAbsent(
      (spark.sparkContext.applicationId,
        s"$corpusKey@nlist=${ivf.centroids.length}", dim, m, seed, fitCap,
        byResidual),
      _ => build(spark, ivf, dim, m, seed, fitCap, byResidual))

  /** [[graft.model.Views.reset]] hook. */
  def reset(spark: SparkSession): Unit = {
    val app = spark.sparkContext.applicationId
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == app) { e.getValue.coded.unpersist(); it.remove() }
    }
  }

  /** The query's ADC lookup table as ONE flattened column:
    * lut[j·ksub + c] = ⟨q_j, codebook_j[c]⟩, computed exactly from the
    * float query once per query row. */
  private def lutCol(pq: PqModel, q: Column): Column =
    flatten(array((0 until pq.m).map { j =>
      val cb = typedLit(pq.codebooks(j).toSeq)
      transform(sequence(lit(0), lit(pq.ksub - 1)), c =>
        aggregate(
          zip_with(slice(q, j * pq.dsub + 1, pq.dsub),
            slice(cb, c * pq.dsub + 1, lit(pq.dsub)), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x))
    }: _*))

  /** Top-k per query: IVF cells prune candidates, ADC table reads rank
    * them (m element_at's per candidate — the float vector is never
    * read), the top-(k·refine) shortlist reranks exactly. Serving
    * shape: probes (with their LUTs) broadcast, the coded index
    * streams. */
  def topK(spark: SparkSession, ivf: IvfIndex.Model, pq: PqModel,
           queries: DataFrame, k: Int, nprobe: Int, refine: Int): DataFrame = {
    val flatIvf = typedLit(ivf.centroids.flatten.toSeq)
    val dim = pq.m * pq.dsub
    val base = queries.select(col("id").as("query_id"), col("unit").as("qu"),
      lutCol(pq, col("unit")).as("lut"),
      explode(graft.functions.NearestCells.nearest_cells(
        col("unit"), flatIvf, nprobe)).as("cell"))
    // by-residual ADC decomposes ⟨q, x⟩ ≈ ⟨q, centroid(cell)⟩ +
    // ⟨q, decode(residual codes)⟩: the first term is exact and
    // per-(query, cell) — computed once on the probe row; the LUT
    // (over the residual codebooks) supplies the second
    val probes =
      if (pq.byResidual)
        base.withColumn("cell_dot",
          aggregate(zip_with(col("qu"),
            slice(flatIvf, col("cell") * dim + 1, lit(dim)), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x))
      else base.withColumn("cell_dot", lit(0.0))
    val ksub = pq.ksub
    val adc = pq.coded
      .select(col("cell"), col("id").as("corpus_id"), col("unit").as("cu"),
        col("codes"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("qu"), col("corpus_id"), col("cu"),
        (col("cell_dot") + aggregate(
          transform(col("codes"),
            (c, j) => element_at(col("lut"), j * ksub + c + 1)),
          lit(0.0), (acc, x) => acc + x)).as("adc"))
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("corpus_id"))
    val short = adc.withColumn("sr", row_number().over(wShort))
      .filter(col("sr") <= k * refine)
    val wFinal = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    short
      .select(col("query_id"), col("corpus_id"),
        round(Similarity.dot(col("cu"), col("qu")), 6).as("cosine"))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }
}
