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

  // keyed by every build input (ADVICE r12: seed/fitCap joined the
  // build signature when semDedup added the sampled fit — two calls
  // sharing (corpusKey, nlist) but differing there must not share a
  // model)
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Int, Long, Long), Model]()

  /** Deterministic, bounded k-means training input (Faiss's
    * train-on-sample practice, made REPRODUCIBLE): a hash-selected
    * sample, coalesced to ONE partition and sorted by id. Distributed
    * k-means is not bit-reproducible across sessions — centroid
    * updates reduce doubles in task-completion order — and the r17
    * ×10 crosscheck caught recall-gate cells near their bar flipping
    * BETWEEN RUNS on exactly that jitter (pq/pqr isotropic: fail in
    * one session, recall 1.0 in the next; same data, same seed). One
    * ordered partition fixes the summation order, so centroids — and
    * every gate boolean derived from them — are a pure function of
    * (data, seed). The cap bounds the single-partition fit at ANY
    * corpus size, so determinism costs no scalability: assignment,
    * the O(n) part, stays fully distributed.
    *
    * `fitCap` contract (ADVICE r17): fitCap <= 0 — the default — means
    * "no caller preference", which resolves to 256 rows per centroid
    * (Faiss's max_points_per_centroid). An explicit fitCap > 0 is
    * HONORED (floored at k so the fit stays well-posed), even below
    * 256·k: the caller owns the fidelity/cost trade. `nRows`, when the
    * caller already knows the corpus size, skips the count job. */
  private[operators] def fitSample(vecs: DataFrame, k: Int, fitCap: Long,
                                   idCol: String = "id",
                                   nRows: Option[Long] = None): DataFrame = {
    val cap = if (fitCap > 0) math.max(fitCap, k.toLong) else 256L * k
    val n = nRows.getOrElse(vecs.count())
    val sampled =
      if (n <= cap) vecs
      else vecs.filter(pmod(xxhash64(col(idCol).cast("string")), lit(n)) <
        lit(cap))
    sampled.coalesce(1).sortWithinPartitions(col(idCol))
  }

  def build(spark: SparkSession, corpus: DataFrame, nlist: Int,
            seed: Long = 42L, fitCap: Long = 0L): Model = {
    val vecs = corpus.withColumn("fv", array_to_vector(col("unit")))
    // corpus count memoized per canonical plan: AnnGates sizes its
    // operating point from the same count, so the fit-sample decision
    // rides that one job instead of adding its own
    val n = graft.model.Views.memoizedStat(corpus)(_.count())
    val fitOn = fitSample(vecs, nlist, fitCap, nRows = Some(n))
    val km = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("fv")
      .setPredictionCol("cell")
    val m = km.fit(fitOn)
    val assigned = m.transform(vecs).select(col("id"), col("unit"), col("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Model(m.clusterCenters.map(_.toArray), assigned)
  }

  /** SemDeDup's own nlist guidance made concrete: cells sized for a
    * constant ~256-row population so the within-cell quadratic term
    * n²/nlist stays ∝ n (VERDICT r11 #6: at fixed nlist the
    * density-axis scale exponent trends to 2). The ceiling bounds the
    * centroid broadcast (65536 × 64 doubles ≈ 33 MB); past ~16M
    * vectors per corpus the per-cell population grows again and the
    * next tool is hierarchical coarse quantization, not a bigger
    * flat codebook. */
  def nlistFor(n: Long): Int =
    math.max(16L, math.min(65536L, n / 256L)).toInt

  /** Session-cached [[build]] keyed by a caller-chosen corpus key
    * (e.g. the table path): an IVF index is built once at ingest and
    * probed by every query — the reference's persistent-index
    * semantics, same policy as [[graft.model.Views]]. */
  def buildCached(spark: SparkSession, corpus: DataFrame, corpusKey: String,
                  nlist: Int, seed: Long = 42L, fitCap: Long = 0L): Model =
    cache.computeIfAbsent(
      (spark.sparkContext.applicationId, corpusKey, nlist, seed, fitCap),
      _ => build(spark, corpus, nlist, seed, fitCap))

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
    val ith = hierCache.entrySet().iterator()
    while (ith.hasNext) {
      val e = ith.next()
      if (e.getKey._1 == app) { e.getValue.assigned.unpersist(); ith.remove() }
    }
  }

  /** (query_id, qu, cell): each query exploded to its nprobe nearest
    * cells. Cell ranking is the codegen'd [[graft.functions
    * .NearestCells]] expression against the flattened centroid matrix
    * as a broadcast literal (nlist × dim doubles — same pattern as the
    * PCA component literals in [[EmbeddingCompress]]); it runs inside
    * the query scan stage, no Scala UDF, no driver loop. */
  private def probes(model: Model, queries: DataFrame, nprobe: Int): DataFrame = {
    val flat = typedLit(model.centroids.flatten.toSeq)
    queries.select(col("id").as("query_id"), col("unit").as("qu"),
      explode(graft.functions.NearestCells.nearest_cells(
        col("unit"), flat, nprobe)).as("cell"))
  }

  private def rankJoined(joined: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  /** Top-k per query probing the nprobe nearest cells — the SERVING
    * shape: the query set is small and broadcast, the assignment table
    * streams with no shuffle. For offline batch query sets use
    * [[topKBatch]]. */
  def topK(spark: SparkSession, model: Model, queries: DataFrame, k: Int,
           nprobe: Int): DataFrame =
    rankJoined(model.assigned
      .select(col("cell"), col("id").as("corpus_id"), col("unit").as("cu"))
      .join(broadcast(probes(model, queries, nprobe)), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        round(Similarity.dot(col("cu"), col("qu")), 6).as("cosine"))
      .distinct(), k)

  /** Batch-query top-k: identical semantics to [[topK]] but the probe
    * side is NOT broadcast — both sides shuffle on `cell` and
    * sort-merge/hash join on the exchange. This is the plan for an
    * OFFLINE query set of millions (e.g. corpus-vs-corpus semantic
    * join), where broadcasting the probes would flip the build side
    * past executor memory (VERDICT r11). Per-cell work is
    * |cell| × |probes in cell| — the same bucketed bound as the
    * serving shape, just shuffled instead of replicated. */
  def topKBatch(spark: SparkSession, model: Model, queries: DataFrame, k: Int,
                nprobe: Int): DataFrame =
    rankJoined(model.assigned
      .select(col("cell"), col("id").as("corpus_id"), col("unit").as("cu"))
      .join(probes(model, queries, nprobe), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        round(Similarity.dot(col("cu"), col("qu")), 6).as("cosine"))
      .distinct(), k)

  // ---------------------------------------------------------------
  // two-level (hierarchical) coarse quantization — the >16M step
  // ---------------------------------------------------------------

  /** Two-level residual model: fine cell `c1 * l2 + c2` where c1
    * indexes the COARSE codebook and c2 the shared RESIDUAL codebook
    * (fine centroid ≈ coarse(c1) + residual(c2)). */
  final case class HierModel(coarse: Array[Array[Double]],
                             residual: Array[Array[Double]],
                             l2: Int, assigned: DataFrame)

  private val hierCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Int, Long, Long), HierModel]()

  /** The documented past-~16M-vectors step ([[nlistFor]]'s ceiling):
    * a flat codebook of n/256 cells outgrows both the centroid
    * broadcast and the O(n·nlist·dim) assignment scan. Two codebooks
    * of ~√nlist each give the same effective cell count with
    * O(n·(l1+l2)·dim) assignment and TWO k-means fits total (never
    * one fit per coarse cell): level 1 clusters the vectors, level 2
    * clusters the RESIDUALS x − coarse(x) — Faiss's IVF with a
    * residual coarse quantizer, the standard recipe. Everything runs
    * through the codegen [[graft.functions.NearestCells]] (squared-L2
    * ranking — exactly right for residuals) + `slice`/`zip_with`
    * arithmetic: no Scala UDF, no per-cell driver loop. */
  def buildHierarchical(spark: SparkSession, corpus: DataFrame,
                        nlistTotal: Int, seed: Long = 42L,
                        fitCap: Long = 0L): HierModel = {
    import graft.functions.NearestCells.nearest_cells
    val l1 = math.max(2, math.ceil(math.sqrt(nlistTotal.toDouble)).toInt)
    val l2 = math.max(2, (nlistTotal + l1 - 1) / l1)
    val vecs = corpus.withColumn("fv", array_to_vector(col("unit")))
    val km1 = new KMeans().setK(l1).setSeed(seed).setFeaturesCol("fv")
      .setPredictionCol("cell").fit(fitSample(vecs, l1, fitCap))
    val coarse = km1.clusterCenters.map(_.toArray)
    val dim = coarse.head.length
    val flat1 = typedLit(coarse.flatten.toSeq)
    // coarse assignment + residual in ONE pass of scan-stage codegen
    val withRes = corpus.select(col("id"), col("unit"),
        element_at(nearest_cells(col("unit"), flat1, 1), 1).as("c1"))
      .withColumn("res", zip_with(col("unit"),
        slice(flat1, col("c1") * dim + 1, lit(dim)), (a, b) => a - b))
    val km2 = new KMeans().setK(l2).setSeed(seed + 1).setFeaturesCol("fv")
      .setPredictionCol("cell")
      .fit(fitSample(withRes.withColumn("fv", array_to_vector(col("res"))),
        l2, fitCap))
    val residual = km2.clusterCenters.map(_.toArray)
    val flat2 = typedLit(residual.flatten.toSeq)
    val assigned = withRes.select(col("id"), col("unit"),
        (col("c1") * l2 +
          element_at(nearest_cells(col("res"), flat2, 1), 1)).as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    HierModel(coarse, residual, l2, assigned)
  }

  /** Session-cached [[buildHierarchical]] — same ingest-time-index
    * policy as [[buildCached]]. */
  def buildHierarchicalCached(spark: SparkSession, corpus: DataFrame,
                              corpusKey: String, nlistTotal: Int,
                              seed: Long = 42L, fitCap: Long = 0L)
      : HierModel =
    hierCache.computeIfAbsent(
      (spark.sparkContext.applicationId, corpusKey, nlistTotal, seed, fitCap),
      _ => buildHierarchical(spark, corpus, nlistTotal, seed, fitCap))

  /** Each query exploded to nprobe1 coarse cells, then within each to
    * the nprobe2 nearest residual cells of q − coarse(c1) — pair
    * ranking by the decomposed distance, nprobe1·l2 extra dot
    * products per query instead of a flat nlist scan. */
  private def probesHier(model: HierModel, queries: DataFrame,
                         nprobe1: Int, nprobe2: Int): DataFrame = {
    import graft.functions.NearestCells.nearest_cells
    val flat1 = typedLit(model.coarse.flatten.toSeq)
    val flat2 = typedLit(model.residual.flatten.toSeq)
    val dim = model.coarse.head.length
    queries.select(col("id").as("query_id"), col("unit").as("qu"),
        explode(nearest_cells(col("unit"), flat1, nprobe1)).as("c1"))
      .withColumn("res", zip_with(col("qu"),
        slice(flat1, col("c1") * dim + 1, lit(dim)), (a, b) => a - b))
      .select(col("query_id"), col("qu"), col("c1"),
        explode(nearest_cells(col("res"), flat2, nprobe2)).as("c2"))
      .select(col("query_id"), col("qu"),
        (col("c1") * model.l2 + col("c2")).as("cell"))
  }

  /** [[topK]] over the two-level index: identical serving plan (the
    * probe side broadcasts, the assignment streams), only the cell
    * addressing is hierarchical. */
  def topKHier(spark: SparkSession, model: HierModel, queries: DataFrame,
               k: Int, nprobe1: Int, nprobe2: Int): DataFrame =
    rankJoined(model.assigned
      .select(col("cell"), col("id").as("corpus_id"), col("unit").as("cu"))
      .join(broadcast(probesHier(model, queries, nprobe1, nprobe2)),
        Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        round(Similarity.dot(col("cu"), col("qu")), 6).as("cosine"))
      .distinct(), k)
}
