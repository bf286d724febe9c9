package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ANN recall-gate harness, shared by the driver query
  * (`q_ann_recall` — drops the recall column so its oracle schema is
  * unchanged) and the off-clamp scale harness ([[graft.ScaleAnn]] —
  * keeps the recall value as evidence).
  *
  * Gate design (r12–r16 history in the scaladoc below): one exact
  * brute-force truth set per corpus shape, seven approximate methods
  * measured against it, each with a recall bar chosen at its
  * documented operating envelope. Truth sets + per-method results
  * route through Views.cached (VERDICT r16 #7): within a session that
  * is plain session caching; with SPARK_GRAFT_MV_DISK set they persist
  * keyed by (input listing, code build), so a COLD pass pays a k-rows
  * parquet read instead of rebuilding the models — sound because every
  * gate is deterministic (seeded hyperplanes/hashes, deterministic
  * k-means init, fixed probe counts) and the fingerprint moves on any
  * input or code change.
  */
object AnnGates {

  /** The sources whose content defines ANN gate semantics and
    * operating points. [[graft.ScaleAnn]] stamps their fingerprint
    * into SCALE_ANN.json and ScaleStampSpec recomputes it from the
    * working tree (VERDICT r17 #6): the ×100 off-clamp evidence goes
    * stale-red the moment the ANN operator set changes without a
    * re-run. Content-hashed, not mtime — a fresh git checkout must not
    * false-positive. */
  val annSourceFiles: Seq[String] = Seq(
    "src/main/scala/graft/operators/AnnGates.scala",
    "src/main/scala/graft/operators/IvfIndex.scala",
    "src/main/scala/graft/operators/PqIndex.scala",
    "src/main/scala/graft/operators/Similarity.scala",
    "src/main/scala/graft/functions/VectorExprs.scala",
    "src/main/scala/graft/ScaleAnn.scala",
    "src/main/scala/graft/ScaleBench.scala")

  /** Known limitation (ADVICE r18): this hashes the WORKING-TREE
    * sources, i.e. the code the evidence claims, not necessarily the
    * code that executed (a prebuilt jar run after an uncompiled edit
    * would stamp the new fingerprint over old behavior). That gap is
    * closed operationally — ScaleAnn runs through `sbt runMain`, which
    * compiles first — and the failure mode of a NON-repo CWD (every
    * file 'absent', one stable fake fingerprint matching nothing real)
    * is now a loud error instead of a silent stamp. */
  def annSourceFingerprint(
      root: java.nio.file.Path = java.nio.file.Paths.get(".")): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    var resolved = 0
    annSourceFiles.foreach { f =>
      md.update(f.getBytes("UTF-8"))
      val p = root.resolve(f)
      if (java.nio.file.Files.exists(p)) {
        resolved += 1
        md.update(java.nio.file.Files.readAllBytes(p))
      } else md.update("absent".getBytes("UTF-8"))
    }
    require(resolved > 0,
      s"annSourceFingerprint: none of ${annSourceFiles.size} ANN sources " +
        s"resolve under ${root.toAbsolutePath} — run from the repo root " +
        "(a fingerprint of all-absent files would stamp evidence no code matches)")
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** Corpus-size-DERIVED operating point for the flat-IVF family
    * (the r16 ×10 crosscheck find: points tuned at the 2k-vector sf0.1
    * corpus sat lower on the recall curve at 20k — ivf isotropic and
    * pq/pqr clustered dipped under their bars).
    *
    * Faiss's rule: cells ∝ √N (per-cell population grows √N, not N)
    * and the ADC rerank shortlist stays a constant CORPUS fraction
    * (refine ∝ N). Flat-IVF probe count: N^0.75 growth (base 8 at the
    * reference corpus) — √N (constant fraction) holds the CLUSTERED
    * shape but measured 0.88 on 10× isotropic noise; structureless
    * data is IVF's adversarial bound and its probed fraction must grow
    * toward 1 with N (the hierarchical ivf2 exists precisely to avoid
    * this; it holds at ×10 with fixed levels). Clamped at the sf0.1
    * reference so sf0.01/sf0.1 behavior is bit-identical to the pinned
    * operating points. */
  final case class OpPoint(nCorpus: Long, nlist: Int, nprobeIvf: Int,
                           nprobePq: Int, refine: Int, sqRefine: Int)

  def operatingPoint(nCorpus: Long): OpPoint = {
    val opScale = math.max(1.0, nCorpus / 2000.0)
    val opS = math.sqrt(opScale)
    OpPoint(nCorpus,
      nlist = (16 * opS).round.toInt,
      nprobeIvf = (8 * math.pow(opScale, 0.75)).round.toInt,
      nprobePq = (12 * opS).round.toInt,
      refine = math.ceil(20 * opScale).toInt,
      // SQ8's exact-rerank shortlist must ALSO grow ∝N (the ×100
      // off-clamp run's find: fixed refine=4 left sq×clustered at 0.86
      // vs its 0.9 bar at 200k vectors) — the int8 quantization error
      // is a fixed absolute cosine band, so the candidate count inside
      // that band around the true top-k boundary grows with local
      // density. Same ∝N rule as the PQ family's ADC shortlist,
      // clamped at the reference corpus like every other derived point.
      sqRefine = math.ceil(4 * opScale).toInt)
  }

  /** All seven method gates over one corpus shape:
    * (method, shape, bar, recall, recall_ge_bar).
    *
    * Per-method envelopes: ivf ≥0.9 (probed fraction grows with N on
    * isotropic noise); ivf2 ≥0.9 at FIXED levels (4 coarse × 4
    * residual, 3×4 probed — the levels are the mechanism that absorbs
    * corpus growth, measured 0.90 isotropic / 1.0 clustered); lsh
    * ≥0.6 (6 planes × 24 tables); sq ≥0.9 (int8 scan + exact rerank,
    * shortlist ∝N, 4·k at the reference); pq/pqr ≥0.85 (m=8
    * subquantizers, ADC shortlist
    * refine·k from the probed cells, exact rerank — operating point
    * measured on the adversarial isotropic shape where ADC ranks
    * near-tie cosines). */
  def gates(s: SparkSession, d: String, shape: String, corpus: DataFrame,
            cacheKey: String): DataFrame = {
    val queries = corpus.filter(col("id") < 5)
    val exact = graft.model.Views
      .cached(s, d, s"ann_truth_$shape")(
        Similarity.bruteForceTopK(corpus, queries, 10))
      .select(col("query_id"), col("corpus_id"))
    def gate(name: String, bar: Double, approx: => DataFrame) =
      exact.join(
          graft.model.Views.cached(s, d, s"ann_gate_${shape}_$name")(
              approx.select(col("query_id"), col("corpus_id")))
            .withColumn("hit", lit(1)),
          Seq("query_id", "corpus_id"), "left")
        .agg(avg(coalesce(col("hit"), lit(0))).as("recall"))
        .select(lit(name).as("method"), lit(shape).as("shape"),
          lit(bar).as("bar"), col("recall"),
          (col("recall") >= bar).as("recall_ge_bar"))
    // the count is memoized per canonical corpus plan (one cached-frame
    // job per session); the hierarchical ivf2 stays FIXED by design.
    // Models are LAZY (VERDICT r17 #3/#4): each gate's per-method frame
    // reaches Views.cached as a by-name thunk, so when every gate
    // result disk-attaches (a primed SPARK_GRAFT_MV_DISK cache), no
    // k-means/PQ fit runs at all — the cold pass is parquet reads.
    val op = operatingPoint(graft.model.Views.memoizedStat(corpus)(_.count()))
    lazy val model = IvfIndex.buildCached(s, corpus, corpusKey = cacheKey,
      nlist = op.nlist)
    lazy val hier = IvfIndex.buildHierarchicalCached(s, corpus,
      corpusKey = cacheKey + ":hier", nlistTotal = 16)
    lazy val pq = PqIndex.buildCached(s, model, corpusKey = cacheKey + ":pq",
      dim = 64, m = 8)
    lazy val pqr = PqIndex.buildCached(s, model, corpusKey = cacheKey + ":pqr",
      dim = 64, m = 8, byResidual = true)
    gate("ivf", 0.9,
        IvfIndex.topK(s, model, queries, k = 10, nprobe = op.nprobeIvf))
      .unionByName(gate("ivf2", 0.9,
        IvfIndex.topKHier(s, hier, queries, k = 10, nprobe1 = 3,
          nprobe2 = 4)))
      .unionByName(gate("lsh", 0.6,
        Similarity.lshTopK(corpus, queries, dim = 64, planes = 6, k = 10,
          tables = 24)))
      .unionByName(gate("sq", 0.9,
        Similarity.sqTopK(corpus, queries, k = 10, refine = op.sqRefine)))
      .unionByName(gate("pq", 0.85,
        PqIndex.topK(s, model, pq, queries, k = 10, nprobe = op.nprobePq,
          refine = op.refine)))
      .unionByName(gate("pqr", 0.85,
        PqIndex.topK(s, model, pqr, queries, k = 10, nprobe = op.nprobePq,
          refine = op.refine)))
  }
}
