package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling surfaces.
  *
  * Reference: ClickHouse's `SAMPLE k` clause reads a deterministic
  * slice selected by the table's sampling-key hash — the same rows
  * every time, independent of parallelism. That reproducibility is
  * exactly what a training-data mix needs: re-running the pipeline
  * yields the same corpus slice, and a different `den`/threshold
  * widens the slice monotonically (SAMPLE 1/8 ⊂ SAMPLE 1/4).
  *
  * Spark-first: the keep decision is a pure column expression on a
  * cryptographic hash of the sampling key — no shuffle, no state, no
  * RNG seed plumbed through executors; the filter evaluates inside the
  * scan stage and composes with predicate pushdown on other columns.
  * md5 (not xxhash64) so the decision is reproducible bit-for-bit in
  * any engine that can hash a string — the DuckDB oracle replays it.
  */
object Sampling {

  /** Hex-prefix keep predicate: keeps rows whose md5(key) prefix sorts
    * below `hexThreshold` (lowercase hex, 4 chars → fraction =
    * parseInt(threshold,16)/65536). Nested samples: a smaller
    * threshold selects a subset of a larger one. */
  def keep(key: Column, hexThreshold: String): Column = {
    require(hexThreshold.matches("[0-9a-f]{4}"), "threshold: 4 lowercase hex chars")
    substring(md5(key.cast("string")), 1, 4) < hexThreshold
  }

  /** Deterministic ~fraction sample of `df` by `key`. */
  def hashSample(df: DataFrame, key: Column, hexThreshold: String): DataFrame =
    df.filter(keep(key, hexThreshold))

  /** Stratified deterministic sample: the `ceil(frac · |stratum|)`
    * rows of each stratum that sort first by md5(key) — every stratum
    * is represented at the same rate regardless of its size (the
    * data-mix recipe: "10% of every language", not "10% overall").
    *
    * Scale shape: one window (rank within stratum by hash) over a
    * single shuffle on the stratum key plus a count per stratum
    * carried by the same window — no join, no driver action. Skewed
    * strata sort within their partition only.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       frac: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratum)
    val ord = w.orderBy(md5(key.cast("string")), key)
    df.withColumn("_rn", row_number().over(ord))
      .withColumn("_n", count(lit(1)).over(w))
      .filter(col("_rn") <= ceil(col("_n") * frac))
      .drop("_rn", "_n")
  }

  /** Corpus-mix executor: per-stratum deterministic sampling at
    * PER-STRATUM rates ("keep 80% of wiki, 20% of web, 50% of
    * code") — the operator that turns a data-mix recipe
    * ([[CorpusPipeline.dataMixReport]] is the read side) into the
    * actual training slice. `rates` is a small (stratum, rate) dim:
    * broadcast-joined, so the keep decision stays a column predicate
    * in the scan stage — no window, no shuffle, and the same
    * monotone-nesting property as [[hashSample]] (raising a stratum's
    * rate only ADDS rows to its slice). */
  def mixSample(df: DataFrame, stratumCol: String, key: Column,
                rates: DataFrame): DataFrame = {
    // the stratum's rate as a 4-hex-char threshold (the same 16-bit
    // grid as [[keep]] — engine-replayable string compare); rate ≥ 1
    // keeps everything, and the clamp keeps an out-of-range rate from
    // corrupting the hex compare (hex of a negative long is 16 chars,
    // which lpad TRUNCATES to "ffff" — keep-everything, the opposite
    // of the empty slice a rate ≤ 0 asks for)
    val clamped = least(greatest(col("rate"), lit(0.0)), lit(1.0))
    val thr = lpad(lower(hex(floor(clamped * 65536).cast("long"))), 4, "0")
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(col("rate") >= 1.0 ||
        substring(md5(key.cast("string")), 1, 4) < thr)
      .drop("rate")
  }

  /** Deterministic seeded global shuffle for training-data ordering:
    * every row gets a (shard, pos) address — shard from the first two
    * hex chars of md5(seed:key) (mod `shards`), pos by rank of the
    * remaining hash within the shard. Re-running with the same seed
    * reproduces the exact epoch order; a new seed is a fresh
    * permutation with no state carried.
    *
    * Scale shape: shard assignment is a scan-stage column expression
    * (no shuffle); the within-shard rank is one window per shard —
    * pick `shards` ≈ executor parallelism so each window sorts
    * 1/shards of the data. No global row_number bottleneck: a
    * consumer reads shards in order (shard, pos), which is a total
    * order without ever materializing one. */
  def shardShuffle(df: DataFrame, key: Column, seed: String,
                   shards: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shards >= 1 && shards <= 256, "shards in 1..256")
    val w = Window.partitionBy(col("shard"))
      .orderBy(substring(col("_h"), 3, 30), key)
    df.withColumn("_h", md5(concat(lit(seed), lit(":"), key.cast("string"))))
      .withColumn("shard",
        conv(substring(col("_h"), 1, 2), 16, 10).cast("int") % shards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_h")
  }
}
