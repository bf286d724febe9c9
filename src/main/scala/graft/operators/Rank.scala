package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scale-safe replacement for an
  * unpartitioned `Window.orderBy` (which Spark executes as a
  * single-partition sort: one task owns EVERY row, the classic
  * 100 TB plan-killer; the reference's global orderings ride its
  * sorted storage order instead, e.g. leaderboard ranks over an
  * ORDER BY table, 001:140-160).
  *
  * Two-phase shape, all shuffles full-width:
  *   1. range-repartition on the sort key + local sort — Spark's own
  *      distributed ORDER BY machinery (sampled range bounds), so
  *      partition p holds a contiguous, sorted slice of the global
  *      order;
  *   2. rank within each partition via `monotonically_increasing_id`
  *      (consecutive within a partition by contract: partition id in
  *      the high bits, row index in the low 33) — NO window, NO
  *      per-partition state;
  *   3. per-partition (min id, count) roll up to ≤ `numPartitions`
  *      rows; cumulative offsets come from a triangular self-join of
  *      that tiny aggregate (instead of an unpartitioned window —
  *      keeps the "no single-partition WindowExec" invariant
  *      PlanAuditSpec pins), broadcast back and added to the local
  *      rank.
  *
  * The broadcast side is one row per shuffle partition — bytes, not
  * data — so the plan survives any row count that range-partitions.
  */
object Rank {

  /** Append a 1-based global row number `out` ordered by `sortCols`
    * (ties must be broken by the caller's key list for determinism)
    * plus `outTotal` = the total row count (broadcast, for
    * ntile/percent_rank arithmetic downstream). */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      out: String, outTotal: String): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
    val stats = parted.groupBy(col("__pid"))
      .agg(min(col("__mid")).as("__min"), count(lit(1)).as("__cnt"))
    // triangular self-join over ≤ n rows: offset(p) = Σ cnt(p' < p)
    val off = stats.as("x")
      .join(stats.select(col("__pid").as("__pid2"), col("__cnt").as("__cnt2"))
        .as("y"), col("__pid2") < col("__pid"), "left")
      .groupBy(col("__pid"), col("__min"))
      .agg(coalesce(sum(col("__cnt2")), lit(0L)).as("__off"))
    val total = stats.agg(sum(col("__cnt")).as(outTotal))
    parted
      .join(broadcast(off), Seq("__pid"))
      .crossJoin(broadcast(total))
      .withColumn(out, col("__off") + (col("__mid") - col("__min")) + 1L)
      .drop("__pid", "__mid", "__min", "__off")
  }

  /** SQL `ntile(k)` from a global row number: the first `total mod k`
    * buckets take one extra row (the standard larger-groups-first
    * fill both Spark and DuckDB implement). Integer-only arithmetic;
    * `greatest(base, 1)` guards the ANSI div-by-zero when
    * total < k (base = 0 — the branch is unreachable then, but ANSI
    * evaluates eagerly under codegen). */
  def ntileFromRank(rank: Column, total: Column, k: Int): Column = {
    val base = total.cast("long") / lit(k.toLong)
    val baseI = floor(base).cast("long")
    val rem = total.cast("long") % lit(k.toLong)
    val r0 = rank.cast("long") - 1L
    val cut = rem * (baseI + 1L)
    when(r0 < cut, floor(r0 / (baseI + 1L)).cast("long") + 1L)
      .otherwise(rem +
        floor((r0 - cut) / greatest(baseI, lit(1L))).cast("long") + 1L)
      .cast("int")
  }

  /** SQL `percent_rank` from a global row number (0 for a single
    * row, like both engines). */
  def percentRankFromRank(rank: Column, total: Column): Column =
    when(total > 1L,
      (rank.cast("double") - 1.0) / (total.cast("double") - 1.0))
      .otherwise(0.0)
}
