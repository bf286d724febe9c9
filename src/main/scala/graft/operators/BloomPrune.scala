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

  /** Exact `fact ⋈ dim on key`, bloom-pruned before the exchange.
    * Sizing: ~10 numBits per expected dim key gives ~1% fp at
    * numHashes = 7.
    *
    * The sketch reaches the probe as a SCALAR SUBQUERY (`.scalar()`),
    * not a broadcast-joined column: a cross join would attach the
    * sketch bytes to EVERY fact row and materialize |fact| × sketch
    * bytes of row copies before the filter could drop them (measured:
    * a 128 KiB sketch × 1.2 M rows ≈ 150 GB of memcpy). The subquery
    * executes once and the probe reads the one shared value. */
  def prunedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 numBits: Int = 1 << 20, numHashes: Int = 7): DataFrame = {
    val sketch = dim.agg(
        BloomExprs.bloom_agg(xxhash64(col(key)), numBits, numHashes).as("bf"))
      .scalar()
    fact.filter(BloomExprs.might_contain(sketch, xxhash64(col(key))))
      .join(dim, Seq(key))
  }
}
