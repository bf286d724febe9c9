package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for 100 TB-scale keys (whale wallets, hot
  * tokens). Spark's map-side partial aggregation already absorbs skew
  * for algebraic aggregates; these cover the two cases it can't:
  * exact distinct counts and shuffle joins against a skewed build
  * side. AQE's skew-join split handles the sort-merge case at
  * runtime; the salted join is the explicit, planner-independent
  * variant.
  */
object Skew {

  /** Exact distinct count per key without a single giant per-key
    * state: values are pre-partitioned by hash(value) % salts, the
    * per-salt distinct counts are disjoint, so their sum is exact. */
  def saltedDistinctCount(df: DataFrame, key: Column, value: Column,
                          salts: Int, out: String): DataFrame =
    df.groupBy(key.as("k"), pmod(xxhash64(value), lit(salts)).as("_salt"))
      .agg(countDistinct(value).as("_c"))
      .groupBy(col("k"))
      .agg(sum(col("_c")).as(out))

  /** Salted equi-join: the big (skewed) side gets a deterministic salt
    * from a per-row discriminator column; the small side is replicated
    * `salts` times. One shuffle each, no single reducer receives a
    * whole hot key. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 discriminator: Column, salts: Int): DataFrame = {
    val b = big.withColumn("_salt", pmod(xxhash64(discriminator), lit(salts)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
