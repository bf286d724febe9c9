package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each probe row, the most recent quote at or before
  * the probe timestamp, per key.
  *
  * Reference semantics: the ledger engine values open positions with
  * the last trade price as of a snapshot time (ledger-engine.ts
  * getOpenPositionsValue + token_last_price); ClickHouse exposes the
  * same as ASOF JOIN.
  *
  * Spark-first: no built-in ASOF operator, but the union-and-window
  * formulation is a single shuffle on the key followed by one ordered
  * pass — the same cost as a sort-merge as-of. Quotes and probes are
  * interleaved in (ts, kind) order; `last_value(ignoreNulls)` carries
  * the latest quote value forward into each probe row.
  */
object AsOf {

  /** @param quotes (key, ts, value) — pre-deduplicated to one row per
    *               (key, ts); later rows win via the seq ordering
    * @param probes (key, pts) — probe timestamps
    * @return probes + value_asof (null when no quote at or before pts)
    */
  def joinAsOf(quotes: DataFrame, probes: DataFrame,
               key: String, quoteTs: String, value: String,
               probeTs: String): DataFrame = {
    val q = quotes.select(col(key).as("k"), col(quoteTs).as("t"),
      lit(0).as("kind"), col(value).as("v"))
    val p = probes.select(col(key).as("k"), col(probeTs).as("t"),
      lit(1).as("kind"), lit(null).cast(q.schema("v").dataType).as("v"))
    // quotes sort before probes at equal ts → "at or before" semantics
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, 0)
    q.unionAll(p)
      .withColumn("value_asof", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("k").as(key), col("t").as(probeTs), col("value_asof"))
  }

  /** [[joinAsOf]] with a staleness bound (ClickHouse ASOF with a
    * bounded lookback; pandas merge_asof `tolerance`): the matched
    * quote only counts when it is at most `toleranceSec` seconds
    * before the probe, else `value_asof` is null ("no fresh-enough
    * price"). Same single keyed shuffle + one ordered pass — the
    * window additionally carries the matched quote's own timestamp
    * forward, and one scalar comparison applies the bound. */
  def joinAsOfTolerance(quotes: DataFrame, probes: DataFrame,
                        key: String, quoteTs: String, value: String,
                        probeTs: String, toleranceSec: Long): DataFrame = {
    val q = quotes.select(col(key).as("k"), col(quoteTs).as("t"),
      lit(0).as("kind"), col(value).as("v"), col(quoteTs).as("qt"))
    val p = probes.select(col(key).as("k"), col(probeTs).as("t"),
      lit(1).as("kind"), lit(null).cast(q.schema("v").dataType).as("v"),
      lit(null).cast(q.schema("qt").dataType).as("qt"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, 0)
    q.unionAll(p)
      .withColumn("v_last", last(col("v"), ignoreNulls = true).over(w))
      .withColumn("qt_last", last(col("qt"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      // timestampdiff handles TIMESTAMP and TIMESTAMP_NTZ alike (a
      // straight long cast refuses NTZ, the parquet timestamp type)
      .withColumn("value_asof",
        when(expr("timestampdiff(SECOND, qt_last, t)") <= toleranceSec,
          col("v_last")))
      .select(col("k").as(key), col("t").as(probeTs), col("value_asof"))
  }
}
