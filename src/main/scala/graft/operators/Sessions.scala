package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: gap-based sessions per user, derived with two
  * window passes (no state, no UDFs): a new session starts where the
  * gap to the previous event exceeds `gapMinutes`; the session id is
  * the running count of session starts. Both passes share the same
  * (user) partitioning — one shuffle total.
  */
object Sessions {

  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        // via an explicit TIMESTAMP hop: TIMESTAMP_NTZ (the r8 events
        // generation) has no direct BIGINT cast; session tz is UTC
        when(col("__prev_ts").isNull ||
          col(tsCol).cast("timestamp").cast("long") -
            col("__prev_ts").cast("timestamp").cast("long") >
            gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev_ts", "__new_session")
  }

  /** Per-session stats (events, span, value). */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   valueCol: String, gapMinutes: Int): DataFrame =
    sessionize(events, userCol, tsCol, gapMinutes)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (max(col(tsCol)).cast("timestamp").cast("long") -
          min(col(tsCol)).cast("timestamp").cast("long"))
          .as("span_seconds"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("value_sum"))
}
