package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the ClickHouse `retention()`-style analytics
  * surface over the event stream: users are grouped into weekly
  * cohorts by their first-seen week; each later active week counts
  * into (cohort_week, week_offset).
  *
  * Scale shape: one distinct over (user, week) — the only shuffle that
  * sees raw volume; the cohort min and the activity join are both
  * keyed by user (co-partitioned), and the final matrix groupBy is
  * tiny (weeks × offsets).
  */
object Cohorts {

  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weekly = events.select(col(userCol).as("user"),
        date_trunc("week", col(tsCol)).cast("date").as("week"))
      .distinct()
    val cohort = weekly.groupBy(col("user"))
      .agg(min(col("week")).as("cohort_week"))
    weekly.join(cohort, Seq("user"))
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("users"))
  }
}
