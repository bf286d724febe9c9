package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event funnel analysis — the ClickHouse `windowFunnel()` surface.
  *
  * Semantics (deterministic earliest-chain): step 1 anchors at the
  * user's earliest step-1 event; each later step matches its earliest
  * event strictly after the previous step and within `windowHours` of
  * the anchor. `level` = number of steps reached.
  *
  * Scale shape: one filtered aggregate per step, all keyed by user —
  * N small co-partitioned joins (N = #steps, a constant), never a
  * per-user event sort.
  */
object Funnel {

  def windowFunnel(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowHours: Int): DataFrame = {
    require(steps.nonEmpty)
    val user = col(userCol)
    val horizon = expr(s"INTERVAL $windowHours HOURS")
    val s1 = events.filter(col(typeCol) === steps.head)
      .groupBy(user.as("user")).agg(min(col(tsCol)).as("t1"))
    val stepped = steps.zipWithIndex.tail.foldLeft(s1) { case (prev, (st, i)) =>
      val ti = s"t$i"            // previous step's timestamp column
      val tn = s"t${i + 1}"
      val next = events.filter(col(typeCol) === st)
        .select(user.as("user"), col(tsCol).as("_ts"))
        .join(prev, Seq("user"))
        .filter(col("_ts") > col(ti) && col("_ts") <= col("t1") + horizon)
        .groupBy(col("user"))
        .agg(min(col("_ts")).as(tn))
        .select(col("user"), col(tn))
      prev.join(next, Seq("user"), "left")
    }
    val level = steps.indices.tail.foldLeft(lit(1)) { (acc, i) =>
      when(col(s"t${i + 1}").isNotNull, lit(i + 1)).otherwise(acc)
    }
    stepped.select((col("user") +: steps.indices.map(i => col(s"t${i + 1}"))) :+
      level.as("level"): _*)
  }

  /** Funnel conversion summary: users reaching each level. */
  def funnelSummary(funnel: DataFrame): DataFrame =
    funnel.groupBy(col("level")).agg(count(lit(1)).as("users"))

  /** The ClickHouse `sequenceMatch('(?1).*(?2)…')` surface: per user,
    * did the step events occur in order (any spacing)? Equivalent to a
    * window funnel with an unbounded horizon: the greedy earliest
    * chain finds an ordered subsequence iff one exists. Returns every
    * user that has a step-1 event, with `matched` true when the full
    * chain completed.
    *
    * Scale shape: same as [[windowFunnel]] — one filtered aggregate
    * per step keyed by user, no per-user event sort, no horizon
    * predicate. */
  def sequenceMatch(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val user = col(userCol)
    val s1 = events.filter(col(typeCol) === steps.head)
      .groupBy(user.as("user")).agg(min(col(tsCol)).as("t1"))
    val stepped = steps.zipWithIndex.tail.foldLeft(s1) { case (prev, (st, i)) =>
      val ti = s"t$i"
      val tn = s"t${i + 1}"
      val next = events.filter(col(typeCol) === st)
        .select(user.as("user"), col(tsCol).as("_ts"))
        .join(prev, Seq("user"))
        .filter(col("_ts") > col(ti))
        .groupBy(col("user"))
        .agg(min(col("_ts")).as(tn))
        .select(col("user"), col(tn))
      prev.join(next, Seq("user"), "left")
    }
    stepped.select(col("user"),
      col(s"t${steps.length}").isNotNull.as("matched"))
  }
}
