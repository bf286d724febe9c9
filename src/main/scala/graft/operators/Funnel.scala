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

  /** Order-strict variant of [[windowFunnel]]: the chain advances to
    * step i+1 only if NO funnel-step event of another type occurs
    * strictly between the step-i and step-i+1 matches.
    *
    * This is a DELIBERATE DEVIATION from ClickHouse `strict_order`
    * (which it is inspired by), in two documented ways (ADVICE r11):
    * (a) the chain stays anchored at the EARLIEST step-1 event — a
    * later step-1 event that would start a cleaner chain is not
    * retried (CH restarts the chain there); (b) only funnel-typed
    * events interrupt — non-funnel event types never break the chain
    * (CH strict_order is interrupted by ANY intervening event). Both
    * choices keep the operator a fixed number of keyed aggregates
    * instead of a per-user event sort; the oracle twin implements the
    * same greedy-anchored, funnel-typed-interloper semantics. Within
    * that fixed-t1 anchoring, validating the greedy chain is already
    * the fixpoint: an interloper before the EARLIEST step-i+1 match
    * also precedes every later match — no rescan needed. Returns
    * (user, t1, level_strict).
    *
    * Scale shape: [[windowFunnel]]'s per-step aggregates plus ONE
    * more aggregate join keyed by user over the funnel-typed events. */
  def windowFunnelStrict(events: DataFrame, userCol: String, tsCol: String,
                         typeCol: String, steps: Seq[String],
                         windowHours: Int): DataFrame =
    gatedFunnel(events, userCol, tsCol, typeCol, steps, windowHours,
      interloperIsOtherType = true, out = "level_strict")

  /** ClickHouse `strict_dedup` mode, same anchoring deviations as
    * [[windowFunnelStrict]]: the chain advances to step i+1 only if
    * NO ALREADY-MATCHED step type repeats strictly between the step-i
    * and step-i+1 matches — CH interrupts on a repeat of ANY condition
    * matched so far, not just the one that opened the gap (a 'view'
    * repeat between click and purchase breaks the chain too; ADVICE
    * r14). The dual gate of strict_order (which breaks on OTHER funnel
    * types in the gap). Returns (user, t1, level_dedup). */
  def windowFunnelDedup(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, steps: Seq[String],
                        windowHours: Int): DataFrame =
    gatedFunnel(events, userCol, tsCol, typeCol, steps, windowHours,
      interloperIsOtherType = false, out = "level_dedup")

  private def gatedFunnel(events: DataFrame, userCol: String, tsCol: String,
                          typeCol: String, steps: Seq[String],
                          windowHours: Int, interloperIsOtherType: Boolean,
                          out: String): DataFrame = {
    require(steps.size >= 2)
    val base = windowFunnel(events, userCol, tsCol, typeCol, steps,
      windowHours)
    val ev = events.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("user"), col(tsCol).as("_ts"),
        col(typeCol).as("_tp"))
    val gapExprs = steps.indices.tail.map { i =>
      // gap (t_i, t_{i+1}): strict_order breaks on any funnel type
      // that is not the NEXT step's (steps(i) — its earliest match IS
      // t_{i+1}, so none can precede it); strict_dedup breaks on a
      // repeat of ANY already-matched step type (steps 1..i — the CH
      // contract; ADVICE r14 flagged the old opened-the-gap-only gate)
      val typeGate =
        if (interloperIsOtherType) col("_tp") =!= steps(i)
        else col("_tp").isin(steps.take(i): _*)
      sum(when(col("_ts") > col(s"t$i") && col("_ts") < col(s"t${i + 1}") &&
          typeGate, 1L).otherwise(0L)).as(s"x${i + 1}")
    }
    val gaps = ev.join(base, Seq("user"))
      .groupBy(col("user"))
      .agg(gapExprs.head, gapExprs.tail: _*)
    val lvl = steps.indices.tail.foldLeft(lit(1)) { (acc, i) =>
      val m = i + 1
      when(acc === lit(i) && col(s"t$m").isNotNull &&
        coalesce(col(s"x$m"), lit(0L)) === 0L, lit(m)).otherwise(acc)
    }
    base.join(gaps, Seq("user"), "left")
      .select(col("user"), col("t1"), lvl.as(out))
  }

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
