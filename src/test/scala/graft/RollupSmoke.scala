package graft

import org.apache.spark.sql.functions._

/** Fresh-JVM wiring smoke for the INJECTED rollup rewrite (the
  * GraftExtensions post-hoc resolution rule): the shared test session
  * cannot re-apply `spark.sql.extensions`, so — exactly like the SQL
  * DML smoke — this main builds a session through GraftSession (which
  * sets the extensions conf) and proves the rule fires during normal
  * analysis, no explicit rule application anywhere.
  *
  * Run: `sbt "Test/runMain graft.RollupSmoke"` — prints SMOKE PASS. */
object RollupSmoke {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get("local[4]")
    import s.implicits._
    val src = Seq((1L, "buy", 2.0), (1L, "sell", 3.0),
      (2L, "buy", 5.0), (2L, "buy", 7.0)).toDF("wallet", "side", "qty")
    val roll = src.groupBy($"wallet")
      .agg(sum(when($"side" === "buy", $"qty").otherwise(0.0)).as("bq"),
        count(lit(1)).as("n"))
    graft.plans.RollupRewrite.register(s, src, roll,
      dims = Seq((col("wallet"), "wallet")),
      sums = Seq((when($"side" === "buy", $"qty").otherwise(0.0), "bq")),
      countCol = Some("n"))
    val q = src.groupBy($"wallet")
      .agg(sum(when($"side" === "buy", $"qty").otherwise(0.0)).as("buy_qty"),
        count(lit(1)).as("trades"))
    val usedRollup = q.queryExecution.analyzed.exists(
      _.canonicalized == roll.queryExecution.analyzed.canonicalized)
    val rows = q.orderBy($"wallet").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
    println(s"SMOKE usedRollup=$usedRollup rows=$rows")
    require(usedRollup, "injected rule did not fire during analysis")
    require(rows == List((1L, 2.0, 2L), (2L, 12.0, 2L)), s"wrong rows: $rows")
    println("SMOKE PASS")
    s.stop()
  }
}
