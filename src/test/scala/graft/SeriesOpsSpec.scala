package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Hand-derived and property pins for the wave-2 series operators.
  * The driver oracle proves Spark ≡ DuckDB on the testdata, but both
  * sides could share one misunderstanding of the OPERATOR — these
  * cases pin the semantics against independent derivations. */
class SeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  test("interval sweep: hand case — closed intervals, shared endpoints, union length") {
    // key 1: [0,2], [1,3], [3,4] → at t=3 the [1,3] end processes
    // AFTER the [3,4] start (starts-first = closed semantics), so
    // max_open = 2 (at t∈[1,2] and at t=3); union covers [0,4] = 4.
    // key 2: [5,5] zero-length + disjoint [7,8] → max 1, length 1.
    val iv = Seq((1L, 0, 2), (1L, 1, 3), (1L, 3, 4),
      (2L, 5, 5), (2L, 7, 8))
      .toDF("k", "a", "b")
      .select(col("k"),
        to_timestamp(lit("1995-01-01")).as("base"), col("a"), col("b"))
      .select(col("k"),
        expr("base + make_interval(0,0,0,a)").as("t0"),
        expr("base + make_interval(0,0,0,b)").as("t1"))
    val ev = iv.select(col("k"), col("t0").as("t"), lit(1).as("delta"))
      .unionAll(iv.select(col("k"), col("t1").as("t"), lit(-1).as("delta")))
    val g = ev.groupBy(col("k"), col("t"), col("delta"))
      .agg(sum(col("delta")).as("d"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("delta").desc)
    val got = g.withColumn("cum", sum(col("d")).over(w))
      .withColumn("seg", when(col("cum") > 0,
        datediff(lead(col("t"), 1).over(w), col("t"))).otherwise(lit(0)))
      .groupBy(col("k"))
      .agg(max(col("cum")).cast("long").as("mx"),
        sum(col("seg")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ((2L, 4L)), 2L -> ((1L, 1L))))
  }

  test("sequenceCount lag-collapse ≡ the greedy automaton on random two-symbol streams") {
    // independent reference: the sequential greedy matcher
    def greedy(s: Seq[String]): Int = {
      var armed = false; var n = 0
      s.foreach {
        case "view" => armed = true
        case "click" => if (armed) { n += 1; armed = false }
        case _ => ()
      }
      n
    }
    val rnd = new scala.util.Random(42)
    val types = Seq("view", "click", "other")
    val rows = for (u <- 0L until 50L; i <- 0 until 40) yield
      (u, i.toLong, types(rnd.nextInt(3)))
    val expected = rows.groupBy(_._1).map { case (u, rs) =>
      u -> greedy(rs.sortBy(_._2).map(_._3))
    }.filter(_._2 > 0)
    val df = rows.toDF("u", "seq", "t")
      .filter(col("t").isin("view", "click"))
    val w = Window.partitionBy(col("u")).orderBy(col("seq"))
    val got = df.withColumn("prev", lag(col("t"), 1).over(w))
      .filter(col("t") === "click" && col("prev") === "view")
      .groupBy(col("u")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == expected)
  }

  test("funnel mode trio: the gates separate on hand-built chains") {
    import graft.operators.Funnel
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // u1: view → purchase(interloper) → click → purchase:
    //   plain reaches 3; strict breaks at gap1 (other-type purchase);
    //   dedup is untouched (no view repeat) and reaches 3.
    // u2: view → view(repeat) → click → purchase:
    //   plain reaches 3; dedup breaks at gap1 (view repeat);
    //   strict ALSO breaks (a view repeat is an other-type-than-click
    //   interloper under the strict gate).
    // u3: clean view → click → purchase: all three reach 3.
    // u4: view → click → view(repeat of the ALREADY-MATCHED step 1)
    //   → purchase: plain reaches 3; strict breaks at gap2 (the view
    //   is an other-type-than-purchase interloper); dedup ALSO breaks
    //   at gap2 — CH strict_dedup interrupts on a repeat of ANY
    //   matched condition, not just the one that opened the gap
    //   (ADVICE r14: the old gate only watched 'click' there).
    val rows = Seq(
      (1L, ts(0), "view"), (1L, ts(1), "purchase"), (1L, ts(2), "click"),
      (1L, ts(3), "purchase"),
      (2L, ts(0), "view"), (2L, ts(1), "view"), (2L, ts(2), "click"),
      (2L, ts(3), "purchase"),
      (3L, ts(0), "view"), (3L, ts(1), "click"), (3L, ts(2), "purchase"),
      (4L, ts(0), "view"), (4L, ts(1), "click"), (4L, ts(2), "view"),
      (4L, ts(3), "purchase"))
    val ev = rows.toDF("wallet", "ts", "event_type")
    val steps = Seq("view", "click", "purchase")
    def levels(df: org.apache.spark.sql.DataFrame, c: String) =
      df.collect().map(r => r.getAs[Long]("user") -> r.getAs[Int](c)).toMap
    val plain = Funnel.windowFunnel(ev, "wallet", "ts", "event_type", steps, 24)
    assert(plain.collect().map(r =>
      r.getAs[Long]("user") -> r.getAs[Int]("level")).toMap ==
      Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3))
    val strict = levels(Funnel.windowFunnelStrict(
      ev, "wallet", "ts", "event_type", steps, 24), "level_strict")
    assert(strict == Map(1L -> 1, 2L -> 1, 3L -> 3, 4L -> 2), s"strict=$strict")
    val dedup = levels(Funnel.windowFunnelDedup(
      ev, "wallet", "ts", "event_type", steps, 24), "level_dedup")
    assert(dedup == Map(1L -> 3, 2L -> 1, 3L -> 3, 4L -> 2), s"dedup=$dedup")
  }

  test("Mann-Whitney average ranks: tie-heavy hand case") {
    // values (group): 1(a) 1(b) 2(a) 2(a) 2(b) 3(b) — avg ranks
    // 1.5, 1.5, 4, 4, 4, 6; R_a = 1.5+4+4 = 9.5 → U_a = 9.5 - 6 = 3.5
    val df = Seq((1.0, 1), (1.0, 0), (2.0, 1), (2.0, 1), (2.0, 0), (3.0, 0))
      .toDF("x", "buy").withColumn("k", lit(1L))
    val byX = Window.partitionBy(col("k")).orderBy(col("x"))
    val peers = byX.rangeBetween(Window.currentRow, Window.currentRow)
    val r = df.withColumn("avg_rank",
        rank().over(byX) + (count(lit(1)).over(peers) - 1) / 2.0)
      .groupBy(col("k"))
      .agg(sum(col("avg_rank") * col("buy")).as("r1"),
        sum(col("buy")).cast("double").as("n1"))
      .select((col("r1") - col("n1") * (col("n1") + 1) / 2.0).as("u1"))
      .head().getDouble(0)
    assert(r == 3.5)
  }
}
