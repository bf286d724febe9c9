package graft

import graft.model.Tables
import graft.operators.Downsample
import org.apache.spark.sql.functions._

class DownsampleSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Double, Double)]) =
    rows.toDF("k", "x", "y")

  test("hand-computed LTTB pick: max-area points win their buckets") {
    // n=6, threshold=4 → 2 interior buckets {1,2} and {3,4}.
    // Bucket 1 vs avg of bucket 2 (3.5, 25): area(1,100)=325 beats
    //   area(2,0)=50 → pick (1,100).
    // Bucket 2 anchored at (1,100) vs last point (5,0):
    //   area(3,0)=200 beats area(4,50)=100 → pick (3,0).
    val s = Seq((0.0, 0.0), (1.0, 100.0), (2.0, 0.0),
      (3.0, 0.0), (4.0, 50.0), (5.0, 0.0))
    val got = Downsample.lttb(df(s.map { case (x, y) => (1L, x, y) }),
        "k", "x", "y", 4)
      .collect().sortBy(_.bucket)
      .map(p => (p.bucket, p.x, p.y)).toSeq
    assert(got == Seq((0, 0.0, 0.0), (1, 1.0, 100.0),
      (2, 3.0, 0.0), (3, 5.0, 0.0)))
  }

  test("short series pass through unchanged; endpoints always kept") {
    val s = (0 until 7).map(i => (2L, i.toDouble, (i * i).toDouble))
    val got = Downsample.lttb(df(s), "k", "x", "y", 10)
      .collect().sortBy(_.bucket).map(p => (p.x, p.y)).toSeq
    assert(got == s.map { case (_, x, y) => (x, y) })
  }

  test("real series: one point per bucket, subset of input, deterministic across partitionings") {
    val t = Tables.trades(spark, sf)
      .select(col("token_id"), datediff(col("ts"), lit("1995-01-01"))
        .cast("double").as("day"), col("price"))
    def run(parts: Int) =
      Downsample.lttb(t.repartition(parts), "token_id", "day", "price", 20)
        .collect().map(p => (p.key, p.bucket, p.x, p.y)).toSet
    val a = run(3)
    assert(a == run(11), "pick must not depend on input partitioning")
    val byKey = a.groupBy(_._1)
    val n = t.groupBy(col("token_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byKey.foreach { case (k, picks) =>
      val exp = math.min(n(k), 20L).toInt
      assert(picks.size == exp, s"key $k: ${picks.size} != $exp")
      assert(picks.map(_._2) == (0 until exp).map(i => i).toSet)
    }
    // every pick is a real input point
    val input = t.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(a.forall { case (k, _, x, y) => input.contains((k, x, y)) })
  }
}
