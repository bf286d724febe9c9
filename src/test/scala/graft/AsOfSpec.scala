package graft

import graft.operators.AsOf
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest quote at or before the probe") {
    val quotes = Seq(
      (1L, t("2024-01-01 00:00:00"), 10.0),
      (1L, t("2024-01-03 00:00:00"), 12.0),
      (2L, t("2024-01-02 00:00:00"), 99.0)
    ).toDF("key", "ts", "price")
    val probes = Seq(
      (1L, t("2024-01-02 00:00:00")),  // between quotes → 10.0
      (1L, t("2024-01-03 00:00:00")),  // equal ts → 12.0 (inclusive)
      (1L, t("2024-01-09 00:00:00")),  // after last → 12.0
      (2L, t("2024-01-01 00:00:00"))   // before any quote → null
    ).toDF("key", "pts")
    val got = AsOf.joinAsOf(quotes, probes, "key", "ts", "price", "pts")
      .collect()
      .map(r => (r.getLong(0), r.get(1).toString) ->
        Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap
    val by = got.map { case ((k, ts), v) => (k, ts.take(10)) -> v }
    assert(by((1L, "2024-01-02")) == Some(10.0))
    assert(by((1L, "2024-01-03")) == Some(12.0))
    assert(by((1L, "2024-01-09")) == Some(12.0))
    assert(by((2L, "2024-01-01")).isEmpty)
  }

  test("tolerance as-of nulls out quotes staler than the bound") {
    val quotes = Seq(
      (1L, t("2024-01-01 00:00:00"), 10.0),
      (1L, t("2024-01-03 00:00:00"), 12.0),
      (2L, t("2024-01-02 00:00:00"), 99.0)
    ).toDF("key", "ts", "price")
    val probes = Seq(
      (1L, t("2024-01-02 00:00:00")),  // 1 day stale → 10.0
      (1L, t("2024-01-03 00:00:00")),  // exact hit, age 0 → 12.0
      (1L, t("2024-01-05 00:00:00")),  // exactly at the 2-day bound → 12.0
      (1L, t("2024-01-09 00:00:00")),  // 6 days stale → null
      (2L, t("2024-01-01 00:00:00"))   // no quote yet → null
    ).toDF("key", "pts")
    val got = AsOf.joinAsOfTolerance(quotes, probes, "key", "ts", "price",
        "pts", toleranceSec = 2L * 86400L)
      .collect()
      .map(r => (r.getLong(0), r.get(1).toString.take(10)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got((1L, "2024-01-02")) == Some(10.0))
    assert(got((1L, "2024-01-03")) == Some(12.0))
    assert(got((1L, "2024-01-05")) == Some(12.0))
    assert(got((1L, "2024-01-09")).isEmpty)
    assert(got((2L, "2024-01-01")).isEmpty)
  }
}
