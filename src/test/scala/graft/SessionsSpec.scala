package graft

import graft.operators.Sessions
import java.sql.Timestamp

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  test("gap-based sessionization splits on >30min gaps") {
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 1.0),
      (1L, t("2024-01-01 10:10:00"), 2.0),   // same session
      (1L, t("2024-01-01 11:00:00"), 3.0),   // 50min gap → new session
      (2L, t("2024-01-01 10:05:00"), 4.0)
    ).toDF("user_id", "ts", "value")
    val s = Sessions.sessionStats(ev, "user_id", "ts", "value", 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(5))).toMap
    assert(s((1L, 1L)) == (2L, 600L))   // two events, 10 min span
    assert(s((1L, 2L)) == (1L, 0L))
    assert(s((2L, 1L)) == (1L, 0L))
    assert(s.size == 3)
  }
}
