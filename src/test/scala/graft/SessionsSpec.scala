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

  test("property: session count = gaps>threshold + 1; batch equals streaming fold") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.{Test => SCTest}
    val gapMin = 30
    val gen = for {
      n <- Gen.choose(1, 40)
      offs <- Gen.listOfN(n, Gen.choose(0L, 36000L))  // seconds over 10h
    } yield offs.distinct.sorted
    val prop = Prop.forAll(gen) { offs =>
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val ev = offs.zipWithIndex
        .map { case (o, i) => (7L, new Timestamp(base + o * 1000), 1.0) }
        .toDF("user_id", "ts", "value")
      val sessions = Sessions.sessionStats(ev, "user_id", "ts", "value", gapMin)
        .collect()
      // oracle: one session per gap > threshold, plus the first
      val expected = 1 + offs.sliding(2).count {
        case Seq(a, b) => (b - a) > gapMin * 60L
        case _ => false
      }
      val spanOk = sessions.forall { r =>
        // within a session no event pair exceeds the total span, and a
        // single-event session has span 0
        r.getLong(5) >= 0 && (r.getLong(2) > 1 || r.getLong(5) == 0L)
      }
      sessions.length == expected && spanOk &&
        sessions.map(_.getLong(2)).sum == offs.length
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
