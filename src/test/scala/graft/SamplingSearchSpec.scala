package graft

import graft.operators.{Funnel, Sampling, Search, TextAnalysis}
import org.apache.spark.sql.functions._

/** Deterministic sampling, BM25 search, word frequency, sequenceMatch. */
class SamplingSearchSpec extends SparkSpec {
  import spark.implicits._

  test("hash sample is deterministic and nested by threshold") {
    val df = (1L to 2000L).toDF("k")
    val small = Sampling.hashSample(df, col("k"), "0800").as[Long].collect().toSet
    val large = Sampling.hashSample(df, col("k"), "1000").as[Long].collect().toSet
    val again = Sampling.hashSample(df, col("k"), "1000").as[Long].collect().toSet
    assert(large == again)                      // reproducible
    assert(small.subsetOf(large))               // SAMPLE 1/32 ⊂ SAMPLE 1/16
    // ~6.25% of 2000 = 125; allow generous hash variance
    assert(large.size > 60 && large.size < 220, large.size.toString)
  }

  test("stratified sample keeps ceil(frac·n) rows of every stratum") {
    val df = (1L to 300L).map(i => (i, s"s${i % 3}")).toDF("k", "stratum")
    val out = Sampling.stratifiedSample(df, col("stratum"), col("k"), 0.1)
    val per = out.groupBy(col("stratum")).count().as[(String, Long)].collect().toMap
    assert(per.values.toSet == Set(10L), per.toString)   // ceil(0.1·100)
    // deterministic
    val out2 = Sampling.stratifiedSample(df, col("stratum"), col("k"), 0.1)
    assert(out.as[(Long, String)].collect().sorted.sameElements(
      out2.as[(Long, String)].collect().sorted))
  }

  test("bm25 ranks the term-dense document first and counts matched terms") {
    val docs = Seq(
      (1L, "spark spark spark window filler filler filler filler"),
      (2L, "spark filler filler filler filler filler filler filler"),
      (3L, "filler filler filler filler filler filler filler filler"),
      (4L, "window window filler filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val out = Search.bm25(docs, "doc_id", "text", Seq("spark", "window"), topK = 10)
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 4L, 2L))  // doc 3 matches nothing
    val byDoc = out.map(r => r._1 -> r._2).toMap
    assert(byDoc(1L) == 2L && byDoc(2L) == 1L && byDoc(4L) == 1L)
  }

  test("word frequency top-k counts and tie-breaks deterministically") {
    val docs = Seq((1L, "a b b c c c"), (2L, "c d d  b")).toDF("doc_id", "text")
    val out = TextAnalysis.wordFrequency(docs, "text", 3)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("c", 4L), ("b", 3L), ("d", 2L)))
  }

  test("sequenceMatch finds ordered subsequences regardless of spacing") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: view → purchase → view (matched)
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-03-01 10:00:00"), "purchase"),
      (1L, t("2024-06-01 10:00:00"), "view"),
      // user 2: purchase before its only view — no chain
      (2L, t("2024-01-01 09:00:00"), "purchase"),
      (2L, t("2024-01-01 10:00:00"), "view"),
      // user 3: view → purchase but no second view
      (3L, t("2024-01-01 10:00:00"), "view"),
      (3L, t("2024-01-01 11:00:00"), "purchase")
    ).toDF("wallet", "ts", "event_type")
    val out = Funnel.sequenceMatch(ev, "wallet", "ts", "event_type",
        Seq("view", "purchase", "view"))
      .as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("strict-order funnel: other-step interlopers break the chain") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // A: clean chain → strict 3
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 11:00:00"), "click"),
      (1L, t("2024-01-01 12:00:00"), "purchase"),
      // B: a second view between view and click → strict 1 (plain 3)
      (2L, t("2024-01-01 10:00:00"), "view"),
      (2L, t("2024-01-01 10:30:00"), "view"),
      (2L, t("2024-01-01 11:00:00"), "click"),
      (2L, t("2024-01-01 12:00:00"), "purchase"),
      // C: a view between click and purchase → strict 2 (plain 3)
      (3L, t("2024-01-01 10:00:00"), "view"),
      (3L, t("2024-01-01 11:00:00"), "click"),
      (3L, t("2024-01-01 11:30:00"), "view"),
      (3L, t("2024-01-01 12:00:00"), "purchase"),
      // D: only a NON-funnel event interleaves → strict 3
      (4L, t("2024-01-01 10:00:00"), "view"),
      (4L, t("2024-01-01 10:30:00"), "list"),
      (4L, t("2024-01-01 11:00:00"), "click"),
      (4L, t("2024-01-01 12:00:00"), "purchase")
    ).toDF("wallet", "ts", "event_type")
    val steps = Seq("view", "click", "purchase")
    val strict = Funnel.windowFunnelStrict(ev, "wallet", "ts", "event_type",
        steps, 24)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(strict == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 3))
    val plain = Funnel.windowFunnel(ev, "wallet", "ts", "event_type",
        steps, 24)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(plain == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3))
  }
}
