package graft

import graft.sources.{LogDecode, MetadataSync}
import graft.sources.MetadataSync.{Page, PageFetcher}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** The replayable paged metadata-sync connector (sync-metadata.ts):
  * retry/backoff schedule, resume-cursor semantics, corrupt-record
  * quarantine, and the crash→resume idempotency contract — including
  * end-to-end through the conditions-state merge the decoded
  * lifecycle path uses. */
class MetadataSyncSpec extends SparkSpec {

  private def rec(id: Long, q: String, cat: String, active: Boolean,
                  at: Long): String =
    s"""{"market_id":$id,"question":"$q","category":"$cat",""" +
      s""""active":$active,"updated_at":$at}"""

  // three pages of four records, with market 2 re-appearing updated on
  // page 2 (the upsert must keep the later version)
  private val pageBodies = Seq(
    Seq(rec(1, "q1", "sports", true, 100), rec(2, "q2", "politics", true, 100)),
    Seq(rec(3, "q3", "crypto", true, 110), rec(2, "q2b", "politics", false, 120)),
    Seq(rec(4, "q4", "sports", true, 130))
  ).map(_.mkString("\n"))

  private def cannedFetcher(failAt: Map[Long, Int] = Map.empty): PageFetcher =
    new PageFetcher {
      private val remaining = mutable.Map(failAt.toSeq: _*)
      def fetch(cursor: Long): Either[String, Page] = {
        val left = remaining.getOrElse(cursor, 0)
        if (left > 0) { remaining(cursor) = left - 1; Left(s"503@$cursor") }
        else if (cursor >= pageBodies.size) Left(s"404@$cursor")
        else Right(Page(pageBodies(cursor.toInt),
          if (cursor.toInt == pageBodies.size - 1) None else Some(cursor + 1)))
      }
    }

  test("transient failures retry on the exponential backoff schedule") {
    val slept = mutable.Buffer[Long]()
    val r = MetadataSync.syncPages(cannedFetcher(Map(1L -> 2)),
      baseBackoffMs = 250, sleep = slept += _)
    assert(r.failure.isEmpty && r.completed)
    assert(r.cursor == 2L, "cursor = last fetched page, never synthesized")
    assert(r.pages == pageBodies)
    assert(r.backoffsMs == Seq(250L, 500L), "base·2^attempt schedule")
    assert(slept == Seq(250L, 500L), "sleep rides the injected clock")
    assert(r.attempts == pageBodies.size + 2)
  }

  test("retry exhaustion stops at the failed page with a resume cursor") {
    val r = MetadataSync.syncPages(cannedFetcher(Map(2L -> 99)),
      maxRetries = 3)
    assert(r.failure.contains("503@2") && !r.completed)
    assert(r.cursor == 2L, "resume cursor = first unfetched page")
    assert(r.pages == pageBodies.take(2))
    assert(r.backoffsMs == Seq(250L, 500L, 1000L))
  }

  test("corrupt records quarantine instead of killing or vanishing") {
    val pages = Seq(pageBodies.head + "\nnot json at all\n" +
      """{"question":"no id"}""")
    val (good, bad) = MetadataSync.parsePages(spark, pages)
    assert(good.count() == 2)
    assert(bad.count() == 2, "both bad lines land in quarantine")
  }

  test("crash then resume reaches the same table state as one clean sync") {
    // clean run
    val clean = MetadataSync.syncPages(cannedFetcher())
    val (cleanGood, _) = MetadataSync.parsePages(spark, clean.pages)
    val empty = cleanGood.filter(lit(false))
    val cleanState = MetadataSync.upsert(empty, cleanGood)

    // crashed run: page 2 dies, state is upserted from the fetched
    // prefix, then a resumed run continues from the checkpoint cursor
    val crashed = MetadataSync.syncPages(cannedFetcher(Map(2L -> 99)))
    assert(crashed.failure.isDefined && !crashed.completed,
      "a crashed sync is what makes `cursor` a resume point")
    val (part1, _) = MetadataSync.parsePages(spark, crashed.pages)
    val mid = MetadataSync.upsert(empty, part1)
    val resumed = MetadataSync.syncPages(cannedFetcher(), from = crashed.cursor)
    val (part2, _) = MetadataSync.parsePages(spark, resumed.pages)
    val finalState = MetadataSync.upsert(mid, part2)

    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(finalState) == rows(cleanState))
    // the upsert kept market 2's later version
    assert(finalState.filter(col("market_id") === 2 &&
      col("question") === "q2b" && !col("active")).count() == 1)
    // idempotency: re-applying an already-applied page is a no-op
    assert(rows(MetadataSync.upsert(finalState, part2)) == rows(cleanState))
  }

  test("synced pages drive the conditions-state merge end to end") {
    // pages carrying raw lifecycle LOGS (a prep page, then a resolve
    // page): fetch with a transient failure, decode with the REAL
    // lifecycle decoder, merge with the REAL conditions-state upsert —
    // crash→resume must land on the same conditions table
    import spark.implicits._
    def logLine(idx: Long, topic: String, cond: Long, data: String): String =
      s"""{"log_index":$idx,"addr":"${LogDecode.ConditionalTokensAddr}",""" +
        s""""topic0":"$topic","topic1":"${word(cond)}",""" +
        s""""topic2":"${word(900001L)}","topic3":"${word(cond + 7000000L)}",""" +
        s""""data":"$data"}"""
    def word(v: Long): String = f"$v%064x"
    val prepData = word(2L)
    val resolveData = word(2L) + word(64L) + word(2L) + word(0L) + word(1L)
    val logPages = Seq(
      Seq(logLine(1, LogDecode.ConditionPreparationTopic, 77L, prepData),
        logLine(2, LogDecode.ConditionPreparationTopic, 78L, prepData))
        .mkString("\n"),
      Seq(logLine(3, LogDecode.ConditionResolutionTopic, 77L, resolveData))
        .mkString("\n"))
    val fetcher = new PageFetcher {
      private var failures = 1
      def fetch(cursor: Long): Either[String, Page] =
        if (cursor == 1 && failures > 0) { failures -= 1; Left("503") }
        else Right(Page(logPages(cursor.toInt),
          if (cursor.toInt == logPages.size - 1) None else Some(cursor + 1)))
    }
    val r = MetadataSync.syncPages(fetcher)
    assert(r.failure.isEmpty && r.completed && r.backoffsMs.size == 1)
    def decode(pages: Seq[String]): DataFrame = {
      val logs = spark.read.json(
        pages.flatMap(_.split("\n")).toSeq.toDS())
      LogDecode.decodeConditionLifecycle(logs)
    }
    val state = LogDecode.conditionsState(decode(r.pages))
      .orderBy(col("condition_hex")).collect()
    assert(state.length == 2)
    val resolved = state.filter(_.getAs[Boolean]("is_resolved"))
    assert(resolved.length == 1)
    assert(resolved.head.getAs[Long]("payout_denominator") == 1L)
  }
}
