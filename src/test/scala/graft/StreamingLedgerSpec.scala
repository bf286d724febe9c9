package graft

import graft.model.Tables
import graft.operators.{Ledger, Leaderboard}
import graft.operators.Ledger.Fill
import graft.streaming.StreamingLedger
import org.apache.spark.sql.functions._

class StreamingLedgerSpec extends SparkSpec {
  import spark.implicits._

  test("two-micro-batch streaming ledger equals one-shot batch ledger") {
    val wt = Leaderboard.walletTrades(Tables.trades(spark, sf))
    val fills = wt.select(col("wallet").cast("long").as("wallet"), col("ts"),
        col("trade_id").cast("long").as("seq"),
        col("token_id").cast("long").as("tokenId"),
        (col("side") === "buy").as("isBuy"),
        col("qty").cast("double").as("qty"),
        col("usd").cast("double").as("usd"),
        col("fee").cast("double").as("fee"),
        lit("").as("kind"),
        lit(0L).as("tokenId2"),
        lit(Array.empty[Long]).as("legTokens"),
        lit(Array.empty[Double]).as("legQtys"),
        lit(Array.empty[Long]).as("legTokens2"),
        lit(Array.empty[Double]).as("legQtys2"))
      .as[Fill]

    // split by time so batch 2 strictly follows batch 1
    val cut = "1998-01-01"
    val dir = java.nio.file.Files.createTempDirectory("graft-sled").toString
    fills.filter(col("ts") < lit(cut)).write.parquet(s"$dir/b1")

    new java.io.File(s"$dir/in").mkdirs()
    val stream = spark.readStream.schema(fills.schema).parquet(s"$dir/in")
      .as[Fill]
    val q = StreamingLedger.track(spark, stream)
      .writeStream.format("memory").queryName("sled_out")
      .outputMode("append").start()

    def feed(sub: String): Unit = {
      val src = new java.io.File(s"$dir/$sub")
      src.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(s"$dir/in/${sub}_${f.getName}"))
      }
      q.processAllAvailable()
    }
    feed("b1")
    fills.filter(col("ts") >= lit(cut)).write.parquet(s"$dir/b2")
    feed("b2")
    q.stop()

    val streamed = spark.table("sled_out")
    val batch = Ledger.build(spark, wt).toDF()
    assert(streamed.count() == batch.count())
    val s = streamed.agg(
      sum(col("realized_pnl").cast("decimal(18,6)")).cast("double"),
      sum(col("cost_basis").cast("decimal(18,6)")).cast("double")).head()
    val b = batch.agg(
      sum(col("realized_pnl").cast("decimal(18,6)")).cast("double"),
      sum(col("cost_basis").cast("decimal(18,6)")).cast("double")).head()
    assert(math.abs(s.getDouble(0) - b.getDouble(0)) < 1e-6)
    assert(math.abs(s.getDouble(1) - b.getDouble(1)) < 1e-6)
  }
}
