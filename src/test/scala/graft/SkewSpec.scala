package graft

import graft.model.Tables
import graft.operators.{Leaderboard, Skew}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted distinct count equals plain countDistinct") {
    val wt = Leaderboard.walletTrades(Tables.trades(spark, sf))
    val plain = wt.groupBy(col("wallet").as("k"))
      .agg(countDistinct(col("token_id")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinctCount(wt, col("wallet"), col("token_id"),
        salts = 7, out = "m")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val t = Tables.trades(spark, sf)
    val markets = Tables.part(spark, sf)
      .select(col("p_partkey").cast("long").as("token_id"),
        col("p_brand").as("market"))
    val plain = t.join(markets, Seq("token_id"))
      .groupBy("market").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(t, markets, "token_id",
        discriminator = col("trade_id"), salts = 5)
      .groupBy("market").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
