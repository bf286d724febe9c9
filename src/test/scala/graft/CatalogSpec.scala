package graft

import graft.model.GraftCatalog
import graft.operators.Leaderboard
import graft.model.Views

class CatalogSpec extends SparkSpec {

  test("reference-style SQL over registered views matches operators") {
    GraftCatalog.register(spark, sf)
    val viaSql = spark.sql(
      """SELECT wallet, COUNT(*) AS trades,
        |  CAST(SUM(usd) AS DOUBLE) AS volume_usd,
        |  CAST(SUM(CASE WHEN side = 'sell' THEN usd ELSE -usd END) AS DOUBLE) AS net_cashflow_usd,
        |  COUNT(DISTINCT token_id) AS markets
        |FROM wallet_trades WHERE wallet NOT IN (1000001, 1000002)
        |GROUP BY wallet HAVING COUNT(*) >= 5
        |ORDER BY net_cashflow_usd DESC, wallet LIMIT 50""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val viaOp = Leaderboard.leaderboard(
        Leaderboard.walletTrades(Views.trades(spark, sf)), 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(viaSql.toSeq == viaOp.toSeq)
  }

  test("graft SQL functions compose with the views") {
    GraftCatalog.register(spark, sf)
    val n = spark.sql(
      """SELECT market, graft_dot(array(1.0d, 1.0d), array(CAST(token_id AS DOUBLE), 1.0d)) AS s
        |FROM token_metadata LIMIT 5""".stripMargin).count()
    assert(n == 5)
  }
}
