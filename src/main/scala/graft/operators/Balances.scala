package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Position/balance tracking from signed transfers.
  *
  * Reference: `user_balances` SummingMergeTree + its MV
  * (001_create_tables.sql:382-398): every transfer credits `to` and
  * debits `from`; balance = sum of signed values.
  *
  * Spark-first: one scan, explode into the two signed postings, then a
  * partial-aggregable groupBy — ClickHouse's SummingMergeTree is
  * exactly Spark's map-side-combine sum.
  */
object Balances {

  /** (wallet, token_id, balance) for every wallet that ever touched the
    * token. `transfers` needs (from, to, token_id, value). */
  def balances(transfers: DataFrame): DataFrame =
    transfers
      .select(col("token_id"),
        explode(array(
          struct(col("to").as("wallet"), col("value").cast("decimal(18,4)").as("delta")),
          struct(col("from").as("wallet"), (-col("value")).cast("decimal(18,4)").as("delta"))
        )).as("p"))
      .groupBy(col("p.wallet").as("wallet"), col("token_id"))
      .agg(sum(col("p.delta")).cast("double").as("balance"))

  /** Holders of a token: positive balances, largest first
    * (reference: /market/stats holder query, api.ts:1262-1281). */
  def topHoldersPerToken(balances: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("token_id"))
      .orderBy(col("balance").desc, col("wallet"))
    balances.filter(col("balance") > 0)
      .withColumn("holder_rank", row_number().over(w))
      .filter(col("holder_rank") <= k)
  }
}
