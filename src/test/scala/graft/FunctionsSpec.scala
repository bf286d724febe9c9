package graft

import graft.functions.GraftFunctions
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** SQL registration: the native expressions callable from spark.sql
  * produce the same values as the Column API. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions match the Column API") {
    GraftFunctions.register(spark)
    Seq((1L, "the quick brown fox jumps the fox")).toDF("id", "text")
      .createOrReplaceTempView("fx_docs")
    val viaSql = spark.sql(
      """SELECT graft_simhash64(transform(graft_word_ngrams(text, 2), s -> xxhash64(s))) AS sh,
        |       size(graft_word_ngrams(text, 2)) AS n,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |       size(graft_minhash_sig(array(1L, 2L, 3L), 8)) AS mh,
        |       size(graft_lsh_postings(array(0.6d, 0.8d), 4, 3)) AS lp
        |FROM fx_docs""".stripMargin).head()
    val viaCol = Seq((1L, "the quick brown fox jumps the fox")).toDF("id", "text")
      .select(Dedup.simhash64(Dedup.wordNgrams($"text", 2)).as("sh"),
        size(Dedup.wordNgrams($"text", 2)).as("n")).head()
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getInt(1) == viaCol.getInt(1))
    assert(viaSql.getDouble(2) == 11.0)
    assert(viaSql.getInt(3) == 8)
    assert(viaSql.getInt(4) == 3)
  }
}
