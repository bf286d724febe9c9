package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: random-
  * hyperplane LSH — vectors are bucketed by sign patterns, top-k runs
  * per bucket, so the join is bucketed instead of a full cross
  * product. All vector math is `zip_with`/`aggregate` column
  * expressions in double precision (no UDFs).
  */
object Similarity {

  /** Σ aᵢ·bᵢ over two equal-length double arrays (native one-pass
    * expression; left-to-right summation order). */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** (id, unit) with vectors cast to double and scaled to unit norm —
    * cosine then reduces to a plain dot product. */
  def normalized(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("n", norm(col("v")))
      .filter(col("n") > 0)
      .select(col("id"), transform(col("v"), x => x / col("n")).as("unit"))

  /** Exact brute-force top-k: for each query vector, the k nearest
    * corpus vectors by cosine. The (small) query set is broadcast —
    * the corpus streams once, no shuffle until the per-query top-k. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = corpus.select(col("id").as("corpus_id"), col("unit").as("cu"))
      .crossJoin(broadcast(
        queries.select(col("id").as("query_id"), col("unit").as("qu"))))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", round(dot(col("cu"), col("qu")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  /** Approximate top-k: queries probe their bucket in each of
    * `tables` hash tables (multi-table random-hyperplane LSH — a pair
    * is a candidate if it collides in ANY table, which lifts recall
    * without widening buckets); candidates are deduped, then ranked.
    * Postings are one native expression pass per vector.
    * Recall vs [[bruteForceTopK]] is measured in SimilaritySpec. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, dim: Int, planes: Int,
              k: Int, tables: Int = 4): DataFrame = {
    val post = graft.functions.LshPostings.lsh_postings(col("unit"), planes, tables)
    val cb = corpus.select(col("id").as("corpus_id"), col("unit").as("cu"),
      explode(post).as("post"))
    val qb = queries.select(col("id").as("query_id"), col("unit").as("qu"),
      explode(post).as("post"))
    val joined = cb.join(broadcast(qb), Seq("post"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        round(dot(col("cu"), col("qu")), 6).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }
}
