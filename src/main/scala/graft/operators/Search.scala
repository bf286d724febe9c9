package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword search over the document corpus: TF-IDF / BM25 ranking.
  *
  * The text-side sibling of the embedding ANN surface — a training
  * pipeline uses it for targeted corpus slicing ("all documents about
  * X") and for lexical retrieval baselines next to the vector path.
  *
  * Scale shape: one explode to (doc_id, term) postings, one partial
  * aggregate to per-(doc, term) term frequencies FILTERED to the query
  * terms before any shuffle (the `isin` predicate evaluates map-side,
  * so only matching postings ever move), document lengths and document
  * frequencies as two small aggregates, both broadcast. Nothing is
  * ever doc × doc, and the heavy side shuffles once on doc_id.
  */
object Search {

  /** BM25 scores for `terms` over the corpus; standard k1/b defaults.
    *
    * idf = ln(1 + (N − df + ½)/(df + ½)) — the Robertson-Sparck-Jones
    * form with the +1 floor (non-negative for df near N). Scores are
    * also emitted floored to 1e-4 (`score_4`) so an external engine
    * can replay them bit-stably despite ln() ulp differences.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 50): DataFrame = {
    val tokens = docs.select(col(idCol).as("doc_id"),
      explode(split(trim(col(textCol)), " +")).as("term"))
    // per-document length (all terms, not just query terms)
    val docLen = tokens.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // corpus size + average length: a 1-row aggregate, broadcast.
    // avg_dl = exact integer sum, ONE division — not avg(), whose
    // intermediate accumulation an external engine may not replay
    val corpus = docLen
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double")).as("avg_dl"))
    val queryTokens = tokens.filter(col("term").isin(terms: _*))
    // document frequency per query term (tiny: ≤ |terms| rows)
    val dfreq = queryTokens.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val tf = queryTokens.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // per-term weights are floored to 1e-4 BEFORE the per-doc sum:
    // integer sums are exact and order-independent, so the score (and
    // the top-k cutoff it orders) is reproducible bit-for-bit across
    // engines — a raw double sum would depend on aggregation order
    val scored = tf
      .join(broadcast(dfreq), Seq("term"))
      .join(docLen, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avg_dl"))))
      .withColumn("w4", floor(col("w") * 1e4).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w4")).as("score_4"), count(lit(1)).as("matched_terms"))
    scored
      .orderBy(col("score_4").desc, col("doc_id"))
      .limit(topK)
      .select(col("doc_id"), col("matched_terms"), col("score_4"))
  }
}
