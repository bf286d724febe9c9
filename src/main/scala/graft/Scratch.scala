package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.Dedup

/** Ad-hoc profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, d)
    docs.persist(); docs.count()

    time("ngrams-only") {
      docs.select(Dedup.wordNgrams(col("text"), 3).as("g"))
        .select(sum(size(col("g")))).head(); 1L
    }
    val withSets = docs.select(col("source").as("bkt"), col("doc_id").as("id"),
        Dedup.wordNgrams(col("text"), 3).as("ngrams"))
      .withColumn("n_grams", size(col("ngrams")))
    val posts = withSets.select(col("bkt"), col("id"), col("n_grams"),
      explode(col("ngrams")).as("gram"))
    time("postings") { posts.count() }
    posts.persist(); posts.count()
    val a = posts.select(col("bkt"), col("gram"), col("id").as("id_a"), col("n_grams").as("n_a"))
    val b = posts.select(col("bkt"), col("gram"), col("id").as("id_b"), col("n_grams").as("n_b"))
    val joined = a.join(b, Seq("bkt", "gram")).filter(col("id_a") < col("id_b"))
    time("join+count") { joined.count() }
    val pairs = joined.groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
    time("pairs") { pairs.count() }
    time("full-op") { Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 3, 0.3).count() }
    spark.stop()
  }
}
