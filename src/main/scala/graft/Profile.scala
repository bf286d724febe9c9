package graft

import org.apache.spark.sql.SparkSession

/** Steady-state query profiler for plan iteration (not part of the
  * library surface): warms every session MV exactly like Bench's
  * mv_warmup phase, then times each named query three times in one
  * JVM so numbers are JIT-comparable and MV-warm — the same
  * conditions as the full bench's steady pass, without paying for a
  * 141-query sweep per iteration.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   SPARK_GRAFT_PROFILE=q_a,q_b sbt "runMain graft.Profile"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROFILE", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profile] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    for ((n, fn) <- SparkEntry.sessionViews.toSeq.sortBy(_._1))
      time(s"warm $n") {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    for (n <- names; _ <- 1 to 3)
      time(n) {
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}
