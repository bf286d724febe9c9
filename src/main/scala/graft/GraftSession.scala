package graft

import org.apache.spark.sql.SparkSession

/** Tuned session builder for library users: AQE + skew-join handling
  * on, UTC, sane local shuffle parallelism, graft SQL functions
  * registered. On a real cluster, spark.sql.shuffle.partitions should
  * be ~2-3× total cores instead. */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")

  def get(master: String = "local[*]"): SparkSession = {
    val s = builder(master).getOrCreate()
    graft.functions.GraftFunctions.register(s)  // also on pre-existing sessions
    s
  }
}
