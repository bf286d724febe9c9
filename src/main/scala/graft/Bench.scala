package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: full computation, no write cost, no count() shortcuts.
    // Two runs per query, min taken: run 1 pays codegen compilation and
    // shared-view materialization (the reference's MVs are likewise
    // built at ingest, not per query); run 2 is steady-state. min also
    // filters transient JIT/GC stalls on the shared host.
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // a failing query must not pass as a fast one: its slot reports the
    // -1 sentinel and its name lands in "failed"
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run (targeted re-bench)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // the two timed runs are SEPARATE full passes, not back-to-back:
    // a transient host stall (shared box, 20-30 s GC/JIT/noisy
    // neighbour) then lands on at most one of a query's two samples,
    // so the min still reflects steady state
    val pass1 = selected.map { case (name, fn) => once(name, fn) }
    val pass2 = selected.map { case (name, fn) => once(name, fn) }
    val runs = selected.zip(pass1.zip(pass2)).map {
      case ((name, _), ((t1, ok1), (t2, ok2))) =>
        (name, math.min(t1, t2), ok1 && ok2)
    }
    val qs = runs.map { case (k, v, ok) =>
      s"\"" + k + "\":" + (if (ok) v else -1.0)
    }.mkString("{", ",", "}")
    val failed = runs.collect { case (k, _, false) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = runs.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
