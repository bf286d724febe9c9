package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Round-close prose is stamped FROM the committed artifact (VERDICT
  * r15 #6): SURVEY.md's round-log headline numbers repeatedly drifted
  * from the committed bench JSON (r14 claimed mv_warmup 123.7 after it
  * measured 80.5; r15's log item 5 carried a stale mid-round oracle
  * count). CountsSpec killed the query-count drift by deriving the
  * number; this spec does the same for the bench headline. SURVEY.md
  * must carry a canonical line
  *
  *   `BENCH (machine-checked by BenchStampSpec): steady_total=<s>s
  *    sum_x=<r> med_sub=<r> mv_warmup=<s>s n=<q>`
  *
  * and this spec recomputes each number from BENCH_LOCAL.json (the
  * full-sweep per-query artifact, committed next to the build) +
  * BASELINE_DUCKDB.json and fails when the prose and the artifact
  * diverge beyond host-noise tolerance. The tolerances are wide enough
  * that a quiet-host re-bench doesn't flap the suite, and far tighter
  * than every drift this class has actually produced (stale counts,
  * 1.5× stale warmup claims).
  *
  * Definitions (matching Bench's renderer):
  *  - steady_total / n: sum & count of the min-of-passes per-query map;
  *  - sum_x: Σ ours / Σ DuckDB over queries present in both files;
  *  - med_sub: lower-middle median of per-query ratios where the
  *    DuckDB oracle itself needs ≥ 0.5 s (Bench.SubstantiveBar);
  *  - mv_warmup: sum of the labeled session-MV build lines.
  */
class BenchStampSpec extends AnyFunSuite {

  private def readJson(path: String) = {
    val p = java.nio.file.Paths.get(path)
    assume(java.nio.file.Files.exists(p), s"$path not present")
    new ObjectMapper().readTree(java.nio.file.Files.readString(p))
  }

  private def numMap(node: com.fasterxml.jackson.databind.JsonNode)
      : Map[String, Double] =
    node.properties().asScala
      .map(e => e.getKey -> e.getValue.asDouble())
      .filter(_._2 > 0).toMap

  test("SURVEY.md BENCH stamp matches BENCH_LOCAL.json (VERDICT r15 #6)") {
    val bench = readJson("BENCH_LOCAL.json")
    val base = readJson("BASELINE_DUCKDB.json")
    assume(bench.get("sf").asText() == base.get("sf").asText(),
      "bench and baseline measured at different sf")

    val q = numMap(bench.get("queries"))
    val mv = numMap(bench.get("mv_warmup"))
    val duck = numMap(base.get("times"))
    val steadyTotal = q.values.sum
    val mvTotal = mv.values.sum
    // toSeq FIRST: flatMap on the Map would re-key by the seconds value
    // and silently collapse queries with equal steady times, skewing
    // sum_x and med_sub (caught restamping r16: 0.98 with the collapse
    // vs 0.80 without)
    val inter = q.toSeq.flatMap { case (n, s) => duck.get(n).map(d => (s, d)) }
    val sumX = inter.map(_._1).sum / inter.map(_._2).sum
    val sub = inter.collect { case (s, d) if d >= Bench.SubstantiveBar => s / d }
      .toSeq.sorted
    val medSub = sub((sub.size - 1) / 2)

    val survey = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SURVEY.md"))
    val re = ("""BENCH \(machine-checked by BenchStampSpec\): """ +
      """steady_total=([0-9.]+)s sum_x=([0-9.]+) med_sub=([0-9.]+) """ +
      """mv_warmup=([0-9.]+)s n=(\d+)""").r
    val ms = re.findAllMatchIn(survey).toSeq
    assert(ms.nonEmpty,
      "SURVEY.md must carry the canonical BENCH stamp line (artifact " +
        f"at HEAD: steady_total=$steadyTotal%.1fs sum_x=$sumX%.2f " +
        f"med_sub=$medSub%.2f mv_warmup=$mvTotal%.1fs n=${q.size})")
    val m = ms.last
    def relOk(claimed: Double, actual: Double, tol: Double) =
      math.abs(claimed - actual) <= tol * actual
    val checks = Seq(
      ("steady_total", m.group(1).toDouble, steadyTotal,
        relOk(m.group(1).toDouble, steadyTotal, 0.15)),
      ("sum_x", m.group(2).toDouble, sumX,
        math.abs(m.group(2).toDouble - sumX) <= 0.15),
      ("med_sub", m.group(3).toDouble, medSub,
        math.abs(m.group(3).toDouble - medSub) <= 0.10),
      ("mv_warmup", m.group(4).toDouble, mvTotal,
        relOk(m.group(4).toDouble, mvTotal, 0.20)),
      ("n", m.group(5).toDouble, q.size.toDouble,
        m.group(5).toInt == q.size))
    val bad = checks.collect { case (name, c, a, false) =>
      f"$name: stamped $c%.2f, artifact says $a%.2f" }
    assert(bad.isEmpty,
      "SURVEY's BENCH stamp has drifted from BENCH_LOCAL.json — " +
        "restamp it from the artifact: " + bad.mkString("; "))
  }
}
