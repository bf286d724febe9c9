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

  /** (steady_total, sum_x, med_sub, mv_warmup, n) computed from a bench
    * artifact + a DuckDB baseline, matching Bench's renderer. */
  private def stampValues(
      bench: com.fasterxml.jackson.databind.JsonNode,
      base: com.fasterxml.jackson.databind.JsonNode)
      : (Double, Double, Double, Double, Int) = {
    val q = numMap(bench.get("queries"))
    val mv = numMap(bench.get("mv_warmup"))
    val duck = numMap(base.get("times"))
    // toSeq FIRST: flatMap on the Map would re-key by the seconds value
    // and silently collapse queries with equal steady times, skewing
    // sum_x and med_sub (caught restamping r16: 0.98 with the collapse
    // vs 0.80 without)
    val inter = q.toSeq.flatMap { case (n, s) => duck.get(n).map(d => (s, d)) }
    val sumX = inter.map(_._1).sum / inter.map(_._2).sum
    val sub = inter.collect { case (s, d) if d >= Bench.SubstantiveBar => s / d }
      .toSeq.sorted
    (q.values.sum, sumX, sub((sub.size - 1) / 2), mv.values.sum, q.size)
  }

  // Band widths. med_sub was ±0.10 through r16 and flipped red on a
  // quiet-vs-loaded host delta of 0.135 (driver's BENCH_r16 re-run vs
  // the committed quiet-host artifact) — the fixture test below pins
  // that observed pair, so the bands can never again be tighter than
  // real cross-host noise.
  private val TolSteady = 0.15
  private val TolSumX = 0.15
  private val TolMedSub = 0.15
  private val TolMv = 0.20

  test("SURVEY.md BENCH stamp matches BENCH_LOCAL.json (VERDICT r15 #6)") {
    val bench = readJson("BENCH_LOCAL.json")
    val base = readJson("BASELINE_DUCKDB.json")
    assume(bench.get("sf").asText() == base.get("sf").asText(),
      "bench and baseline measured at different sf")
    val (steadyTotal, sumX, medSub, mvTotal, nQ) = stampValues(bench, base)

    val survey = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SURVEY.md"))
    val re = ("""BENCH \(machine-checked by BenchStampSpec\): """ +
      """steady_total=([0-9.]+)s sum_x=([0-9.]+) med_sub=([0-9.]+) """ +
      """mv_warmup=([0-9.]+)s n=(\d+)""").r
    val ms = re.findAllMatchIn(survey).toSeq
    assert(ms.nonEmpty,
      "SURVEY.md must carry the canonical BENCH stamp line (artifact " +
        f"at HEAD: steady_total=$steadyTotal%.1fs sum_x=$sumX%.2f " +
        f"med_sub=$medSub%.2f mv_warmup=$mvTotal%.1fs n=$nQ)")
    val m = ms.last
    def relOk(claimed: Double, actual: Double, tol: Double) =
      math.abs(claimed - actual) <= tol * actual
    val checks = Seq(
      ("steady_total", m.group(1).toDouble, steadyTotal,
        relOk(m.group(1).toDouble, steadyTotal, TolSteady)),
      ("sum_x", m.group(2).toDouble, sumX,
        math.abs(m.group(2).toDouble - sumX) <= TolSumX),
      ("med_sub", m.group(3).toDouble, medSub,
        math.abs(m.group(3).toDouble - medSub) <= TolMedSub),
      ("mv_warmup", m.group(4).toDouble, mvTotal,
        relOk(m.group(4).toDouble, mvTotal, TolMv)),
      ("n", m.group(5).toDouble, nQ.toDouble,
        m.group(5).toInt == nQ))
    val bad = checks.collect { case (name, c, a, false) =>
      f"$name: stamped $c%.2f, artifact says $a%.2f" }
    assert(bad.isEmpty,
      "SURVEY's BENCH stamp has drifted from BENCH_LOCAL.json — " +
        "restamp it from the artifact: " + bad.mkString("; "))
  }

  /** The bands must be wider than REAL cross-host noise (VERDICT r16
    * what's-wrong #2: "a bar that flips red under host load will train
    * people to ignore it"). Frozen fixture pair: the SAME code, SAME
    * sf0.1 data, benched on a quiet host (fe2b9e7's committed
    * BENCH_LOCAL) and by the round-16 driver on a loaded host
    * (a9e24fc). A stamp produced from either run must pass the band
    * check against values computed from the other. These fixtures are
    * immutable — if this test ever fails, a band was tightened below
    * observed noise; widen the band, don't touch the fixtures. */
  test("stamp bands cover the observed quiet-vs-loaded host delta (r16 fixture)") {
    val base = readJson("fixtures/BASELINE_DUCKDB_r16.json")
    val (sQ, xQ, mQ, vQ, nQ) =
      stampValues(readJson("fixtures/BENCH_LOCAL_r16_quiet.json"), base)
    val (sD, xD, mD, vD, nD) =
      stampValues(readJson("fixtures/BENCH_LOCAL_r16_driver.json"), base)
    assert(nQ == nD, "fixture runs cover different query sets")
    def relOk(a: Double, b: Double, tol: Double) =
      math.abs(a - b) <= tol * math.max(a, b)
    val bad = Seq(
      ("steady_total", relOk(sQ, sD, TolSteady), f"$sQ%.1f vs $sD%.1f"),
      ("sum_x", math.abs(xQ - xD) <= TolSumX, f"$xQ%.2f vs $xD%.2f"),
      ("med_sub", math.abs(mQ - mD) <= TolMedSub, f"$mQ%.2f vs $mD%.2f"),
      ("mv_warmup", relOk(vQ, vD, TolMv), f"$vQ%.1f vs $vD%.1f"))
      .collect { case (n, false, d) => s"$n ($d)" }
    assert(bad.isEmpty,
      "stamp band tighter than observed cross-host noise on: " +
        bad.mkString("; ") + " — widen the band")
  }
}
