package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** The two-scale-point headline is stamped FROM the committed artifact
  * (the BenchStampSpec mechanism, extended to SCALE_SWEEP.json): the
  * r16 scale evidence — every registry query measured at ×1 and ×10 —
  * is only worth what the prose quoting it can't drift from. SURVEY.md
  * must carry a canonical line
  *
  *   `SCALE (machine-checked by ScaleStampSpec): n=<q> failed=<f>
  *    exp_max=<e> over_1_1=<k> steady_x1=<s>s steady_x10=<s>s`
  *
  * recomputed here from SCALE_SWEEP.json. n/failed/over_1_1 are exact;
  * the exponent and steady totals get host-noise tolerance.
  */
class ScaleStampSpec extends AnyFunSuite {

  private def checkSweepStamp(artifact: String, label: String): Unit = {
    val p = java.nio.file.Paths.get(artifact)
    assume(java.nio.file.Files.exists(p), s"$artifact not present")
    val sweep = new ObjectMapper().readTree(java.nio.file.Files.readString(p))

    val qs = sweep.get("queries").properties().asScala.toSeq
    val n = qs.size
    val failed = sweep.get("failed").size()
    val exps = qs.flatMap(e => Option(e.getValue.get("exponent"))
      .filterNot(_.isNull).map(_.asDouble()))
    val expMax = if (exps.isEmpty) 0.0 else exps.max
    val over = sweep.get("over_1_1").size()
    def steady(k: String) =
      qs.flatMap(e => Option(e.getValue.get(k)).map(_.asDouble())).sum
    val x1 = steady("x1"); val x10 = steady("x10")

    val survey = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SURVEY.md"))
    val re = (label + """ \(machine-checked by ScaleStampSpec\): """ +
      """n=(\d+) failed=(\d+) exp_max=([0-9.]+) over_1_1=(\d+) """ +
      """steady_x1=([0-9.]+)s steady_x10=([0-9.]+)s""").r
    val ms = re.findAllMatchIn(survey).toSeq
    assert(ms.nonEmpty,
      s"SURVEY.md must carry the canonical $label stamp line (artifact " +
        f"at HEAD: n=$n failed=$failed exp_max=$expMax%.2f " +
        f"over_1_1=$over steady_x1=$x1%.1fs steady_x10=$x10%.1fs)")
    val m = ms.last
    def relOk(claimed: Double, actual: Double, tol: Double) =
      math.abs(claimed - actual) <= tol * actual
    val checks = Seq(
      ("n", m.group(1).toDouble, n.toDouble, m.group(1).toInt == n),
      ("failed", m.group(2).toDouble, failed.toDouble,
        m.group(2).toInt == failed),
      ("exp_max", m.group(3).toDouble, expMax,
        math.abs(m.group(3).toDouble - expMax) <= 0.05),
      ("over_1_1", m.group(4).toDouble, over.toDouble,
        m.group(4).toInt == over),
      ("steady_x1", m.group(5).toDouble, x1,
        relOk(m.group(5).toDouble, x1, 0.15)),
      ("steady_x10", m.group(6).toDouble, x10,
        relOk(m.group(6).toDouble, x10, 0.15)))
    val bad = checks.collect { case (name, c, a, false) =>
      f"$name: stamped $c%.2f, artifact says $a%.2f" }
    assert(bad.isEmpty,
      s"SURVEY's $label stamp has drifted from $artifact — " +
        "restamp it from the artifact: " + bad.mkString("; "))
  }

  test("SURVEY.md SCALE stamp matches SCALE_SWEEP.json") {
    checkSweepStamp("SCALE_SWEEP.json", "SCALE")
  }

  // the density axis (same entities, ×k rows per key — the whale/skew
  // shape) gets the identical anti-drift stamp (VERDICT r16 #5)
  test("SURVEY.md SCALE_DENSITY stamp matches SCALE_SWEEP_DENSITY.json") {
    checkSweepStamp("SCALE_SWEEP_DENSITY.json", "SCALE_DENSITY")
  }

  // the off-clamp ANN evidence (ScaleAnn at ×100 embeddings) carries
  // the same anti-drift stamp: corpus size, cell count, cells ≥ bar
  test("SURVEY.md SCALE_ANN stamp matches SCALE_ANN.json") {
    val p = java.nio.file.Paths.get("SCALE_ANN.json")
    assume(java.nio.file.Files.exists(p), "SCALE_ANN.json not present")
    val a = new ObjectMapper().readTree(java.nio.file.Files.readString(p))
    // staleness gate (VERDICT r17 #6): the artifact records the content
    // fingerprint of the ANN operator sources it was produced by; any
    // change to that set reds this test until ScaleAnn is re-run
    val fpNode = a.get("ann_src_fp")
    assert(fpNode != null,
      "SCALE_ANN.json predates the ann_src_fp staleness field — re-run " +
        "graft.ScaleAnn at HEAD")
    val now = graft.operators.AnnGates.annSourceFingerprint()
    assert(fpNode.asText() == now,
      s"SCALE_ANN.json was produced by ANN sources ${fpNode.asText()} but " +
        s"the working tree is $now — the ANN operator set changed; re-run " +
        "graft.ScaleAnn (x100 off-clamp) and restamp")
    val n = a.get("corpus_n").asLong()
    val cells = a.get("cells").size()
    val ok = (0 until cells).count(i => a.get("cells").get(i).get("ok").asBoolean())
    val survey = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SURVEY.md"))
    val re = ("""SCALE_ANN \(machine-checked by ScaleStampSpec\): """ +
      """corpus_n=(\d+) cells=(\d+) ok=(\d+)""").r
    val ms = re.findAllMatchIn(survey).toSeq
    assert(ms.nonEmpty,
      "SURVEY.md must carry the canonical SCALE_ANN stamp line " +
        s"(artifact at HEAD: corpus_n=$n cells=$cells ok=$ok)")
    val m = ms.last
    assert(m.group(1).toLong == n && m.group(2).toInt == cells &&
      m.group(3).toInt == ok,
      s"SURVEY's SCALE_ANN stamp (${m.matched}) has drifted from " +
        s"SCALE_ANN.json (corpus_n=$n cells=$cells ok=$ok) — restamp")
  }

  test("SURVEY.md SCALECHECK stamp matches SCALE_CORRECTNESS.json") {
    val p = java.nio.file.Paths.get("SCALE_CORRECTNESS.json")
    assume(java.nio.file.Files.exists(p), "SCALE_CORRECTNESS.json not present")
    val cc = new ObjectMapper().readTree(java.nio.file.Files.readString(p))
    val n = cc.get("n_oracles").asInt()
    val ok = cc.get("ok").asInt()
    val fail = cc.get("fail").asInt()
    // the skip LIST is stamped by name (VERDICT r16 #8): a green
    // ok-count must not be able to hide a silently-grown skip list —
    // every adjudicated skip has to be named in SURVEY's stamp line.
    val skipped = Option(cc.get("oracle_skipped"))
      .map(_.properties().asScala.map(_.getKey).toSeq.sorted)
      .getOrElse(Nil)
    val skipStamp = if (skipped.isEmpty) "none" else skipped.mkString(",")
    val survey = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SURVEY.md"))
    val re = ("""SCALECHECK \(machine-checked by ScaleStampSpec\): """ +
      """oracles=(\d+) ok=(\d+) fail=(\d+) skipped=(\S+)""").r
    val ms = re.findAllMatchIn(survey).toSeq
    assert(ms.nonEmpty,
      "SURVEY.md must carry the canonical SCALECHECK stamp line " +
        s"(artifact at HEAD: oracles=$n ok=$ok fail=$fail skipped=$skipStamp)")
    val m = ms.last
    assert(m.group(1).toInt == n && m.group(2).toInt == ok &&
      m.group(3).toInt == fail && m.group(4) == skipStamp,
      s"SURVEY's SCALECHECK stamp (${m.matched}) has drifted from " +
        s"SCALE_CORRECTNESS.json (oracles=$n ok=$ok fail=$fail " +
        s"skipped=$skipStamp) — restamp")
  }
}
