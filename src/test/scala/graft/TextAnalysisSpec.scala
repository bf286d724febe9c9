package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("quality features on a known string") {
    val df = Seq((1L, "the cat sat on a mat")).toDF("doc_id", "text")
    val r = df.select(TextAnalysis.quality($"text").as("q"))
      .select($"q.n_chars", $"q.n_words", $"q.stopword_ratio").head()
    assert(r.getInt(0) == 20)
    assert(r.getInt(1) == 6)
    // stopwords here: the, on, a → 3/6
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-9)
  }

  test("token counts: whitespace vs bpe-ish") {
    val df = Seq((1L, "ab cd12 e!")).toDF("doc_id", "text")
    val (ws, bpe) = TextAnalysis.tokenCounts($"text")
    val r = df.select(ws.as("w"), bpe.as("b")).head()
    assert(r.getInt(0) == 3)
    // segments: ab, cd, 1, 2, e, !  → 6
    assert(r.getInt(1) == 6)
  }

  test("lang id votes for the best stopword set, ties to earliest") {
    val df = Seq(
      (1L, "the house of the king is old"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "le chat est dans la maison"),
      (4L, "xyzzy plugh")  // no stopwords anywhere → 'en' (tie, first)
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.langId($"text").as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en" && got(2L) == "de" && got(3L) == "fr" && got(4L) == "en")
  }

  test("fingerprint is deterministic and text-sensitive") {
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "hello worle"))
      .toDF("doc_id", "text")
    val fps = df.select($"doc_id", TextAnalysis.fingerprint64($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }
}
