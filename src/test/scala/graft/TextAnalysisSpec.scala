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

  test("repetition signals on hand-computed documents") {
    val df = Seq(
      (1L, "a b a b a b"),      // 6 tokens {a,b}; bigrams: ab ba ab ba ab
      (2L, "w x y z q r")       // all distinct
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    val d1 = r(1L)
    assert(d1.getLong(1) == 6)                                  // n_tokens
    assert(math.abs(d1.getDouble(2) - 2.0 / 6) < 1e-9)          // distinct ratio
    // bigrams: 5 total, 2 uniq ("a b"×3, "b a"×2) → dup frac 3/5
    assert(math.abs(d1.getDouble(3) - 3.0 / 5) < 1e-9)
    // trigrams: 4 total, 2 uniq → 2/4
    assert(math.abs(d1.getDouble(4) - 0.5) < 1e-9)
    // top bigram "a b" ×3 → 3·2/6 = 1.0
    assert(math.abs(d1.getDouble(5) - 1.0) < 1e-9)
    val d2 = r(2L)
    assert(d2.getDouble(2) == 1.0 && d2.getDouble(3) == 0.0 &&
      d2.getDouble(4) == 0.0)
  }

  test("segment duplication flags cross-doc duplicated windows only") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val own1 = (1 to 10).map(i => s"a$i").mkString(" ")
    val own2 = (1 to 10).map(i => s"b$i").mkString(" ")
    val df = Seq(
      (1L, s"$shared $own1"),            // 2 windows, 1 duplicated
      (2L, s"$shared $own2"),            // 2 windows, 1 duplicated
      (3L, (1 to 25).map(i => s"c$i").mkString(" "))  // 2 full windows, 0 dup
    ).toDF("doc_id", "text")
    val r = graft.operators.Dedup.segmentDuplication(df, "doc_id", "text", chunk = 10)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 2 && r(1L).getLong(2) == 1)
    assert(math.abs(r(1L).getDouble(3) - 0.5) < 1e-9 && !r(1L).getBoolean(4))
    assert(r(2L).getLong(2) == 1)
    assert(r(3L).getLong(1) == 2 && r(3L).getLong(2) == 0 && r(3L).getBoolean(4))
  }

  test("lm score: rare-token doc scores higher NLL than common-token doc") {
    // corpus: "a" appears 6×, "zq" once → doc of a's is most likely
    val df = Seq(
      (1L, "a a a"), (2L, "a a a"), (3L, "zq")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.lmScore(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L)._1 == 3 && r(3L)._1 == 1)
    assert(r(1L)._2 == r(2L)._2)          // identical docs, identical score
    assert(r(3L)._2 > r(1L)._2)           // rare token → higher NLL
    // hand value: p(a) = (6+1)/(7+2), nll = -ln(7/9) ≈ 0.251314
    assert(r(1L)._2 == math.floor(-math.log(7.0 / 9.0) * 1e4).toLong)
  }

  test("pii signals: counts and redacted length on a crafted doc") {
    val df = Seq(
      (1L, "mail me at bob.smith@corp.io or see https://x.org/a?b=1 id 12345678 ok"),
      (2L, "clean text no signals 123")
    ).toDF("doc_id", "text")
    val r = graft.operators.CorpusPipeline.piiSignals(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getInt(1) == 1 && r(1L).getInt(2) == 1 && r(1L).getInt(3) == 1)
    // redaction shrinks: the three matches are longer than the tags
    assert(r(1L).getInt(5) < r(1L).getInt(4))
    assert(r(2L).getInt(1) == 0 && r(2L).getInt(2) == 0 && r(2L).getInt(3) == 0)
    assert(r(2L).getInt(5) == r(2L).getInt(4))
  }

  test("spacesaving topk: bounds hold and true heavy hitters survive") {
    import graft.model.Tables
    val words = Tables.documents(spark, sf)
      .select(explode(split(trim($"text"), " +")).as("word"))
      .filter(length($"word") > 0)
    val exact = words.groupBy("word").count()
      .orderBy($"count".desc, $"word").limit(20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.operators.HeavyHitters
      .topKApprox(spark, words, "word", 50, 500)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byItem = approx.map(t => t._1 -> t).toMap
    // every true top-20 item survives a capacity-500 sketch
    assert(exact.keySet.subsetOf(byItem.keySet))
    // count_est is an upper bound; count_est - err a lower bound
    exact.foreach { case (w, trueC) =>
      val (_, est, err) = byItem(w)
      assert(est >= trueC && est - err <= trueC, s"$w est=$est err=$err true=$trueC")
    }
  }

  test("data mix: ppm shares are floored and docs/tokens exact") {
    val df = Seq(
      (1L, "web", "en", "a b c"),      // 3 tokens
      (2L, "web", "en", "d e"),        // 2 tokens
      (3L, "book", "de", "f g h i j")  // 5 tokens
    ).toDF("doc_id", "source", "lang", "text")
    val r = graft.operators.CorpusPipeline.dataMix(df, "source", "lang", "text")
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(("web", "en")) == (2L, 5L, 500000L))
    assert(r(("book", "de")) == (1L, 5L, 500000L))
  }

  test("vocabulary: df counts documents, cnt counts occurrences, idf floored") {
    val df = Seq(
      (1L, "a a b"),
      (2L, "a c"),
      (3L, "b b b"),
      (4L, "a")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.vocabulary(df, "doc_id", "text", minDf = 2)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    // a: df 3 (docs 1,2,4), cnt 4; b: df 2 (docs 1,3), cnt 4; c: df 1 → cut
    assert(r.keySet == Set("a", "b"))
    assert(r("a") == ((3L, 4L, math.floor(math.log(4.0 / 3.0) * 1e4).toLong)))
    assert(r("b") == ((2L, 4L, math.floor(math.log(4.0 / 2.0) * 1e4).toLong)))
  }

  test("property: chunking covers exactly under random size/stride") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    val combos = Seq((1, 1), (2, 1), (5, 5), (7, 3), (16, 16), (16, 11),
      (31, 7), (64, 48))
    combos.foreach { case (size, stride) =>
      val docs = (0 until 24).map { i =>
        val n = rnd.nextInt(4 * size + 2)
        (i.toLong, Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString)
      }
      val df = docs.toDF("doc_id", "text")
      val got = TextAnalysis.chunk(df, "doc_id", "text", size, stride)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .groupBy(_._1)
      docs.foreach { case (id, text) =>
        val chunks = got(id).sortBy(_._2)
        val expectN =
          math.ceil(math.max(text.length - size, 0) / stride.toDouble).toLong + 1
        assert(chunks.length == expectN,
          s"size=$size stride=$stride len=${text.length}")
        chunks.foreach { case (_, i, t) =>
          assert(t == text.slice((i * stride).toInt, (i * stride).toInt + size))
        }
        val covered = chunks.flatMap { case (_, i, t) =>
          (i * stride).toInt until ((i * stride).toInt + t.length)
        }.toSet
        assert(covered == text.indices.toSet,
          s"size=$size stride=$stride len=${text.length} coverage")
      }
    }
  }

  test("chunking: coverage, overlap, count formula across lengths") {
    val size = 8
    val stride = 5
    // lengths around every boundary: 0, <size, =size, size+1,
    // size+stride, size+stride+1, and a long tail case
    val docs = Seq(0, 3, 8, 9, 13, 14, 20, 33, 47)
      .map(n => (n.toLong, "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJK".take(n)))
    val df = docs.toDF("doc_id", "text")
    val got = TextAnalysis.chunk(df, "doc_id", "text", size, stride)
      .orderBy($"doc_id", $"chunk_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val chunks = got(id).sortBy(_._2)
      val expectN = math.ceil(math.max(text.length - size, 0) / stride.toDouble).toLong + 1
      assert(chunks.length == expectN, s"doc $id len=${text.length}")
      // chunk i is exactly text.slice(i*stride, i*stride+size)
      chunks.foreach { case (_, i, t, l) =>
        val want = text.slice((i * stride).toInt, (i * stride).toInt + size)
        assert(t == want && l == want.length, s"doc $id chunk $i")
      }
      // reconstruction: chunk 0 + the non-overlapping suffix of each
      // later chunk rebuilds the document exactly
      val rebuilt = chunks.map(_._3).zipWithIndex.map {
        case (t, 0) => t
        case (t, _) => t.drop(size - stride)
      }.mkString
      // the final window may re-cover already-seen chars; rebuilt is a
      // supersequence prefix-wise — check coverage instead
      assert(rebuilt.startsWith(text.take(rebuilt.length)))
      val covered = chunks.flatMap { case (_, i, t, _) =>
        (i * stride).toInt until ((i * stride).toInt + t.length)
      }.toSet
      assert(covered == text.indices.toSet, s"doc $id coverage")
    }
  }

  test("repeated spans: maximal islands, keep-earliest removability") {
    import spark.implicits._
    // shared 5-word phrase "a b c d e" at doc1[2..6], doc2[0..4];
    // doc3 repeats its own 4-word run twice (intra-doc duplication);
    // doc4 shares nothing
    val docs = Seq(
      (1L, "x1 x2 a b c d e y1 y2 y3"),
      (2L, "a b c d e z1 z2 z3 z4 z5"),
      (3L, "p q r s t1 t2 p q r s u1 u2"),
      (4L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")
    ).toDF("doc_id", "text")
    val spans = graft.operators.TextAnalysis
      .repeatedSpans(docs, "doc_id", "text", l = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .sortBy(s => (s._1, s._2)).toSeq
    // doc1: windows at pos 2,3 ("a b c d","b c d e") duplicated →
    // one span [2..6], 5 words, canonical (earliest doc) → keep
    // doc2: same windows at pos 0,1 → span [0..4] removable
    // doc3: "p q r s" at pos 0 and 6 → two 4-word spans; pos 0
    // canonical, pos 6 removable
    assert(spans == Seq(
      (1L, 2L, 6L, 5L, false),
      (2L, 0L, 4L, 5L, true),
      (3L, 0L, 3L, 4L, false),
      (3L, 6L, 9L, 4L, true)), s"got ${spans.toSeq}")

    // the apply side: removable spans cut, earliest copies survive
    val cut = graft.operators.TextAnalysis
      .cutRepeatedSpans(docs, "doc_id", "text", l = 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(cut(1L) == (("x1 x2 a b c d e y1 y2 y3", 10L, 0L)),
      "canonical doc untouched")
    assert(cut(2L) == (("z1 z2 z3 z4 z5", 5L, 5L)), "duplicate span cut")
    assert(cut(3L) == (("p q r s t1 t2 u1 u2", 8L, 4L)),
      "intra-doc repeat keeps first occurrence")
    assert(cut(4L) == (("w1 w2 w3 w4 w5 w6 w7 w8 w9", 9L, 0L)))
  }
}
