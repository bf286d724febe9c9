package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID, quality
  * scoring, token counting, fingerprinting. All pure column
  * expressions (whole-stage-codegen friendly, no UDFs).
  */
object TextAnalysis {

  val StopwordsEn: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

  private def words(text: Column): Column =
    split(trim(text), " +")

  /** Tokens, chars, words, punctuation/digit/space ratios, stopword
    * ratio, mean word length — the usual quality-filter features.
    * Stopword counting is a native one-pass expression
    * ([[graft.functions.StopwordVotes]]) instead of a CodegenFallback
    * `filter(words, isin)` tree. */
  def quality(text: Column): Column = {
    val n = length(text).cast("double")
    val w = words(text)
    val stop = element_at(
      graft.functions.StopwordVotes.stopword_votes(text, Seq(StopwordsEn)), 1)
    struct(
      length(text).as("n_chars"),
      size(w).as("n_words"),
      (size(w).cast("double") / greatest(n, lit(1.0))).as("words_per_char"),
      (length(regexp_replace(text, "[a-z ]", "")).cast("double") /
        greatest(n, lit(1.0))).as("nonalpha_ratio"),
      (stop.cast("double") / greatest(size(w).cast("double"), lit(1.0)))
        .as("stopword_ratio"),
      ((n - length(regexp_replace(text, " ", ""))) / greatest(n, lit(1.0)))
        .as("space_ratio"))
  }

  /** Whitespace tokens + a BPE-ish segment count (letter runs, single
    * digits, single other chars — a cheap proxy for subword count). */
  def tokenCounts(text: Column): (Column, Column) = {
    val ws = size(words(text))
    val bpe = size(regexp_extract_all(text, lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0)))
    (ws, bpe)
  }

  /** Stopword-vote language ID over a fixed language set. Ties break
    * by the order of `langs` (first wins). All four stopword counts
    * come from ONE pass over the words (native
    * [[graft.functions.StopwordVotes]]); the argmax is a small
    * when-fold over the counts array. */
  def langId(text: Column): Column = {
    val langs: Seq[(String, Seq[String])] = Seq(
      "en" -> StopwordsEn,
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
      "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pas"),
      "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "no"))
    val votes = graft.functions.StopwordVotes.stopword_votes(text, langs.map(_._2))
    val scores = langs.zipWithIndex.map { case ((lang, _), i) =>
      lit(lang) -> element_at(votes, i + 1)
    }
    // greatest-by: fold into (bestLang, bestScore)
    scores.tail.foldLeft(
      struct(scores.head._1.as("lang"), scores.head._2.as("score"))) {
      case (best, (lang, score)) =>
        when(score > best.getField("score"),
          struct(lang.as("lang"), score.as("score"))).otherwise(best)
    }.getField("lang")
  }

  /** One document's repetition report — the row-local value
    * [[repetition]] computes. Option fields are NULL when the doc has
    * too few tokens for that gram level (the relational form's
    * conditional-sum semantics). */
  final case class RepetitionRow(doc_id: Long, n_tokens: Long,
                                 distinct_token_ratio: Double,
                                 dup_bigram_frac: Option[Double],
                                 dup_trigram_frac: Option[Double],
                                 top_bigram_cover: Option[Double])

  /** Gopher-style repetition signals per document (Rae et al. 2021,
    * "Scaling Language Models", table A1): distinct-token ratio,
    * duplicate bi/tri-gram occurrence fractions, and the fraction of
    * tokens covered by the single most frequent bigram.
    *
    * ROW-LOCAL computation (r15): every signal is a function of one
    * document's own gram multiset, so the operator is a per-row fold
    * over the token array — zero shuffles before the caller's output
    * sort, embarrassingly parallel at any corpus size, and the
    * per-row state (two count maps) is bounded by that document's
    * length. The relational form (posexplode → lead windows → stack →
    * two aggregations) computes the identical report but pays a
    * corpus-wide token exchange for adjacency that already exists in
    * the row — measured 1.5-1.8 s vs ~0.35 s at sf0.1. Same
    * mapPartitions justification as the Ledger fold and LTTB: the
    * per-key computation is inherently sequential/local and Catalyst
    * has no shuffle-free way to express it. Tokenization matches the
    * relational form exactly (trim + split on " +"; empty text yields
    * the single empty token both ways; NULL text drops the doc, as
    * posexplode of split(trim(NULL)) did in the relational form), and
    * the Option fields reproduce its conditional-sum NULLs for docs
    * below each gram level.
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val ws = text.trim.split(" +", -1)
        val n = ws.length
        val uni = new java.util.HashSet[String]()
        var i = 0
        while (i < n) { uni.add(ws(i)); i += 1 }
        var uniq2 = 0L; var maxB = 0L; var uniq3 = 0L
        if (n >= 2) {
          val big = new java.util.HashMap[String, Long]()
          i = 0
          while (i < n - 1) {
            val k = ws(i) + " " + ws(i + 1)
            val c = big.merge(k, 1L, (a, b) => a + b)
            if (c > maxB) maxB = c
            i += 1
          }
          uniq2 = big.size.toLong
        }
        if (n >= 3) {
          val tri = new java.util.HashSet[String]()
          i = 0
          while (i < n - 2) {
            tri.add(ws(i) + " " + ws(i + 1) + " " + ws(i + 2)); i += 1
          }
          uniq3 = tri.size.toLong
        }
        RepetitionRow(id, n.toLong,
          uni.size.toDouble / n.toDouble,
          if (n >= 2) Some((n - 1 - uniq2).toDouble /
            math.max(n - 1, 1).toDouble) else None,
          if (n >= 3) Some((n - 2 - uniq3).toDouble /
            math.max(n - 2, 1).toDouble) else None,
          if (n >= 2) Some(maxB.toDouble * 2.0 / n.toDouble) else None)
      }).toDF()
  }

  /** Corpus-wide token frequency top-k (the Zipf table): one explode,
    * one groupBy(word) count, one global top-k. The word key space is
    * the vocabulary, orders of magnitude smaller than the corpus, so
    * the shuffle carries only per-task partial counts (map-side
    * combine) and the top-k runs as TakeOrderedAndProject — at 100 TB
    * this is the cheapest full-corpus statistic there is. Ties break
    * by word for a deterministic tail. */
  def wordFrequency(docs: DataFrame, textCol: String, topK: Int): DataFrame =
    docs.select(explode(split(trim(col(textCol)), " +")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("word"))
      .limit(topK)

  /** Vocabulary build: document frequency, total occurrences, and a
    * scale-and-floor IDF per token above a min-df threshold — the
    * tokenizer-training / feature-vocab construction pass of a corpus
    * pipeline (and the exact DF/IDF table [[Search.bm25]] broadcasts).
    * Same tokenization as [[wordFrequency]].
    *
    * Scale shape: explode → (doc, word) partial-agg groupBy → word
    * groupBy — both aggregates map-side combined, shuffle keyed on the
    * word hash; the min-df filter prunes the hapax tail before any
    * downstream join. IDF floored at 1e4 like [[lmScore]] so the
    * value is engine-comparable. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
                 minDf: Long): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val perDoc = docs
      .select(col(idCol), explode(words(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("c"))
    perDoc.groupBy(col("word"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("cnt"))
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(nDocs))
      .select(col("word"), col("df"), col("cnt"),
        floor(log(col("n_docs").cast("double") / col("df").cast("double"))
          * 1e4).cast("long").as("idf_4"))
  }

  /** Unigram language-model quality score (the CCNet/KenLM-style
    * fluency filter, reduced to its order-0 core): the corpus itself
    * is the model — per-document mean negative log-likelihood of its
    * tokens under add-one-smoothed corpus unigram frequencies. Low =
    * common/fluent text, high = rare or garbled. Emitted as a
    * scale-and-floor integer (×1e4) so results are comparable across
    * engines despite FP summation order.
    *
    * Scale shape: one groupBy(word) for the counts (map-side partial
    * agg), one 2-value global aggregate, one hash join token⋈counts —
    * counts broadcast while the vocab is small; at 100 TB the same
    * join shuffles by word, still partial-agg'd. */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(split(trim(col(textCol)), " +")).as("word"))
      .filter(length(col("word")) > 0)
    val counts = toks.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).cast("double").as("n_total"),
      count(lit(1)).cast("double").as("vocab"))
    toks.join(broadcast(counts), Seq("word"))
      .join(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        floor(sum(-log((col("cnt") + 1).cast("double") /
            (col("n_total") + col("vocab"))))
          / count(lit(1)) * 1e4).cast("long").as("nll_4"))
  }

  /** Polynomial rolling hash of the text (document fingerprint),
    * folded mod 2^40 so it never overflows a long under ANSI
    * arithmetic. Built from codegen'd primitives — deterministic,
    * locale-free. */
  def fingerprint64(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(1099511627689L),
      (acc, ch) => pmod(acc * lit(31L), lit(1L << 40)) +
        when(length(ch) > 0, ascii(ch).cast("long")).otherwise(0L))

  /** Sliding-window character chunking (retrieval / context-window
    * prep): chunk i covers characters [i·stride, i·stride + size).
    * Start indices run 0..ceil(max(len − size, 0) / stride), so every
    * character lands in at least one chunk, consecutive chunks overlap
    * by exactly size − stride characters, and a document that already
    * fits in one window emits exactly one chunk (no degenerate tail
    * windows shorter than the overlap).
    *
    * Scale shape: a pure scan-stage sequence + explode — no shuffle,
    * no state, whole-stage codegen end-to-end; output parallelism is
    * the input split parallelism, which is the right 100 TB shape for
    * a corpus-wide rechunk. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val lastIdx = ceil(greatest(length(col(textCol)) - size, lit(0))
      .cast("double") / stride).cast("long")
    docs
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0L), lastIdx)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        col(textCol).substr((col("chunk_idx") * stride + 1).cast("int"),
          lit(size)).as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
  }

  /** Cross-document EXACT repeated-substring spans (Lee et al. 2021,
    * arXiv:2107.06499 "Deduplicating Training Data Makes Language
    * Models Better" — the ExactSubstr dedup their suffix array
    * computes, re-expressed relationally): every maximal run of word
    * positions whose `l`-word window re-occurs anywhere in the corpus
    * (including elsewhere in the same document).
    *
    * Per span: (doc_id, span_start, span_end) in 0-based word
    * positions (end inclusive), span_words, and `removable` — true
    * when the span contains NO canonical window occurrence, where the
    * canonical occurrence of a window is its corpus-minimal
    * (doc_id, pos). Removing every removable span keeps exactly one
    * copy of each duplicated substring (the earliest), the paper's
    * all-but-one policy made deterministic.
    *
    * Spark shape, in place of the paper's single-node suffix array:
    * scan-stage window explode (≈ |words| rows), ONE partial-agg
    * groupBy on the window text computing (occurrences, min
    * (doc_id, pos)) — both map-side combinable, so high-df boilerplate
    * windows (the skew keys) collapse per partition before the
    * exchange — a shuffle join back to positions, then per-doc island
    * merging on a keyed window. Everything is linear in corpus words;
    * nothing is pairwise. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    l: Int): DataFrame = {
    require(l >= 2, s"window length must be >= 2, got $l")
    val base = docs
      .select(col(idCol).as("doc_id"), split(trim(col(textCol)), " +").as("ws"))
      .withColumn("n", size(col("ws")))
    val wins = base
      .filter(col("n") >= l)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("n") - l),
          i => concat_ws(" ", slice(col("ws"), i + 1, lit(l))))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("win"))
    val stats = wins.groupBy(col("win"))
      .agg(count(lit(1)).as("occ"),
        min(struct(col("doc_id"), col("pos"))).as("m"))
    val marked = wins
      .join(stats.filter(col("occ") >= 2), Seq("win"))
      .select(col("doc_id"), col("pos"),
        (col("doc_id") === col("m.doc_id") && col("pos") === col("m.pos"))
          .as("is_canonical"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + l - 1).as("span_end"),
        (max(col("pos")) - min(col("pos")) + l).as("span_words"),
        (sum(when(col("is_canonical"), 1L).otherwise(0L)) === 0)
          .as("removable"))
      .drop("grp")
  }

  /** Apply [[repeatedSpans]]: cut every REMOVABLE span's words out of
    * each document — the corpus after ExactSubstr dedup, exactly one
    * (the earliest) copy of every duplicated substring surviving.
    *
    * Shape: the spans collapse to one small array per affected doc
    * (groupBy on doc_id), join back to the corpus, and the cut itself
    * is a single scan-stage filter-by-position lambda over the word
    * array — no explode of the corpus, no second shuffle. Documents
    * with no removable span pass through untouched. */
  def cutRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                       l: Int): DataFrame =
    cutSpans(docs, idCol, textCol, repeatedSpans(docs, idCol, textCol, l))

  /** [[cutRepeatedSpans]] against an already-computed (usually
    * session-materialized) [[repeatedSpans]] frame — the span find is
    * the expensive half and is shared with the reporting query. */
  def cutSpans(docs: DataFrame, idCol: String, textCol: String,
               spanFrame: DataFrame): DataFrame = {
    val spans = spanFrame
      .filter(col("removable"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("span_start"),
        col("span_end")))).as("cuts"))
    val ws = split(trim(col(textCol)), " +")
    docs
      .select(col(idCol).as("doc_id"), ws.as("ws"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("cuts").isNull, col("ws"))
          .otherwise(filter(col("ws"), (_, i) =>
            !exists(col("cuts"), s =>
              i.cast("long") >= s.getField("span_start") &&
                i.cast("long") <= s.getField("span_end")))).as("kept"),
        size(col("ws")).cast("long").as("n_words"))
      .select(col("doc_id"),
        concat_ws(" ", col("kept")).as("text_clean"),
        size(col("kept")).cast("long").as("kept_words"),
        (col("n_words") - size(col("kept"))).cast("long").as("cut_words"))
  }
}
