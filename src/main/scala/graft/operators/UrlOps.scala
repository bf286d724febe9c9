package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + host-level corpus controls — the dedup rung
  * BELOW content hashing in a crawl pipeline (CCNet/RefinedWeb run it
  * first: the same page is fetched under scheme/www/tracking-param
  * variants, and exact-content dedup misses re-renders with rotated
  * ads while URL dedup catches them for free).
  *
  * Everything here is a pure column expression chain (regexp over the
  * url string — codegen'd, runs inside the scan stage, no UDF) plus
  * one keyed groupBy per operator, so the ops hold at crawl scale:
  * canonicalization is O(row), dedup shuffles the canonical-url key
  * once with map-side combine, host caps shuffle the host key once.
  *
  * No reference analogue (LLM-pipeline extension); the testdata
  * documents table carries no URL column, so the surface is
  * spec-pinned on synthetic URLs (UrlOpsSpec) — promote to a
  * driver-gated query if a URL column ever lands in the testdata.
  */
object UrlOps {

  /** Tracking parameters every major pipeline strips: they vary per
    * click, never per document. */
  private val TrackingParams =
    "utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|ref|ref_src|igshid|spm"

  /** Canonical form of a URL, as a codegen'd expression:
    *  1. lowercase scheme+host (the path stays case-sensitive);
    *  2. scheme dropped (http ≡ https for identity), leading www. too;
    *  3. fragment dropped (client-side only);
    *  4. tracking query params dropped; a then-empty query dropped;
    *  5. remaining query params SORTED (param order is not identity);
    *  6. default ports (:80/:443) and the trailing slash on a bare or
    *     directory path dropped.
    * Malformed inputs pass through lowercased-host best-effort rather
    * than erroring — a crawl pipeline cannot throw on its input. */
  def canonicalizeUrl(url: Column): Column = {
    // scheme off, fragment off
    val noScheme = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noFrag = regexp_replace(noScheme, "#.*$", "")
    // lowercase the authority (up to the first /), keep path casing
    val authority = regexp_extract(noFrag, "^([^/?]*)", 1)
    val rest = substring_index_safe(noFrag)
    val auth = regexp_replace(
      regexp_replace(lower(authority), "^www\\.", ""),
      ":(80|443)$", "")
    // split path?query, scrub + sort the query
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val keptParams = array_sort(filter(split(query, "&"), p =>
      !(p.rlike(s"^($TrackingParams)=") || p === lit(""))))
    val cleanQuery = array_join(keptParams, "&")
    val cleanPath = regexp_replace(path, "/$", "")
    concat(auth, cleanPath,
      when(cleanQuery === "", lit("")).otherwise(concat(lit("?"), cleanQuery)))
  }

  // everything after the authority ("/p?q" or "" for a bare host)
  private def substring_index_safe(noFrag: Column): Column =
    regexp_replace(noFrag, "^[^/?]*", "")

  /** The registered host of a canonical (or raw) URL. */
  def hostOf(url: Column): Column =
    regexp_extract(regexp_replace(
        regexp_replace(lower(url), "^[a-z][a-z0-9+.-]*://", ""),
        "^www\\.", ""),
      "^([^/:?#]*)", 1)

  /** Keep ONE document per canonical URL — the longest text, doc_id as
    * the deterministic tie-break (crawls prefer the fullest render).
    * One keyed shuffle; max_by carries (len, -id) so ties can't flap. */
  def dedupByCanonicalUrl(docs: DataFrame, urlCol: String, idCol: String,
                          textCol: String): DataFrame =
    docs
      .withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .groupBy(col("canonical_url"))
      .agg(
        max_by(struct(docs.columns.map(col): _*),
          struct(length(col(textCol)), -col(idCol))).as("kept"),
        count(lit(1)).as("url_dups"))
      .select(col("canonical_url") +: col("url_dups") +:
        docs.columns.map(c => col(s"kept.$c")): _*)

  /** Cap documents per host (domain-level sampling — a handful of
    * template-heavy hosts otherwise dominate a crawl corpus): keeps
    * the `cap` docs with the LONGEST text per host, deterministic
    * doc-id tie-break. row_number over (host) is one keyed sort; at
    * 100 TB the same shape AQE-skew-splits the megahost partitions. */
  def capPerHost(docs: DataFrame, urlCol: String, idCol: String,
                 textCol: String, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("host"))
      .orderBy(length(col(textCol)).desc, col(idCol))
    docs.withColumn("host", hostOf(col(urlCol)))
      .withColumn("host_rank", row_number().over(w))
      .filter(col("host_rank") <= cap)
      .drop("host_rank")
  }
}
