package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M25/M26 — URL canonicalization, canonical-URL dedup and per-domain
  * corpus stats: the web-crawl half of a training-data pipeline (crawl
  * dumps key documents by URL; the same page is fetched under scheme/
  * case/tracking-param variants, and corpus curation wants one row per
  * canonical page plus per-domain quality rollups).
  *
  * Not in the reference (emiproc has no web surface). Engine form: a
  * narrow chain of split/filter/sort/join-back column expressions —
  * codegen'd, zero shuffles for canonicalization; dedup and domain
  * stats are single hash-aggregates on the canonical key (the same
  * shape as M3 exact dedup), so both scale like any first-class
  * groupBy at 100 TB.
  *
  * Canonical form (the common normalizations, kept SQL-mirrorable —
  * the gate oracle reruns them in DuckDB):
  *  - scheme and host lowercase;
  *  - default ports stripped (`:80` for http, `:443` for https);
  *  - fragment dropped;
  *  - tracking params dropped (`utm_*`, `fbclid`, `gclid`);
  *  - remaining query params sorted for order-independence;
  *  - trailing `?` dropped when no params survive.
  */
object UrlOps {

  /** `scheme://host[:port]` → `path?query#frag` splitter groups. */
  private val UrlRe = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\\??([^#]*)"

  val TrackingPrefixes: Seq[String] = Seq("utm_", "fbclid", "gclid")

  /** Canonical URL column from a raw URL column. */
  def canonical(url: Column): Column = {
    val scheme = lower(regexp_extract(url, UrlRe, 1))
    val hostRaw = lower(regexp_extract(url, UrlRe, 2))
    val host = when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    val path = regexp_extract(url, UrlRe, 3)
    val query = regexp_extract(url, UrlRe, 4)
    val kept = array_join(
      sort_array(filter(split(query, "&"), p =>
        p =!= "" && !TrackingPrefixes.map(t =>
          p.startsWith(t)).reduce(_ || _))), "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Host of a canonical URL (the M26 domain key). */
  def domain(canonicalUrl: Column): Column =
    regexp_extract(canonicalUrl, UrlRe, 2)

  /** One row per canonical URL: kept doc (smallest doc_id), variant and
    * duplicate counts. `docs` needs (doc_id, url). */
  def dedupByCanonicalUrl(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs
      .withColumn("canonical_url", canonical(col(urlCol)))
      .groupBy("canonical_url")
      .agg(
        min("doc_id").as("keep_doc"),
        count(lit(1)).as("n_docs"),
        countDistinct(col(urlCol)).as("n_variants"))

  /** Per-domain corpus stats over canonicalized docs: document count,
    * unique canonical pages, mean document size. `docs` needs
    * (doc_id, url, n_chars). */
  def domainStats(docs: DataFrame, urlCol: String = "url"): DataFrame = {
    val canon = docs.withColumn("canonical_url", canonical(col(urlCol)))
    canon
      .groupBy(domain(col("canonical_url")).as("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("canonical_url")).as("n_pages"),
        sum("n_chars").as("total_chars"))
  }
}
