package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain-aware curation — where a crawl-derived training corpus
  * starts. A crawl's raw URLs over-represent a handful of template-heavy
  * hosts and carry per-click tracking noise that splits one logical page
  * into thousands of "distinct" URLs; canonicalize first, then cap per
  * domain, and every downstream stage (dedup, mixing, sampling) sees a
  * sane key space.
  *
  * Reference anchor: the partner/type-level curation gates in
  * vincemic/ai-fabric-etl notebooks/gold_x12_analytics.py:1-120 (per-key
  * quality screens before aggregation) — re-expressed for web-corpus keys.
  * Canonicalization rules follow the common crawl-pipeline subset (strip
  * fragment, drop tracking parameters, lowercase scheme+authority, strip
  * one trailing slash); everything is built from codegen'd string/array
  * functions — no UDF, no parser object per row.
  */
object Curation {

  /** Query parameters dropped by [[canonicalizeUrl]]: the per-click
    * attribution keys (utm_*, google/facebook/microsoft click ids, bare
    * ref) that vary per visit while the fetched content does not.
    */
  val TrackingParamRegex = "^(utm_[^=&]*|gclid|fbclid|msclkid|ref)(=|$)"

  /** Canonical form of an absolute URL, as a pure column expression:
    *
    *  1. fragment (`#...`) removed — never sent to the server;
    *  2. scheme+authority lowercased (RFC 3986 §6.2.2.1 case
    *     normalization), path/query case preserved;
    *  3. tracking parameters removed ([[TrackingParamRegex]]), other
    *     parameters kept IN ORDER (full param sorting changes semantics on
    *     order-sensitive endpoints — deliberately not done);
    *  4. one trailing slash stripped from the path (`/a/` ≡ `/a`; the
    *     bare-authority root collapses to the authority itself);
    *  5. a now-empty query string drops its `?`.
    *
    * Expects `scheme://authority[/path][?query][#fragment]`; inputs
    * without `//` pass through steps 1/3-5 with no case change. Userinfo
    * and ports ride along in the authority untouched (lowercased only).
    */
  def canonicalizeUrl(url: Column): Column = {
    val base = element_at(split(url, "#", 2), 1)
    val preQ = element_at(split(base, "\\?", 2), 1)
    val query = when(size(split(base, "\\?", 2)) > 1,
      element_at(split(base, "\\?", 2), 2))
    val auth = regexp_extract(preQ, "^([^/]*//[^/]*)", 1)
    val rest = when(length(auth) > 0,
      regexp_extract(preQ, "^[^/]*//[^/]*(.*)$", 1)).otherwise(preQ)
    // authority-lowered prefix + untouched remainder, one trailing slash off
    val lowered = concat(lower(auth), rest)
    val noSlash = regexp_replace(lowered, "/$", "")
    val keptParams = array_join(
      filter(split(query, "&"), p => !p.rlike(TrackingParamRegex)), "&")
    concat(noSlash,
      when(keptParams.isNotNull && length(keptParams) > 0,
        concat(lit("?"), keptParams)).otherwise(lit("")))
  }

  /** Registrable grouping key of a URL: the lowercased host — authority
    * minus userinfo/port — with one leading `www.` stripped (the
    * subdomain-vs-domain distinction a per-domain cap should not count).
    */
  def urlDomain(url: Column): Column =
    regexp_replace(
      regexp_extract(lower(url), "//(?:[^/@]*@)?([^/:?#]+)", 1),
      "^www\\.", "")

  /** Per-domain document cap over canonicalized URLs — the crawl-curation
    * screen run before anything else: canonicalize, key by domain, keep at
    * most `k` documents per domain in the deterministic hash order
    * ([[Sampling.perKeyCap]] — single shuffle, rank-limit pushdown prunes
    * each map side to k rows per domain BEFORE the exchange, the plan
    * shape that survives a million-page host at 100 TB).
    *
    * Returns the surviving rows with `canonical_url` and `domain`
    * appended.
    */
  def perDomainCap(docs: DataFrame, urlCol: String, idCol: String,
      k: Int): DataFrame = {
    val canon = docs
      .withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .withColumn("domain", urlDomain(col(urlCol)))
    Sampling.perKeyCap(canon, "domain", idCol, k)
  }

  /** Default ceiling on a forced blocklist broadcast (rows). A curated
    * robots/litigation/opt-out blocklist is small by construction; a
    * "blocklist" the size of the corpus is a misuse of this operator, not
    * a bigger broadcast.
    */
  val DefaultMaxBlocklistRows: Long = 1000000L

  /** The composed crawl front door — canonicalize → blocklist → per-domain
    * cap → dedup — as one operator, the [[TextDedup.nearDedupPipeline]]
    * parts-to-pipeline pattern applied to crawl curation. Stages:
    *
    *  1. canonical_url + domain columns (pure projection);
    *  2. blocklist screen: rows whose domain appears in `blockedDomains`
    *     (a one-column `domain` frame — robots/litigation/opt-out lists)
    *     are dropped via a FORCED broadcast anti-join, fail-loud-bounded
    *     by `maxBlocklistRows` — unlike the cap anti-joins (whose
    *     heavy-hitter sets are corpus-derived and unbounded, hence
    *     unhinted), a curated blocklist is bounded by construction;
    *  3. per-URL collapse: one fetch survives per canonical_url (min id —
    *     first-crawled wins), so re-fetches and tracking-param variants
    *     of one page never count against the domain cap;
    *  4. per-domain cap `k` in the deterministic hash order
    *     ([[Sampling.perKeyCap]]);
    *  5. exact content dedup across the survivors (min id per text
    *     digest — mirror pages on DIFFERENT domains collapse here).
    *
    * Scale shape: three single-shuffle stages (canonical_url, domain,
    * text digest — each with rank-limit map-side pruning via
    * WindowGroupLimit) plus one broadcast; no stage ever carries more
    * than the surviving rows of the previous one, so the 100 TB cost is
    * one pass of the raw crawl and progressively less after.
    */
  def crawlFrontDoor(docs: DataFrame, urlCol: String, idCol: String,
      textCol: String, blockedDomains: DataFrame, perDomainK: Int,
      maxBlocklistRows: Long = DefaultMaxBlocklistRows): DataFrame = {
    require(perDomainK >= 1, s"perDomainK must be >= 1, got $perDomainK")
    // shared fail-loud bound (Ann.requireSmallQuerySet): a corpus-sized
    // "blocklist" belongs in a shuffled anti-join, not a forced broadcast
    Ann.requireSmallQuerySet(blockedDomains, "crawlFrontDoor: blocklist",
      maxBlocklistRows)
    val canon = docs
      .withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .withColumn("domain", urlDomain(col(urlCol)))
    val allowed = canon.join(
      broadcast(blockedDomains.select(col("domain"))), Seq("domain"), "left_anti")
    val wUrl = Window.partitionBy("canonical_url").orderBy(col(idCol))
    val pages = allowed.withColumn("__rn", row_number().over(wUrl))
      .filter(col("__rn") === 1).drop("__rn")
    val capped = Sampling.perKeyCap(pages, "domain", idCol, perDomainK)
    val wTxt = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    capped.withColumn("__rn", row_number().over(wTxt))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
