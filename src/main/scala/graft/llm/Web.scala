package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level web-curation operators (the RefinedWeb / Dolma class:
  * Penedo et al. 2023 §3.1 "URL filtering", Soldaini et al. 2024 — public
  * methods): canonicalize page URLs, dedup exactly on the canonical form,
  * aggregate per registrable domain, and gate a corpus on a domain
  * blocklist/allowlist.
  *
  * Everything before the dedup/aggregation is a row-local chain of builtin
  * `regexp_replace`/`regexp_extract` (codegen'd, map-only at any corpus
  * size); the only shuffles are keyed on canonical URL (dedup) or domain
  * (stats) with map-side partial aggregation, so a hot boilerplate URL or a
  * mega-domain never concentrates rows beyond its partial counts.
  *
  * The canonicalization is a DOCUMENTED normal form, not a full RFC 3986
  * implementation: each step below is a single regex valid in both Java
  * regex (Spark) and RE2 (the DuckDB oracle — no lookahead/backreferences):
  *   1. lowercase (scheme+host are case-insensitive; fixture paths are
  *      already lower, so whole-string lower keeps both engines trivial)
  *   2. strip the fragment (`#...`)
  *   3. strip tracking parameters (utm_*, fbclid, gclid) — values only,
  *      separators cleaned in 4-6
  *   4. collapse `?&&...` → `?`, 5. collapse `&&...` → `&`,
  *   6. drop dangling trailing `?`/`&`
  *   7. drop a path's trailing slash before a query (`/?` → `?`)
  *   8. strip default ports `:80`/`:443`
  *   9. strip a leading `www.` host label
  *  10. drop trailing slashes
  */
object Web {

  private def rr(c: Column, pattern: String, replacement: String): Column =
    regexp_replace(c, pattern, replacement)

  /** The canonical URL normal form (steps documented on the object). */
  def canonicalizeUrl(url: Column): Column = {
    var u = lower(url)
    u = rr(u, "#.*", "")
    u = rr(u, "(utm_[a-z0-9_]+|fbclid|gclid)=[^&]*", "")
    u = rr(u, "\\?&+", "?")
    u = rr(u, "&&+", "&")
    u = rr(u, "[?&]+$", "")
    u = rr(u, "/\\?", "?")
    u = rr(u, ":(80|443)/", "/")
    u = rr(u, ":(80|443)$", "")
    u = rr(u, "://www\\.", "://")
    rr(u, "/+$", "")
  }

  /** Host portion of a canonical URL (empty string when not a URL). */
  def host(canonicalUrl: Column): Column =
    regexp_extract(canonicalUrl, "^[a-z][a-z0-9+.-]*://([^/:?]+)", 1)

  /** Registrable domain of a host, public-suffix-aware: when the host's
    * last three labels are a known three-label private-registry suffix
    * ([[PublicSuffixes.threeLabel]] — `s3.amazonaws.com`-class), the
    * registrable domain is the last FOUR labels; when the last two labels
    * are a known two-label suffix ([[PublicSuffixes.twoLabel]], a static
    * PSL subset incl. the high-traffic PRIVATE-registry platforms —
    * `blogspot.com`-class), the registrable
    * domain is the last THREE labels (`a.b.co.uk` → `b.co.uk` — quota and
    * blocklist keys group by registrant, not by `co.uk`); otherwise the
    * last two (`a.b.example.com` → `example.com`). Hosts with fewer than
    * two labels, or that ARE a bare public suffix, pass through unchanged
    * (declared fallback). The whole thing stays a codegen'd map-only
    * column expression — the suffix membership compiles to an `InSet`
    * literal, no UDF, no join. */
  def registrableDomain(hostCol: Column): Column = {
    val last2 = regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(hostCol, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val last4 = regexp_extract(hostCol, "([^.]+\\.[^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(hostCol.rlike("[^.]+\\.[^.]+\\.[^.]+\\.[^.]+$") &&
        last3.isin(PublicSuffixes.threeLabel: _*), last4)
      .when(hostCol.rlike("[^.]+\\.[^.]+\\.[^.]+$") &&
        last2.isin(PublicSuffixes.twoLabel: _*), last3)
      .when(hostCol.rlike("[^.]+\\.[^.]+$"), last2)
      .otherwise(hostCol)
  }

  /** Canonical URL + domain columns in one map-only projection. */
  def withUrlColumns(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    df.withColumn("canonical_url", canon)
      .withColumn("domain", registrableDomain(host(col("canonical_url"))))
  }

  /** Exact URL-level dedup: one row per canonical URL with the lowest id as
    * the keeper (recrawls/tracking-variant fetches collapse to one page).
    * One shuffle keyed on canonical URL; min/count are map-side partial, so
    * a boilerplate URL crawled millions of times still reduces locally. */
  def urlDedup(df: DataFrame, urlCol: String = "url", idCol: String = "doc_id"): DataFrame =
    df.withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as("keeper_doc_id"), count(lit(1)).as("n_docs"))

  /** Per-domain aggregation with a blocklist verdict — the corpus-audit
    * table a web pipeline reviews before a crawl lands in training data.
    * One domain-keyed shuffle with map-side partials. */
  def domainStats(
      df: DataFrame,
      blockDomains: Seq[String],
      urlCol: String = "url",
      textCol: String = "text"): DataFrame =
    withUrlColumns(df, urlCol)
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).as("n_chars"))
      .withColumn("blocked", col("domain").isin(blockDomains: _*))
      .withColumn("n_kept", when(col("blocked"), lit(0L)).otherwise(col("n_docs")))

  /** Per-domain quota capping (the Dolma / RefinedWeb "no more than N
    * pages per domain" rule — Soldaini et al. 2024; public method): keep at
    * most `cap` documents from every registrable domain, chosen by the
    * engine's deterministic portable hash ([[Sampling.bucket]] of the doc
    * id under `seed`) so the surviving subset is reproducible on any
    * cluster and stable under corpus growth within a domain's first `cap`
    * hash ranks.
    *
    * Shape: one map-only URL projection, then a single domain-keyed
    * row_number window over NARROW rows (id, domain, bucket — the text
    * column is joined back by the caller only for survivors). Exact quota
    * semantics necessarily serialize each domain's rank computation on one
    * partition; a mega-domain (the crawl-skew case) stays safe because the
    * window input is ~24 bytes/row, and the approximate escape hatch at
    * extreme skew is rate-based [[Sampling.stratifiedSample]] with
    * `rate = cap / est_count`, which is map-only. */
  def domainCap(
      df: DataFrame,
      cap: Int,
      seed: String,
      urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame = {
    require(cap >= 1, s"cap must be positive: $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(col("__bucket"), col(idCol))
    withUrlColumns(df, urlCol)
      .select(col(idCol), col("domain"),
        Sampling.bucket(col(idCol), seed).as("__bucket"))
      .withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= cap)
      .drop("__bucket")
  }

  /** Corpus gated on the domain blocklist: the filter stage form of
    * [[domainStats]] — map-only once the url columns are projected (the
    * blocklist is a literal IN; use a broadcast join for blocklists too big
    * to inline in a plan). */
  def filterBlockedDomains(
      df: DataFrame,
      blockDomains: Seq[String],
      urlCol: String = "url"): DataFrame =
    withUrlColumns(df, urlCol).filter(!col("domain").isin(blockDomains: _*))
}
