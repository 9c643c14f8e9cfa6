package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL-plane curation — the C4/RefinedWeb front gate of a web-corpus
  * pipeline (Raffel et al. JMLR'20 §2.2, Penedo et al. NeurIPS'23 §3.1):
  * canonicalize URLs, extract (registrable) domains, drop blocklisted
  * domains, dedup by canonical URL, cap per-host document counts.
  *
  * Everything is ordered `regexp_replace`/`regexp_extract` built-ins —
  * codegen'd, zero UDFs, zero shuffles for the per-row plane (dedup and
  * caps are skinny window/agg passes over (id, url), never the text) —
  * and every regex is RE2-compatible (no lookaround), so a DuckDB oracle
  * replays each step byte-for-byte.
  *
  * Scale shape: canonicalization/domains are pure projections; URL dedup
  * shuffles only (canonical_url, id) pairs; per-host caps shuffle
  * (host, id). At 100 TB the text column never moves — curation verdicts
  * join back by id.
  */
object UrlOps {

  /** Canonical form: fragment dropped; scheme+host lowercased (path and
    * query case PRESERVED — they are case-significant per RFC 3986);
    * `utm_*`/`fbclid`/`gclid` tracking params stripped; separator debris
    * tidied; default ports (:80/:443) dropped; a bare-host trailing
    * slash removed. Steps are ordered so each regex sees its
    * predecessor's normal form.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // lowercase ONLY the scheme://host[:port] prefix
    val lowered = concat(
      lower(regexp_extract(noFrag, "^([^/]*//[^/?#]*)", 1)),
      regexp_replace(noFrag, "^[^/]*//[^/?#]*", ""))
    // (?i): tracking params are stripped case-insensitively — query-string
    // case is preserved by canonicalization, so without it ?UTM_SOURCE=…
    // would survive and defeat dedupByCanonicalUrl. Inline flag (not an
    // engine option) so the DuckDB oracle reuses the identical pattern.
    val noTrack = regexp_replace(lowered,
      "(?i)([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*", "$1")
    val tidyQ = regexp_replace(regexp_replace(regexp_replace(noTrack,
      "\\?&+", "?"), "&&+", "&"), "[?&]+$", "")
    val noPort = regexp_replace(tidyQ, "(://[^/:?#]+):(80|443)([/?#]|$)", "$1$3")
    regexp_replace(noPort, "^([a-z]+://[^/?#]+)/$", "$1")
  }

  /** Lowercased host (userinfo and port excluded). Empty string when the
    * value does not parse as scheme://host…
    */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)", 1))

  /** Registrable domain under the Public Suffix List ([[Psl]], bundled
    * publicsuffix.org snapshot, MPL 2.0) — the grouping unit for
    * blocklists and caps. PSL precedence as a when-chain: exception
    * rules first, then rule tiers deepest-first (longest rule wins),
    * else the PSL default rule `*` (registrable = last two labels,
    * which is also what unknown TLDs get). A host that IS a public
    * suffix (`github.io` itself) resolves to '' — no registrable
    * domain. Still a pure regex projection: zero shuffle, zero UDFs,
    * and every tier's regex replays byte-identically in the DuckDB
    * oracle via [[Psl.duckDomainCase]].
    */
  def registrableDomain(url: Column): Column = {
    val host = hostOf(url)
    val withTiers = Psl.depths.foldLeft(
      when(host.rlike(Psl.exceptionCondRegex),
        regexp_extract(host, Psl.exceptionExtractRegex, 1))) { (chain, d) =>
      chain.when(host.rlike(Psl.condRegex(d)),
        regexp_extract(host, Psl.extractRegex(d), 1))
    }
    withTiers.otherwise(regexp_extract(host, Psl.fallbackExtractRegex, 1))
  }

  /** Rows whose registrable domain is NOT in `blocked`. The list rides
    * the plan as literals (a short blocklist is config, not data); for
    * corpus-scale blocklists use the DataFrame overload.
    */
  def dropBlockedDomains(df: DataFrame, urlCol: String,
                         blocked: Seq[String]): DataFrame =
    df.filter(!registrableDomain(col(urlCol))
      .isin(blocked.map(_.toLowerCase): _*))

  /** Table-sourced blocklist: anti-join on the registrable domain. At
    * corpus scale a blocklist is millions of domains — a literal list
    * stops being config. The join key is the skinny domain projection
    * only (the text plane never moves); Catalyst picks broadcast vs
    * shuffle from the blocklist's size stats (a small table
    * broadcast-anti-joins — asserted in PlanSpec — and a huge one
    * degrades to a shuffle on (domain) pairs).
    */
  def dropBlockedDomains(df: DataFrame, urlCol: String,
                         blocked: DataFrame, domainCol: String): DataFrame = {
    val b = blocked.select(lower(col(domainCol)).as("__blocked_domain")).distinct()
    df.join(b, registrableDomain(col(urlCol)) === col("__blocked_domain"),
      "left_anti")
  }

  /** First-id-wins dedup by canonical URL: one row per canonical form,
    * smallest `idCol` survives (deterministic, replay-stable). Shuffles
    * only (canonical, id) — the text never moves.
    */
  def dedupByCanonicalUrl(df: DataFrame, idCol: String,
                          urlCol: String): DataFrame = {
    val w = Window.partitionBy(canonicalizeUrl(col(urlCol)))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Keep at most `cap` documents per host, chosen in deterministic
    * md5-hash order (the [[Curation.hashBucket]] rationale: reproducible
    * and as good as random — never rand()).
    */
  def capPerHost(df: DataFrame, idCol: String, urlCol: String,
                 cap: Int): DataFrame = {
    require(cap >= 1, "cap must be positive")
    val w = Window.partitionBy(hostOf(col(urlCol)))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
  }
}
