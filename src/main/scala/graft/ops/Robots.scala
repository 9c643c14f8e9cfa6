package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL-permission verdicts (RFC 9309, the
  * Robots Exclusion Protocol) — the crawl-politeness plane a web-scale
  * ingest pipeline must apply before fetching, and re-apply when
  * retroactively honoring opt-outs over an already-collected corpus.
  * Composes with [[Html.linkGraph]]/[[UrlOps]]: candidate URLs joined
  * by host against parsed rule groups.
  *
  * Not reference surface (`/root/reference/` ingests typed rows) —
  * engine-extension surface, like [[Html]]/[[WebGraph]].
  *
  * Spark shape: parsing is split+posexplode+window over LINES (group
  * structure is a running sum over the line sequence — one window per
  * host, no driver state); matching is a host-keyed join of skinny
  * (host, agent, rule) rows against URLs with a rank-by-specificity
  * window. Nothing leaves the engine; every step is SQL-replayable.
  *
  * Pattern subset, documented: `*` wildcards and a trailing `$` anchor
  * per RFC 9309 §2.2.3, compiled to LIKE patterns (`*`→`%` with
  * `%`/`_`/`\` backslash-escaped — Spark's default LIKE escape; a
  * DuckDB replay would need an explicit `ESCAPE '\'` clause, so the
  * oracles replay planted verdicts instead). Rule specificity = octet
  * length of the raw rule, Allow wins ties (RFC 9309 §2.2.2).
  */
object Robots {

  /** Parse robots.txt content into bound rule rows: one row per
    * (agent, directive) pair — a group's rules repeat for EACH of its
    * `User-agent` lines, which is the RFC's semantic expansion.
    *
    * Grammar walked: `key: value` lines, `#` comments stripped, keys
    * case-insensitive; group = a maximal run of consecutive
    * `User-agent` lines plus every allow/disallow/crawl-delay line
    * until the next run starts. Rules BEFORE any User-agent line are
    * invalid per RFC and dropped. `Sitemap` is group-independent and
    * emitted with agent NULL.
    *
    * @param df       one row per robots.txt document
    * @param keyCol   host (or any id) column to carry through
    * @param contentCol robots.txt text column
    * @return (keyCol, pos, agent, directive, value) — pos is the
    *         source line number of the directive (0-based), agent is
    *         lowercased, directive ∈ {allow, disallow, crawl-delay,
    *         sitemap}.
    */
  def robotsRules(df: DataFrame, keyCol: String, contentCol: String): DataFrame = {
    val lines = df
      .select(col(keyCol), posexplode(split(col(contentCol), "\n"))
        .as(Seq("pos", "__line")))
      .select(col(keyCol), col("pos"),
        trim(regexp_replace(col("__line"), "#.*$", "")).as("__line"))
      .filter(col("__line") =!= "")
      .select(col(keyCol), col("pos"),
        lower(trim(regexp_extract(col("__line"), "^([A-Za-z-]+)\\s*:", 1)))
          .as("key"),
        trim(regexp_extract(col("__line"), "^[A-Za-z-]+\\s*:(.*)$", 1))
          .as("value"))
      .filter(col("key").isin("user-agent", "allow", "disallow",
        "crawl-delay", "sitemap"))

    val w = Window.partitionBy(keyCol).orderBy("pos")
    // a group starts at each User-agent line whose predecessor (among
    // GROUP-RELEVANT lines) is NOT a User-agent line. Sitemap is a
    // non-group record (RFC 9309 §2.2.4): it must be excluded BEFORE
    // the lag, or a Sitemap line between two User-agent lines would
    // split the run and orphan the first agent with zero rules.
    val grouped = lines
      .filter(col("key") =!= "sitemap")
      .withColumn("__isUa", (col("key") === "user-agent").cast("int"))
      .withColumn("__runStart",
        (col("__isUa") === 1 &&
          coalesce(lag(col("__isUa"), 1).over(w), lit(0)) === 0).cast("int"))
      .withColumn("__grp", sum(col("__runStart")).over(w))

    val agents = grouped.filter(col("key") === "user-agent")
      .select(col(keyCol), col("__grp"), lower(col("value")).as("agent"))
    val rules = grouped
      .filter(col("key").isin("allow", "disallow", "crawl-delay") &&
        col("__grp") > 0) // rules before any User-agent line are invalid
      .select(col(keyCol), col("__grp"), col("pos"),
        col("key").as("directive"), col("value"))
    val bound = rules.join(agents, Seq(keyCol, "__grp"))
      .select(col(keyCol), col("pos"), col("agent"),
        col("directive"), col("value"))
    val sitemaps = lines.filter(col("key") === "sitemap")
      .select(col(keyCol), col("pos"), lit(null).cast("string").as("agent"),
        col("key").as("directive"), col("value"))
    bound.unionByName(sitemaps)
  }

  /** Sitemap entries (sitemaps.org 0.9 — the discovery channel the
    * robots.txt `Sitemap:` directive points at): one row per
    * `<url>`/`<sitemap>` block with `<loc>` (whitespace-trimmed,
    * XML-entity-decoded — URLs legally carry `&amp;`) and optional
    * `<lastmod>` kept PAIRED via per-block transform (the
    * [[Html.anchors]] recipe: independent extract_all passes misalign
    * when a block omits lastmod). Blocks without a `<loc>` are invalid
    * and dropped. Works for both urlset and sitemapindex documents.
    *
    * @return (keep..., entry_idx, loc, lastmod) — lastmod NULL when
    *         absent.
    */
  def sitemapEntries(df: DataFrame, xmlCol: String,
                     keepCols: Seq[String] = Nil): DataFrame = {
    val blocks = regexp_extract_all(col(xmlCol),
      lit("(?is)<(?:url|sitemap)>.*?</(?:url|sitemap)>"), lit(0))
    val entries = transform(blocks, b => {
      val loc = regexp_extract(b, "(?is)<loc>\\s*(.*?)\\s*</loc>", 1)
      val lastmod = regexp_extract(b, "(?is)<lastmod>\\s*(.*?)\\s*</lastmod>", 1)
      struct(
        when(loc === "", lit(null)).otherwise(
          // XML entity decode, &amp; last (the Html.entities order)
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(loc, "&lt;", "<"), "&gt;", ">"),
            "&quot;", "\""), "&#39;", "'"), "&amp;", "&")).as("loc"),
        when(lastmod === "", lit(null)).otherwise(lastmod).as("lastmod"))
    })
    val keep = keepCols.map(col)
    df.select(keep :+ posexplode(entries).as(Seq("entry_idx", "__e")): _*)
      .filter(col("__e.loc").isNotNull)
      .select(keep ++ Seq(col("entry_idx"), col("__e.loc").as("loc"),
        col("__e.lastmod").as("lastmod")): _*)
  }

  /** RFC 9309 rule pattern → LIKE pattern: strip one trailing `$`
    * anchor (exact match — no trailing `%`), escape LIKE specials with
    * backslash (Spark's default LIKE escape), `*` → `%`. NOTE: DuckDB's
    * bare LIKE has NO default escape character — a SQL replay of these
    * patterns needs an explicit `ESCAPE '\'` clause; the q148 oracle
    * replays planted verdicts instead of the patterns.
    */
  private def likePattern(rule: Column): Column = {
    val anchored = rule.endsWith("$")
    val base = when(anchored, rule.substr(lit(1), length(rule) - 1))
      .otherwise(rule)
    val escaped = regexp_replace(
      regexp_replace(base, "([\\\\%_])", "\\\\$1"), "\\*", "%")
    when(anchored, escaped).otherwise(concat(escaped, lit("%")))
  }

  /** RFC 9309 group selection: the agent's own group shadows `*`
    * entirely. Returns (__rhost, agent_used, directive, value) for the
    * winning group's rules only — shared by [[urlAllowed]] and
    * [[fetchSchedule]] so verdicts and politeness can never disagree
    * about which group governs a host.
    */
  private def selectedRules(rules: DataFrame, rulesHostCol: String,
                            agent: Column): DataFrame = {
    val wHost = Window.partitionBy("__rhost")
    rules
      .filter(col("agent") === agent || col("agent") === "*")
      .withColumnRenamed(rulesHostCol, "__rhost")
      .withColumn("__hasSpecific",
        max((col("agent") === agent).cast("int")).over(wHost))
      .filter((col("agent") === agent) === (col("__hasSpecific") === 1))
      .select(col("__rhost"), col("agent").as("agent_used"),
        col("directive"), col("value"))
  }

  /** The matching half of [[urlAllowed]], over an already-selected rule
    * frame — factored so [[fetchSchedule]] derives verdicts and delays
    * from ONE [[selectedRules]] subtree (identical subplans, so the
    * engine can reuse the parse/selection exchanges instead of
    * shuffling the robots plane twice).
    */
  private def verdicts(urls: DataFrame, idCol: String, hostCol: String,
                       pathCol: String, selected: DataFrame): DataFrame = {
    val pathRules = selected
      .filter(col("directive").isin("allow", "disallow") &&
        // RFC 9309: an EMPTY Allow/Disallow value matches nothing —
        // "Disallow:" is the ubiquitous allow-all idiom; compiling it
        // to LIKE '%' would invert it into disallow-everything
        col("value") =!= "")
      .withColumn("__pat", likePattern(col("value")))
    val matches = urls
      .join(pathRules, urls(hostCol) === pathRules("__rhost"))
      .filter(expr(s"`$pathCol` LIKE `__pat`"))
    val wUrl = Window.partitionBy(idCol)
      .orderBy(length(col("value")).desc,
        (col("directive") === "allow").desc, col("value"))
    val winners = matches
      .withColumn("__rk", row_number().over(wUrl))
      .filter(col("__rk") === 1)
      .select(col(idCol), col("agent_used"),
        col("value").as("matched_rule"),
        (col("directive") === "allow").as("allowed"))
    urls.join(winners, Seq(idCol), "left")
      .withColumn("allowed", coalesce(col("allowed"), lit(true)))
  }

  /** Per-URL crawl verdicts for one agent: RFC 9309 group selection
    * (the agent's own group when the host has one, else `*`), then
    * longest-match over allow/disallow rules (Allow wins ties), default
    * allow when nothing matches — including hosts with no robots.txt
    * at all (left join) and empty-valued rules (match nothing).
    *
    * Scale shape: rules are skinny (host, agent, rule) rows — ~rules
    * per host, independent of URL count; the URL frame joins them once
    * on host and each URL keeps at most one winner row (rank window
    * keyed by the URL row, partition-local after the join).
    *
    * @param urls     frame with a UNIQUE id, host and path columns
    *                 (plus anything to keep); the id must be unique —
    *                 a synthesized nondeterministic id re-evaluated on
    *                 both sides of the final join would be a
    *                 correctness trap, so the caller provides it
    * @param rules    [[robotsRules]] output for the same hosts
    * @param agent    crawler product token, matched lowercase-exact
    * @return urls columns + (agent_used, matched_rule, allowed)
    */
  def urlAllowed(urls: DataFrame, idCol: String, hostCol: String,
                 pathCol: String, rules: DataFrame, rulesHostCol: String,
                 agent: String): DataFrame =
    verdicts(urls, idCol, hostCol, pathCol,
      selectedRules(rules, rulesHostCol, lower(lit(agent))))

  /** Politeness schedule: [[urlAllowed]] survivors slotted per host at
    * the governing group's `Crawl-delay` (the de-facto extension most
    * crawlers honor; `defaultDelaySec` when the group sets none — also
    * the value robots-less hosts get). Deterministic: slots are
    * assigned in (path, id) order within each host, `fetch_at_s` =
    * slot × delay. One window per host over the skinny URL frame —
    * the frontier-sharding shape: a host's queue lives in one
    * partition, hosts spread across the cluster.
    *
    * @return urls columns + (agent_used, matched_rule, allowed=true,
    *         delay_s, slot, fetch_at_s) — disallowed URLs are dropped,
    *         not scheduled.
    */
  def fetchSchedule(urls: DataFrame, idCol: String, hostCol: String,
                    pathCol: String, rules: DataFrame, rulesHostCol: String,
                    agent: String, defaultDelaySec: Int = 0): DataFrame = {
    val selected = selectedRules(rules, rulesHostCol, lower(lit(agent)))
    val delays = selected
      .filter(col("directive") === "crawl-delay")
      .groupBy("__rhost")
      // min: the conservative read when a group repeats the directive
      .agg(min(col("value").cast("int")).as("__delay"))
    val allowed = verdicts(urls, idCol, hostCol, pathCol, selected)
      .filter(col("allowed"))
    val wHost = Window.partitionBy(hostCol).orderBy(pathCol, idCol)
    allowed
      .join(delays, allowed(hostCol) === delays("__rhost"), "left")
      .withColumn("delay_s",
        coalesce(col("__delay"), lit(defaultDelaySec)).cast("long"))
      .withColumn("slot", (row_number().over(wHost) - 1).cast("long"))
      .withColumn("fetch_at_s", col("slot") * col("delay_s"))
      .drop("__rhost", "__delay")
  }
}
