package graft.ops

/** Public Suffix List resolution — the registrable-domain rule real web
  * corpora need (`a.ne.jp` → `a.ne.jp`'s owner is `a`, not `ne`;
  * `x.github.io` is its own registrant under the PSL PRIVATE section).
  *
  * Rules come from a bundled snapshot of the Mozilla Public Suffix List
  * (publicsuffix.org, MPL 2.0 — see the resource header; the full list
  * is a drop-in). The PSL algorithm (https://publicsuffix.org/list/):
  * among matching rules the EXCEPTION rule wins, else the rule with the
  * most labels; the public suffix is the matched rule (exception rules
  * minus their leftmost label); the registrable domain is the suffix
  * plus one more label. Hosts matching no rule use the default rule
  * `*` — suffix = last label, registrable = last two labels.
  *
  * Compiled here into PER-DEPTH anchored alternation regexes so
  * resolution stays a pure codegen'd projection (zero shuffle, zero
  * UDFs, no broadcast table to hydrate) and — critically for the
  * oracle — the SAME regex strings replay in DuckDB's RE2
  * (`regexp_matches`/`regexp_extract`): no lookaround, only literal
  * labels, `[^.]+` wildcards, and `(?:…)` groups. Longest-rule-wins
  * becomes a when-chain from the deepest tier down; a host that IS a
  * public suffix extracts '' (no registrable domain) in both engines.
  *
  * Scale shape: a ~300-alternative anchored literal alternation per
  * tier, evaluated on the skinny host column only — at 100 TB this is
  * per-row projection work that never touches the text plane.
  */
object Psl {

  /** Snapshot rules in PSL line format ('!' exception, '*' wildcard
    * label), comments/blank lines stripped.
    */
  val rules: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.dat")
    require(in != null, "missing resource graft/public_suffix_snapshot.dat")
    try {
      val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toVector
      lines.foreach { l =>
        require(l.matches("^!?[a-z0-9*][a-z0-9.*-]*$"),
          s"PSL snapshot line is not a plain rule: '$l'")
      }
      lines
    } finally in.close()
  }

  /** Exception rules (leading '!' stripped), e.g. `www.ck`. */
  val exceptionRules: Seq[String] = rules.filter(_.startsWith("!")).map(_.drop(1))

  /** Non-exception rules compiled to regex fragments, grouped by label
    * depth: `co.uk` → `co\.uk` at depth 2; `*.ck` → `[^.]+\.ck`, also
    * depth 2 (the wildcard label counts — the rule denotes any
    * `<label>.ck` suffix), so wildcards fold into the same tier as
    * explicit rules of equal depth.
    */
  private val byDepth: Map[Int, Seq[String]] =
    rules.filterNot(_.startsWith("!")).map { r =>
      val labels = r.split('.')
      val pat = labels.map {
        case "*" => "[^.]+"
        case l   => l // validated [a-z0-9-]: no regex metacharacters
      }.mkString("\\.")
      labels.length -> pat
    }.groupBy(_._1).map { case (d, ps) => d -> ps.map(_._2).distinct }

  /** Rule depths, deepest first — the PSL longest-rule-wins order. */
  val depths: Seq[Int] = byDepth.keys.toSeq.sorted.reverse

  private def alt(pats: Seq[String]): String = pats.mkString("|")

  /** Host MATCHES a suffix rule at this depth (as the whole host or
    * with labels above it).
    */
  def condRegex(depth: Int): String =
    "(^|\\.)(?:" + alt(byDepth(depth)) + ")$"

  /** Extract registrable domain = one label + a depth-`depth` suffix;
    * no match (host IS the suffix) yields '' in Spark and DuckDB alike.
    */
  def extractRegex(depth: Int): String =
    "([^.]+\\.(?:" + alt(byDepth(depth)) + "))$"

  /** Host ends with an exception rule (e.g. `www.ck`, or below it). */
  val exceptionCondRegex: String =
    "(^|\\.)(?:" + alt(exceptionRules.map(_.replace(".", "\\."))) + ")$"

  /** For an exception rule the rule ITSELF is the registrable domain
    * (PSL: drop the rule's leftmost label to get the suffix, then add
    * one label back — which reconstructs the rule).
    */
  val exceptionExtractRegex: String =
    "((?:" + alt(exceptionRules.map(_.replace(".", "\\."))) + "))$"

  /** Default-rule fallback: unknown TLD → registrable = last 2 labels. */
  val fallbackExtractRegex: String = "([^.]+\\.[^.]+)$"

  /** DuckDB oracle mirror: the SAME tiers as
    * [[UrlOps.registrableDomain]] as a SQL CASE over `hostExpr` —
    * byte-identical regex strings, so both engines resolve every host
    * through the same rule.
    */
  def duckDomainCase(hostExpr: String): String = {
    val tiers =
      (s"WHEN regexp_matches($hostExpr, '$exceptionCondRegex') " +
        s"THEN regexp_extract($hostExpr, '$exceptionExtractRegex', 1)") +:
      depths.map { d =>
        s"WHEN regexp_matches($hostExpr, '${condRegex(d)}') " +
          s"THEN regexp_extract($hostExpr, '${extractRegex(d)}', 1)"
      }
    tiers.mkString("CASE ", " ", "") +
      s" ELSE regexp_extract($hostExpr, '$fallbackExtractRegex', 1) END"
  }
}
