package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Code-corpus curation: license detection and comment-density metrics —
  * the gates a code-training pipeline runs first (BigCode/StarCoder
  * train on permissive-license files only; The Stack ships SPDX-keyed
  * license metadata). All per-row regex projections, codegen'd.
  */
object Code {

  /** Detected license id: an explicit `SPDX-License-Identifier:` tag
    * wins (the machine-readable convention — taken verbatim), else the
    * canonical phrases of the common licenses (MIT's "permission is
    * hereby granted", Apache-2.0, GPL family, MPL, BSD's
    * "redistribution and use"), else 'unknown'. Phrase probes are
    * case-insensitive substring-class regexes — RE2∩Java, replayable.
    */
  def license(text: Column): Column = {
    // full SPDX EXPRESSION — capturing just the first token would
    // misclassify "MIT AND GPL-3.0-only" as MIT — but ONLY a valid
    // expression shape `id ((AND|OR|WITH) id)*` (optional parens):
    // tokens may only follow an operator, so same-line trailing prose
    // ("MIT - see LICENSE", "MIT */") stops the match after MIT
    // instead of being absorbed into the id
    val spdxTok = "[()]*[A-Za-z0-9.+\\-]+[()]*"
    val spdx = trim(regexp_extract(text,
      s"(?im)SPDX-License-Identifier:[ \\t]*($spdxTok" +
        s"(?:[ \\t]+(?:AND|OR|WITH)[ \\t]+$spdxTok)*)", 1))
    when(spdx =!= "", spdx)
      .when(text.rlike("(?is)permission is hereby granted, free of charge"),
        "MIT")
      .when(text.rlike("(?is)licensed under the apache license,? version 2"),
        "Apache-2.0")
      .when(text.rlike("(?is)gnu (lesser |affero )?general public license"),
        "GPL")
      // phrase probes cannot see the version — report the FAMILY and
      // let the allowlist stay conservative (MPL-1.1 text labeled
      // "MPL-2.0" would overclaim)
      .when(text.rlike("(?is)mozilla public license"), "MPL")
      // the 4-clause advertising variant shares the redistribution
      // phrase but is excluded by BigCode-style gates
      .when(text.rlike("(?is)redistribution and use in source and binary forms"),
        when(text.rlike("(?is)all advertising materials"), "BSD-4-Clause")
          .otherwise(lit("BSD")))
      .otherwise(lit("unknown"))
  }

  private val allow = Seq("MIT", "Apache-2.0", "BSD", "BSD-2-Clause",
    "BSD-3-Clause", "ISC", "MPL-2.0", "Unlicense", "0BSD", "Zlib")

  /** Permissive verdict over a [[license]] value — the BigCode-style
    * training gate. Explicit allowlist, not a denylist: unknown,
    * family-only (MPL without a version) and BSD-4-Clause are NOT
    * permissive. SPDX EXPRESSIONS evaluate conservatively: with any
    * `AND` (or a `WITH` exception), every operand token must be
    * allowlisted; with `OR` alone, one allowlisted operand suffices.
    */
  def permissive(lic: Column): Column = {
    val cleaned = regexp_replace(lic, "[()]", "")
    val toks = filter(split(trim(cleaned), "\\s+"),
      t => !upper(t).isin("AND", "OR", "WITH") && t =!= "")
    val allPerm = forall(toks, t => t.isin(allow.map(x => lit(x)): _*))
    val anyPerm = exists(toks, t => t.isin(allow.map(x => lit(x)): _*))
    when(cleaned.rlike("(?i)\\b(and|with)\\b"), allPerm).otherwise(anyPerm)
  }

  /** Comment-line accounting: lines whose trimmed text starts with a
    * comment marker (`//`, `#`, `--`, `*`, or slash-star) vs non-blank
    * lines. One array projection — no explode, no shuffle.
    */
  def commentStats(text: Column): Column = {
    val lines = split(text, "\n")
    val nonBlank = filter(lines, l => trim(l) =!= "")
    val comments = filter(nonBlank,
      l => trim(l).rlike("^(//|#|--|\\*|/\\*)"))
    struct(size(nonBlank).cast("long").as("n_nonblank"),
      size(comments).cast("long").as("n_comment"))
  }
}
