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
    val spdx = regexp_extract(text,
      "(?im)SPDX-License-Identifier:[ \\t]*([A-Za-z0-9.+-]+)", 1)
    when(spdx =!= "", spdx)
      .when(text.rlike("(?is)permission is hereby granted, free of charge"),
        "MIT")
      .when(text.rlike("(?is)licensed under the apache license,? version 2"),
        "Apache-2.0")
      .when(text.rlike("(?is)gnu (lesser |affero )?general public license"),
        "GPL")
      .when(text.rlike("(?is)mozilla public license"), "MPL-2.0")
      .when(text.rlike("(?is)redistribution and use in source and binary forms"),
        "BSD")
      .otherwise(lit("unknown"))
  }

  /** Permissive-allowlist verdict over a [[license]] value — the
    * BigCode-style training gate. Explicit allowlist, not a denylist:
    * an unknown license is NOT permissive.
    */
  def permissive(lic: Column): Column =
    lic.isin("MIT", "Apache-2.0", "BSD", "BSD-2-Clause", "BSD-3-Clause",
      "ISC", "MPL-2.0", "Unlicense", "0BSD", "Zlib")

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
