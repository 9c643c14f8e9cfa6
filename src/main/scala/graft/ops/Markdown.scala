package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markdown → text extraction: the [[Html]] sibling for the other big
  * documentation corpus format (READMEs, docs sites, wikis). Ordered
  * regexp_replace chain in the Java∩RE2 subset, all codegen built-ins.
  *
  * Chain (order is semantic): fenced code blocks unfence KEEPING their
  * content (training corpora keep code; only the ``` fences and the
  * info string drop) → inline-code backticks drop → images become
  * their alt text → links become their anchor text (images first —
  * the `!` prefix must not survive as stray punctuation) → ATX header
  * markers, blockquote markers, list bullets/numbers and horizontal
  * rules drop at line starts (`(?m)`) → emphasis runs of `*` drop
  * (`_` is deliberately NOT stripped: snake_case identifiers are
  * ubiquitous in exactly the corpora this processes) → whitespace
  * collapses via the [[Html.collapseWs]] chain.
  *
  * Documented single-pass trade: content inside code spans flows
  * through the same chain (a `*`-heavy code block would lose its
  * asterisks) — protecting spans needs a split/explode path; for
  * corpus text extraction the single projection wins.
  */
object Markdown {

  val fencePat = "(?s)```[^\\n]*\\r?\\n(.*?)```"
  val inlineCodePat = "`([^`\\n]*)`"
  val imagePat = "!\\[([^\\]]*)\\]\\([^)]*\\)"
  val linkPat = "\\[([^\\]]*)\\]\\([^)]*\\)"
  val headerPat = "(?m)^#{1,6}[ \\t]*"
  val quotePat = "(?m)^>[ \\t]?"
  val bulletPat = "(?m)^[ \\t]*[-*+][ \\t]+"
  val numberPat = "(?m)^[ \\t]*\\d+\\.[ \\t]+"
  val rulePat = "(?m)^(-{3,}|\\*{3,})[ \\t]*$"
  val emphasisPat = "\\*{1,3}"

  /** Extracted plain text of a markdown document (chain above). */
  def markdownToText(md: Column): Column = {
    val unfenced = regexp_replace(md, fencePat, "$1")
    val noInline = regexp_replace(unfenced, inlineCodePat, "$1")
    val noImages = regexp_replace(noInline, imagePat, "$1")
    val noLinks = regexp_replace(noImages, linkPat, "$1")
    val noHeaders = regexp_replace(noLinks, headerPat, "")
    val noQuotes = regexp_replace(noHeaders, quotePat, "")
    val noRules = regexp_replace(noQuotes, rulePat, "")
    val noBullets = regexp_replace(
      regexp_replace(noRules, bulletPat, ""), numberPat, "")
    Html.collapseWs(regexp_replace(noBullets, emphasisPat, ""))
  }

  private val mdLinkElem = "!?\\[[^\\]]*\\]\\([^)]*\\)"

  /** All links as (text, url, is_image) structs, TRUE document order —
    * whole elements extracted then fields recovered per element (the
    * [[Html.anchors]] pairing recipe). Fenced blocks and inline code
    * are REMOVED first: `handlers[0](event)` inside a code span is
    * indexing-plus-call syntax, not a link, and code-heavy READMEs are
    * exactly this operator's corpus.
    */
  def links(md: Column): Column = {
    val noCode = regexp_replace(
      regexp_replace(md, fencePat, " "), inlineCodePat, " ")
    transform(regexp_extract_all(noCode, lit(mdLinkElem), lit(0)), e => struct(
      regexp_extract(e, "\\[([^\\]]*)\\]", 1).as("text"),
      regexp_extract(e, "\\]\\(([^)]*)\\)", 1).as("url"),
      e.startsWith("!").as("is_image")))
  }
}
