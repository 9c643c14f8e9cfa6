package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction: the step between WARC ingest
  * (`sources/Sources.scala` `warcRecords`) and every text-plane operator
  * (quality, language-ID, dedup fingerprints). The reference pipeline
  * stops at typed CSV/JSON rows (`/root/reference/dataflow.py:189-199`);
  * a web-scale training corpus starts at raw HTML, so this is
  * engine-extension surface in the C4/CCNet tradition (Raffel et al.
  * 2020 §2.2; Wenzek et al. 2020 §3).
  *
  * Implementation is an ORDERED chain of `regexp_replace` built-ins —
  * every stage stays inside whole-stage codegen and every pattern is
  * written in the common subset of Java regex and RE2 (no lookaround,
  * no backreferences), so a DuckDB oracle can replay the chain with the
  * IDENTICAL pattern strings. The chain (order is semantic):
  *
  *   1. drop comments `<!-- … -->`;
  *   2. drop `script` / `style` / `noscript` elements WITH their
  *      content (one pattern per element — RE2 has no backreferences,
  *      so a single alternation pattern would accept mismatched
  *      open/close pairs like `<script>…</style>`);
  *   3. drop the entire `head` element (after 2, so a `</head>` hiding
  *      inside a script string cannot end it early — scripts are
  *      already gone);
  *   4. block-level tags → newline (both open and close tags: block
  *      boundaries are line boundaries);
  *   5. every remaining tag → space (inline tags must not glue their
  *      neighbouring words together);
  *   6. decode the named/numeric entities a text pipeline must not
  *      leak (`&nbsp; &lt; &gt; &quot; &#39;` and LAST `&amp;` — any
  *      earlier and `&amp;lt;` would double-decode). Decoding AFTER
  *      tag-stripping is load-bearing: `&lt;script&gt;` in source text
  *      must surface as literal text, never as a strippable tag;
  *   7. whitespace normalization: runs of non-newline whitespace → one
  *      space, newline runs (with surrounding spaces) → one newline,
  *      then strip leading/trailing whitespace.
  *
  * Out of scope, documented: CDATA sections, conditional comments,
  * single-quoted/unquoted attribute values inside kept TEXT (attribute
  * values are dropped with their tags anyway), and the long tail of
  * named entities (a full table is a lookup join, not a kernel).
  */
object Html {

  // -- the shared pattern chain (same strings in the DuckDB oracles) ----
  val commentPat = "(?s)<!--.*?-->"
  val scriptPat = "(?is)<script\\b[^>]*>.*?</script\\s*>"
  val stylePat = "(?is)<style\\b[^>]*>.*?</style\\s*>"
  val noscriptPat = "(?is)<noscript\\b[^>]*>.*?</noscript\\s*>"
  val headPat = "(?is)<head\\b[^>]*>.*?</head\\s*>"
  val blockPat =
    "(?i)</?(p|div|br|h[1-6]|li|ul|ol|dl|dt|dd|tr|td|th|table|thead|tbody|" +
      "tfoot|caption|blockquote|pre|form|fieldset|hr|address|center|" +
      "section|article|aside|header|footer|nav|main|figure|figcaption|" +
      "body|html)\\b[^>]*>"
  val tagPat = "(?s)<[^>]*>"
  /** Ordered entity decode; `&amp;` MUST stay last. */
  val entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
  val spacePat = "[ \\t\\r\\f]+"
  val newlinePat = "\\s*\\n\\s*"
  val edgePat = "^\\s+|\\s+$"

  /** Extracted plain text of an HTML document (chain above). */
  def htmlToText(html: Column): Column = {
    val noComments = regexp_replace(html, commentPat, " ")
    val noScript = regexp_replace(noComments, scriptPat, " ")
    val noStyle = regexp_replace(noScript, stylePat, " ")
    val noNoscript = regexp_replace(noStyle, noscriptPat, " ")
    val noHead = regexp_replace(noNoscript, headPat, " ")
    val blocks = regexp_replace(noHead, blockPat, "\n")
    val noTags = regexp_replace(blocks, tagPat, " ")
    collapseWs(decodeEntities(noTags))
  }

  /** Chain step 6 alone (entity names are regex-literal-safe). */
  private def decodeEntities(c: Column): Column =
    entities.foldLeft(c) { case (acc, (e, r)) => regexp_replace(acc, e, r) }

  /** Whitespace-normalize already-tagless text (chain step 7 alone). */
  def collapseWs(c: Column): Column =
    regexp_replace(
      regexp_replace(regexp_replace(c, spacePat, " "), newlinePat, "\n"),
      edgePat, "")

  /** `<title>` text (entity-decoded, whitespace-collapsed); NULL when
    * absent. Separate from [[htmlToText]] because the whole `head`
    * element — title included — is metadata, not body text.
    */
  def extractTitle(html: Column): Column = {
    val raw = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title\\s*>", 1)
    when(raw === "", lit(null)).otherwise(collapseWs(decodeEntities(raw)))
  }

  // `\shref` requires the REAL attribute: `data-href`/`xlink:href`
  // (attribute names merely ending in "href") have no whitespace
  // immediately before the h and must not produce phantom links
  private val hrefDq = "(?is)<a\\b[^>]*\\shref\\s*=\\s*\"([^\"]*)\""
  private val hrefSq = "(?is)<a\\b[^>]*\\shref\\s*=\\s*'([^']*)'"

  /** All anchor `href` values, HTML-entity-DECODED (valid HTML encodes
    * query-string ampersands as `&amp;` — fetch URLs and joins against
    * [[Robots.sitemapEntries]] output need the decoded spelling).
    * Ordering is all double-quoted values then all single-quoted (two
    * RE2-safe passes — a combined pattern needs a backreference on the
    * quote character); use [[anchors]] when true document order
    * matters.
    */
  def extractLinks(html: Column): Column =
    transform(
      concat(regexp_extract_all(html, lit(hrefDq), lit(1)),
        regexp_extract_all(html, lit(hrefSq), lit(1))),
      h => decodeEntities(h))

  /** All anchor elements as (href, text) structs, document order:
    * whole `<a …>…</a>` elements extracted first, then href (either
    * quote style; NULL when absent) and the tag-stripped,
    * entity-decoded, collapsed inner text recovered per element with
    * `transform` — keeping href and text PAIRED, which two independent
    * extract_all passes cannot guarantee when hrefless anchors exist.
    */
  def anchors(html: Column): Column = {
    val elems = regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*>.*?</a\\s*>"), lit(0))
    transform(elems, e => {
      val dq = regexp_extract(e, hrefDq, 1)
      val sq = regexp_extract(e, hrefSq, 1)
      val inner = regexp_extract(e, "(?is)^<a\\b[^>]*>(.*)</a\\s*>$", 1)
      val txt = collapseWs(decodeEntities(regexp_replace(inner, tagPat, " ")))
      struct(decodeEntities(when(dq =!= "", dq).when(sq =!= "", sq))
          .as("href"),
        txt.as("text"))
    })
  }

  /** Anchor-text aggregation by TARGET host — the classic link-context
    * retrieval/quality signal (anchor text describes the page it points
    * at better than the page does). One explode + one aggregation; only
    * (dst_host, anchor-text) pairs shuffle, never the HTML. Texts are
    * sorted-distinct and joined so output is deterministic under any
    * partitioning.
    */
  def anchorTextStats(df: org.apache.spark.sql.DataFrame,
                      htmlCol: String): org.apache.spark.sql.DataFrame =
    df.select(explode(anchors(col(htmlCol))).as("a"))
      .select(UrlOps.hostOf(col("a.href")).as("dst_host"),
        col("a.text").as("atext"))
      .filter(col("dst_host").isNotNull && col("dst_host") =!= "" &&
        col("atext") =!= "")
      .groupBy("dst_host")
      .agg(count(lit(1)).as("n_anchors"),
        array_join(array_sort(collect_set(col("atext"))), "|").as("texts"))

  /** Host-level link graph from an HTML corpus: one row per
    * (src_host, dst_host) with the link count. Only hosts cross the
    * shuffle — the HTML column dies in the per-row projection, which
    * is what makes this viable on a 100 TB crawl.
    */
  def linkGraph(df: org.apache.spark.sql.DataFrame, srcHostCol: String,
                htmlCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(srcHostCol).as("src_host"),
        explode(extractLinks(col(htmlCol))).as("href"))
      .select(col("src_host"), UrlOps.hostOf(col("href")).as("dst_host"))
      .filter(col("dst_host").isNotNull && col("dst_host") =!= "")
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"))
}
