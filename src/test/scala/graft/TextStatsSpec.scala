package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ArrayMath
import graft.ops.TextOps

/** The one-pass TextStats kernel must agree with the declarative HOF
  * spellings on real fixture documents — that equivalence is what lets
  * q22/q24 keep their DuckDB oracles after the kernel switch.
  */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("kernel counts == HOF counts on all fixture documents") {
    val docs = Tables.documents(spark, sf)
    val cmp = docs.select(
      ArrayMath.textStats(col("text")).as("st"),
      TextOps.tokenCount(col("text")).as("hof_tokens"),
      size(filter(TextOps.tokens(lower(col("text"))),
        t => t.isInCollection(TextOps.stopwordList))).cast("long").as("hof_stop"),
      aggregate(TextOps.tokens(col("text")), lit(0L),
        (acc, t) => acc + length(t)).as("hof_tok_chars"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[\\p{Punct}]", ""))).cast("long").as("hof_punct"))
    val bad = cmp.filter(
      col("st.n_tokens") =!= col("hof_tokens") ||
        col("st.n_stop") =!= col("hof_stop") ||
        col("st.tok_chars") =!= col("hof_tok_chars") ||
        col("st.n_punct") =!= col("hof_punct"))
    assert(bad.isEmpty, bad.collect().take(3).mkString("\n"))
  }

  test("kernel handles whitespace runs, empty, unicode") {
    import spark.implicits._
    val df = Seq("  the   cat  ", "", "héllo wörld!", "a\tb\nc").toDF("text")
    val rows = df.select(ArrayMath.textStats(col("text")).as("st"))
      .select("st.n_tokens", "st.n_stop", "st.n_punct").collect()
    assert(rows(0).getLong(0) == 2 && rows(0).getLong(1) == 1) // "the" is a stopword
    assert(rows(1).getLong(0) == 0)
    assert(rows(2).getLong(0) == 2 && rows(2).getLong(2) == 1) // one '!'
    assert(rows(3).getLong(0) == 3)
  }

  test("kernel-based langId query agrees with TextOps.langId") {
    val viaOps = Tables.documents(spark, sf)
      .select(TextOps.langId(col("text")).as("predicted_lang"))
      .groupBy("predicted_lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaKernel = SparkEntry.queries("q24_langid")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaKernel == viaOps)
  }

  test("dedupLinesWithinDoc: first spelling survives, blanks are structure, NULL/empty safe") {
    import spark.implicits._
    import graft.ops.TextOps
    val df = Seq(
      (1L, "a\n  dup  \nb\ndup\n\n\ndup\nc"),
      (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextOps.dedupLinesWithinDoc(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // trimmed identity dedups '  dup  ' vs 'dup' but keeps the FIRST
    // spelling; BOTH blank lines survive (structure, not content)
    assert(got(0).getString(1) == "a\n  dup  \nb\n\n\nc" &&
      got(0).getLong(2) == 8L && got(0).getLong(3) == 2L)
    assert(got(1).getString(1) == "" && got(1).getLong(3) == 0L)
    assert(got(2).isNullAt(1) && got(2).getLong(2) == 0L)
  }

  test("removeDupSpans: cross-doc and within-doc spans cut; short/NULL docs pass") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),   // shares "c d e"/"d e f" with doc 2
      (2L, "x x c d e f y z"),
      (3L, "p q r"),             // exactly k tokens, window unique
      (4L, "s t"),               // shorter than k: passes verbatim
      (5L, "m n o m n o m n"),   // self-repeating: whole doc duplicated
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps.removeDupSpans(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(got(0).getString(1) == "a b g h" && got(0).getLong(2) == 8L &&
      got(0).getLong(3) == 4L)
    assert(got(1).getString(1) == "x x y z" && got(1).getLong(3) == 4L)
    assert(got(2).getString(1) == "p q r" && got(2).getLong(3) == 0L)
    assert(got(3).getString(1) == "s t" && got(3).getLong(3) == 0L)
    assert(got(4).getString(1) == "" && got(4).getLong(2) == 8L &&
      got(4).getLong(3) == 8L,
      "a fully self-repeating doc must be cut to empty")
    assert(got(5).isNullAt(1) && got(5).getLong(2) == 0L)
    // stats agree with the cut masses
    val st = TextOps.dupSpanStats(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(st.toSeq == Seq((1L, 8L, 1L, 4L), (2L, 8L, 1L, 4L),
      (3L, 3L, 0L, 0L), (4L, 2L, 0L, 0L), (5L, 8L, 1L, 8L),
      (6L, 0L, 0L, 0L)))
  }

  test("readability: hand counts and scores; empty text reports NULL") {
    import spark.implicits._
    val docs = Seq((1L, "The cat sat. The dog ran!"), (2L, "   "))
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.readability(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r = got(0)
    assert(r.getLong(1) == 6L && r.getLong(2) == 2L && r.getLong(3) == 6L,
      s"counts ${r.toSeq}")
    assert(math.abs(r.getDouble(4) - (206.835 - 1.015 * 3 - 84.6)) < 1e-9)
    assert(math.abs(r.getDouble(5) - (0.39 * 3 + 11.8 - 15.59)) < 1e-9)
    assert(got(1).isNullAt(4) && got(1).isNullAt(5),
      "blank text must not divide by zero")
  }

  test("zipfFit: a planted 1/r corpus fits slope -1 with r2 ~ 1") {
    import spark.implicits._
    // token w<r> appears round(1200/r) times, r = 1..60: exact Zipf head
    val words = (1 to 60).flatMap(r =>
      Seq.fill(math.round(1200.0 / r).toInt)(s"w$r"))
    val docs = words.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val got = graft.ops.TextOps.zipfFit(docs, "text", topK = 60).head()
    assert(got.getLong(0) == 60L)
    val slope = got.getDouble(1)
    val r2 = got.getDouble(3)
    assert(slope > -1.05 && slope < -0.95, s"slope $slope")
    assert(r2 > 0.999, s"r2 $r2")
  }

  test("textRankKeywords: the hub word of a planted star graph ranks first") {
    import spark.implicits._
    val docs = Seq(
      "core alpha core beta core gamma core delta",
      "Short-w0rds & the of stopwords! vanish core echo").toDF("text")
    val got = graft.ops.TextOps.textRankKeywords(docs, "text", iterations = 6)
      .orderBy(org.apache.spark.sql.functions.col("rank").desc,
        org.apache.spark.sql.functions.col("token"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.nonEmpty)
    assert(got.head._1 == "core", s"hub must rank first: ${got.toSeq}")
    assert(got.forall(_._1.matches("^[a-z]{3,}$")),
      "only lowercase alphabetic tokens of length >= 3 enter the graph")
    assert(!got.map(_._1).contains("the"), "stopwords are excluded")
  }
}
