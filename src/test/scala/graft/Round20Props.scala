package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** Round-20 operator properties: corpus-level keep-first sentence/line
  * dedup (the C4/CCNet/FineWeb recipe) — keep-first totality, structure
  * preservation, and NULL handling against hand-built corpora.
  */
class Round20Props extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("sentenceDedupCorpus: repeated sentence keeps only its global " +
    "first occurrence; first = smallest (id, position)") {
    import spark.implicits._
    val docs = Seq(
      (2L, "Dup one. Unique two."),
      (1L, "Solo here! Dup one. Dup one."),
      (3L, "Dup one.")).toDF("doc_id", "text")
    val got = TextOps.sentenceDedupCorpus(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    // "Dup one." first occurs at (1, 1) — doc 1 keeps ONE copy (its
    // second occurrence at (1,2) is a later duplicate), docs 2 and 3
    // lose theirs entirely
    assert(got(0) == ((1L, "Solo here! Dup one.", 3L, 1L)))
    assert(got(1) == ((2L, "Unique two.", 2L, 1L)))
    assert(got(2) == ((3L, "", 1L, 1L)))
  }

  test("sentenceUnits keeps punctuation with its sentence and does not " +
    "split without following whitespace (abbrev-like '3.14' stays whole)") {
    import spark.implicits._
    val parts = Seq("Pi is 3.14 roughly. Yes!  Indeed?No split")
      .toDF("text")
      .select(TextOps.sentenceUnits(org.apache.spark.sql.functions.col("text")))
      .collect().head.getSeq[String](0)
    assert(parts == Seq("Pi is 3.14 roughly.", "Yes!", "Indeed?No split"))
  }

  test("lineDedupCorpus preserves blank lines and within-doc order; " +
    "NULL text stays NULL; repeated line survives once corpus-wide") {
    import spark.implicits._
    val docs = Seq(
      (10L, "header\nbody ten\n\nfooter"),
      (11L, "header\nbody eleven\n\nfooter"),
      (12L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextOps.lineDedupCorpus(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(got(0) == ((10L, "header\nbody ten\n\nfooter", 4L, 0L)))
    // doc 11 loses header+footer but KEEPS the blank line between its
    // surviving body and nothing — structure is not reflowed
    assert(got(1) == ((11L, "body eleven\n", 4L, 2L)))
    assert(got(2) == ((12L, null, 0L, 0L)))
  }

  test("lineDedupCorpus trims for identity but preserves original " +
    "spelling of the kept occurrence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "  padded line  \nrest"),
      (2L, "padded line\nother")).toDF("doc_id", "text")
    val got = TextOps.lineDedupCorpus(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getString(1) == "  padded line  \nrest")
    assert(got(1).getString(1) == "other")
  }

  test("mojibakeRepair: latin1Garble round-trips 2-byte and 3-byte " +
    "UTF-8 classes back to the original") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val clean = "café — la niña’s résumé…"
    val docs = Seq((1L, clean)).toDF("doc_id", "clean")
      .select(col("doc_id"), TextOps.latin1Garble(col("clean")).as("text"))
    val garbled = docs.collect().head.getString(1)
    assert(garbled.contains("Ã©") && garbled.contains("â"))
    assert(garbled.length > clean.length)
    val r = TextOps.mojibakeRepair(docs, "doc_id", "text").collect().head
    assert(r.getString(1) == clean)
    assert(r.getBoolean(2))
    assert(r.getLong(3) > 0L && r.getLong(5) == 0L)
  }

  test("mojibakeRepair: legitimate accented text, CJK, ASCII and NULL " +
    "all pass through untouched (the triple gate)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "naïve café"),      // legit latin-1: bytes are not UTF-8
      (2L, "wide 中文 text"),   // not latin-1 encodable
      (3L, "plain ascii"),     // round-trip is identity, shrink gate
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextOps.mojibakeRepair(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getString(1) == "naïve café" && !got(0).getBoolean(2))
    assert(got(1).getString(1) == "wide 中文 text" && !got(1).getBoolean(2))
    assert(got(2).getString(1) == "plain ascii" && !got(2).getBoolean(2))
    assert(got(3).isNullAt(1) && !got(3).getBoolean(2) &&
      got(3).getLong(3) == 0L)
  }

  test("mojibakeRepair is idempotent: a repaired corpus re-enters the " +
    "gate and nothing changes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "café’s — fine"), (2L, "ascii"))
      .toDF("doc_id", "clean")
      .select(col("doc_id"), TextOps.latin1Garble(col("clean")).as("text"))
    val once = TextOps.mojibakeRepair(docs, "doc_id", "text")
      .select(col("doc_id"), col("fixed_text").as("text"))
    val twice = TextOps.mojibakeRepair(once, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(twice(0).getString(1) == "café’s — fine" &&
      !twice(0).getBoolean(2))
    assert(twice(1).getString(1) == "ascii" && !twice(1).getBoolean(2))
  }

  test("mojibakeMarkers counts the three lead chars exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // Ã twice, Â once, â once → 4; markers inside otherwise-clean text
    val n = Seq("xÃ©yÃ£zÂ wâq").toDF("t")
      .select(TextOps.mojibakeMarkers(col("t"))).collect().head.getInt(0)
    assert(n == 4)
  }

  // ---- round-20 optimization internals ----------------------------------

  test("Unigram trainer E-step via the codegen kernel: an exact score " +
    "tie breaks to the lexicographically smaller piece path, visible " +
    "in the Viterbi counts") {
    import spark.implicits._
    // Seed counts over words {abc, ab, bc} (maxPieceLen 2): a=2 b=3 c=2
    // ab=2 bc=2, total 11. Viterbi("abc"): [ab c] and [a bc] both score
    // exactly 2*ln(2/11) and beat [a b c]; "a bc" < "ab c" byte-wise, so
    // bc — not ab — must take the count from "abc". A tie broken the
    // other way would leave counts ab=2, bc=1.
    val docs = Seq("abc", "ab", "bc").toDF("text")
    val model = graft.ops.Unigram.train(docs, "text", vocabSize = 5,
      maxPieceLen = 2, seedFactor = 4, emRounds = 1)
    val cnt = model.map(p => p.piece -> p.cnt).toMap
    assert(cnt == Map("bc" -> 2L, "ab" -> 1L, "a" -> 1L, "b" -> 1L,
      "c" -> 1L), s"got $cnt")
  }

  test("hyperballSizes with the overlapped round read: round labels " +
    "stay contiguous 0..T with exactly one row per (node, t)") {
    import spark.implicits._
    // 4-node path a->b->c->d: a's out-ball grows through round 3, so the
    // register fixpoint lands at T=3. The overlapped estRows future must
    // label each round with ITS OWN t (the by-name race this test pins
    // mislabeled rounds as t+1: duplicate labels, a gap in 0..T).
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("s", "d")
    val sz = graft.ops.WebGraph.hyperballSizes(edges, "s", "d")
    val rows = sz.collect().map(r => (r.getString(0), r.getInt(1)))
    val ts = rows.map(_._2).distinct.sorted.toSeq
    assert(ts == (0 to 3).toSeq, s"rounds $ts")
    assert(rows.length == rows.distinct.length, "duplicate (node, t) row")
    assert(rows.count(_._2 == 0) == 4, "every node has a round-0 row")
  }
}
