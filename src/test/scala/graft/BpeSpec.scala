package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // corpus with word counts hug:10 pug:5 pun:12 bun:4 hugs:5 — the classic
  // BPE walkthrough corpus; expected merges are hand-computed below
  private def fixture = {
    import spark.implicits._
    val words = Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    // spread across several docs so training sees a multi-row frame
    words.grouped(7).map(_.mkString(" ")).toSeq.toDF("text")
  }

  test("train learns the hand-computed merge sequence with exact counts") {
    val merges = Bpe.train(fixture, "text", numMerges = 4)
    // pair counts round 1: (u,g)=10+5+5=20  (p,u)=5+12=17  (u,n)=12+4=16
    //                      (h,u)=10+5=15    (g,s)=5        (b,u)=4
    // merge ug → round 2: (u,n)=16 (h,ug)=15 (p,ug)=5 (p,u)=12 (b,u)=4 (ug,s)=5
    // merge un → round 3: (h,ug)=15 (p,un)=12 (p,ug)=5 (b,un)=4 (ug,s)=5
    // merge hug → round 4: (p,un)=12 ...
    val got = merges.map(m => (m.left, m.right, m.pairCount))
    assert(got == Seq(("u", "g", 20L), ("u", "n", 16L),
      ("h", "ug", 15L), ("p", "un", 12L)))
  }

  test("training is invariant to partition layout and doc grouping") {
    import spark.implicits._
    val a = Bpe.train(fixture.repartition(7), "text", numMerges = 4)
    val words = Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    val oneDoc = Seq(words.mkString(" ")).toDF("text")
    val b = Bpe.train(oneDoc, "text", numMerges = 4)
    assert(a == b)
  }

  test("encode applies merges greedily by rank; round-trips characters") {
    import spark.implicits._
    val merges = Bpe.train(fixture, "text", numMerges = 4)
    val docs = Seq((1L, "hug hugs"), (2L, "pun pug bun"), (3L, "gup x"))
      .toDF("doc_id", "text")
    val got = Bpe.encode(docs, "text", merges)
      .select(col("doc_id"), col("bpe_tokens")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList))
    assert(got(0) == (1L, List("hug", "hug", "s")))
    // "pun" is itself a learned token (rank-3 merge p+un); "pug"/"bun"
    // stop at the pair level because (p,ug)/(b,un) were never merged
    assert(got(1) == (2L, List("pun", "p", "ug", "b", "un")))
    // unseen word falls back toward characters (only learned pairs fuse)
    assert(got(2) == (3L, List("g", "u", "p", "x")))
    // concatenating tokens reproduces the letters of every document
    val joined = Bpe.encode(docs, "text", merges)
      .select(col("doc_id"),
        concat_ws("", col("bpe_tokens")).as("rejoined"),
        regexp_replace(lower(col("text")), "\\s+", "").as("letters"))
      .collect()
    joined.foreach(r => assert(r.getString(1) == r.getString(2)))
  }

  test("encode with no merges splits to characters; stop on minPairCount") {
    import spark.implicits._
    val docs = Seq(Tuple1("abc ab")).toDF("text")
    val got = Bpe.encode(docs, "text", Nil)
      .select(col("bpe_tokens")).head().getSeq[String](0)
    assert(got.toList == List("a", "b", "c", "a", "b"))
    // all-distinct pairs: nothing reaches minPairCount=2
    val distinctDocs = Seq(Tuple1("abc de")).toDF("text")
    assert(Bpe.train(distinctDocs, "text", numMerges = 5,
      minPairCount = 2L).isEmpty)
    // with the floor at 1 it keeps merging deterministically (ab first:
    // count 2, then lexicographic among count-1 pairs)
    val m = Bpe.train(docs, "text", numMerges = 1, minPairCount = 1L)
    assert(m.map(x => (x.left, x.right, x.pairCount)) == Seq(("a", "b", 2L)))
  }

  test("merges persist and reload byte-identically; reloaded model encodes the same") {
    import spark.implicits._
    val merges = Bpe.train(fixture, "text", numMerges = 4)
    val path = java.nio.file.Files.createTempDirectory("graft-bpe").toString + "/m"
    Bpe.saveMerges(spark, merges, path)
    val reloaded = Bpe.loadMerges(spark, path)
    assert(reloaded == merges)
    val docs = Seq((1L, "hug hugs pun")).toDF("doc_id", "text")
    val a = Bpe.encode(docs, "text", merges).select("bpe_tokens")
      .head().getSeq[String](0).toList
    val b = Bpe.encode(docs, "text", reloaded).select("bpe_tokens")
      .head().getSeq[String](0).toList
    assert(a == b)
  }

  test("encode is a pure projection inside the codegen span, no literal leak") {
    val merges = Bpe.train(fixture, "text", numMerges = 4)
    val plan = Bpe.encode(
      Tables.documents(spark, "/root/testdata/sf0.001"), "text", merges)
      .select(col("doc_id"), col("bpe_tokens"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
  }
}
