package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Code, Markdown}

class MarkdownCodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def md(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("m").select(Markdown.markdownToText(col("m"))).head.getString(0)
  }

  test("markdownToText: headers, bullets, numbered lists, quotes, rules, emphasis") {
    val got = md("## Head\n- a\n+ b\n2. c\n> q\n---\n**bold** *em* plain")
    assert(got == "Head\na\nb\nc\nq\nbold em plain")
  }

  test("markdownToText: fenced code survives unfenced; info string drops; snake_case keeps underscores") {
    val got = md("pre\n```scala\nval my_var = a_b(1)\n```\npost")
    assert(got == "pre\nval my_var = a_b(1)\npost")
  }

  test("markdownToText: images become alt text BEFORE links become anchor text") {
    assert(md("see ![alt text](i.png) and [the docs](https://d)") ==
      "see alt text and the docs")
  }

  test("links: paired (text, url, is_image) in true document order") {
    import spark.implicits._
    val got = Seq("![i1](a.png) mid [l1](u1) end ![i2](b.png)").toDF("m")
      .select(Markdown.links(col("m"))).head.getSeq[org.apache.spark.sql.Row](0)
    assert(got.map(r => (r.getString(0), r.getString(1), r.getBoolean(2))) ==
      Seq(("i1", "a.png", true), ("l1", "u1", false), ("i2", "b.png", true)))
  }

  test("license: SPDX tag wins over a contradicting phrase; unknown is not permissive") {
    import spark.implicits._
    val df = Seq(
      "// SPDX-License-Identifier: GPL-3.0-only\n// Permission is hereby granted, free of charge",
      "just code, no license").toDF("src")
    val got = df.select(Code.license(col("src")).as("l"))
      .select(col("l"), Code.permissive(col("l"))).collect()
    assert(got(0).getString(0) == "GPL-3.0-only" && !got(0).getBoolean(1),
      "the machine-readable SPDX tag must win over phrase probes")
    assert(got(1).getString(0) == "unknown" && !got(1).getBoolean(1))
  }

  test("commentStats: markers at trimmed line starts; blank lines excluded") {
    import spark.implicits._
    val src = "  // c1\n\ncode()\n   # c2\n-- c3\n * doc\n/* block\nmore code"
    val r = Seq(src).toDF("s").select(Code.commentStats(col("s"))).head.getStruct(0)
    assert(r.getLong(0) == 7L && r.getLong(1) == 5L)
  }
}
