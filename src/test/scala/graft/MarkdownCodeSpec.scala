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

  test("markdownToText: CRLF fences and exotic info strings (c#) still unfence") {
    assert(md("pre\r\n```c#\r\nvar x_1 = 2;\r\n```\r\npost") ==
      "pre\nvar x_1 = 2;\npost")
  }

  test("links: code spans are excluded — indexing-plus-call is not a link") {
    import spark.implicits._
    val doc = "```py\nhandlers[0](event)\n```\ninline `a[1](b)` and [real](u)"
    val got = Seq(doc).toDF("m").select(Markdown.links(col("m")))
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(got.map(r => (r.getString(0), r.getString(1))) == Seq(("real", "u")))
  }

  test("license: SPDX expressions evaluate conservatively (AND = all, OR = any)") {
    import spark.implicits._
    val df = Seq(
      "// SPDX-License-Identifier: MIT AND GPL-3.0-only",
      "// SPDX-License-Identifier: (MIT OR Apache-2.0)",
      "// SPDX-License-Identifier: Apache-2.0 WITH LLVM-exception",
      "// SPDX-License-Identifier: GPL-2.0-only OR GPL-3.0-only").toDF("src")
    val got = df.select(Code.license(col("src")).as("l"))
      .select(col("l"), Code.permissive(col("l"))).collect()
    assert(got(0).getString(0) == "MIT AND GPL-3.0-only" && !got(0).getBoolean(1),
      "a GPL-encumbered AND expression must not pass as MIT")
    assert(got(1).getString(0) == "(MIT OR Apache-2.0)" && got(1).getBoolean(1))
    assert(!got(2).getBoolean(1), "WITH exception clauses stay conservative")
    assert(!got(3).getBoolean(1))
  }

  test("license: BSD-4-Clause advertising variant and version-less MPL are not permissive") {
    import spark.implicits._
    val df = Seq(
      "Redistribution and use in source and binary forms ... All advertising materials mentioning features",
      "Redistribution and use in source and binary forms, with or without modification",
      "subject to the terms of the Mozilla Public License").toDF("src")
    val got = df.select(Code.license(col("src")).as("l"))
      .select(col("l"), Code.permissive(col("l"))).collect()
    assert(got(0).getString(0) == "BSD-4-Clause" && !got(0).getBoolean(1))
    assert(got(1).getString(0) == "BSD" && got(1).getBoolean(1))
    assert(got(2).getString(0) == "MPL" && !got(2).getBoolean(1),
      "a phrase probe cannot see the MPL version — must not claim MPL-2.0")
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

  test("license: same-line trailing prose does not leak into the SPDX id") {
    import spark.implicits._
    val df = Seq(
      "// SPDX-License-Identifier: MIT - see LICENSE for details",
      "/* SPDX-License-Identifier: Apache-2.0 */",
      "# SPDX-License-Identifier: GPL-3.0-only (strong copyleft)",
      "// SPDX-License-Identifier: MIT AND GPL-3.0-only - dual").toDF("src")
    val got = df.select(Code.license(col("src")).as("l"))
      .select(col("l"), Code.permissive(col("l"))).collect()
    assert(got(0).getString(0) == "MIT" && got(0).getBoolean(1),
      "prose after the id must not be absorbed into the license")
    assert(got(1).getString(0) == "Apache-2.0" && got(1).getBoolean(1),
      "a closing comment terminator must not join the id")
    assert(got(2).getString(0) == "GPL-3.0-only" && !got(2).getBoolean(1))
    assert(got(3).getString(0) == "MIT AND GPL-3.0-only" && !got(3).getBoolean(1),
      "operators keep binding; prose stops the expression, not the AND")
  }

  test("commentStats: markers at trimmed line starts; blank lines excluded") {
    import spark.implicits._
    val src = "  // c1\n\ncode()\n   # c2\n-- c3\n * doc\n/* block\nmore code"
    val r = Seq(src).toDF("s").select(Code.commentStats(col("s"))).head.getStruct(0)
    assert(r.getLong(0) == 7L && r.getLong(1) == 5L)
  }
}
