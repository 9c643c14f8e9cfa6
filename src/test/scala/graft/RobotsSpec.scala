package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Robots

class RobotsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def rules(content: String) = {
    import spark.implicits._
    Robots.robotsRules(Seq(("h", content)).toDF("host", "robots"),
      "host", "robots")
      .select("agent", "directive", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
  }

  test("group binding: rules attach to their User-agent run; runs do not leak") {
    val got = rules(
      "User-agent: A\nDisallow: /a\n" +
        "User-agent: B\nUser-agent: C\nDisallow: /bc\nAllow: /bc/ok\n")
    assert(got == Set(
      ("a", "disallow", "/a"),
      ("b", "disallow", "/bc"), ("c", "disallow", "/bc"),
      ("b", "allow", "/bc/ok"), ("c", "allow", "/bc/ok")))
  }

  test("rules before any User-agent line are invalid and dropped; unknown keys and comments ignored") {
    val got = rules(
      "Disallow: /orphan\n# comment\nNoise: x\n" +
        "User-agent: a\nDisallow: /kept # trailing comment\n\n")
    assert(got == Set(("a", "disallow", "/kept")))
  }

  test("sitemap is group-independent with NULL agent; agent case-folds") {
    import spark.implicits._
    val df = Robots.robotsRules(
      Seq(("h", "Sitemap: https://h/s.xml\nUser-Agent: MixedBot\nDisallow: /x"))
        .toDF("host", "robots"), "host", "robots")
    val site = df.filter(col("directive") === "sitemap").head()
    assert(site.isNullAt(df.columns.indexOf("agent")) &&
      site.getAs[String]("value") == "https://h/s.xml")
    assert(df.filter(col("directive") === "disallow").head()
      .getAs[String]("agent") == "mixedbot")
  }

  private def verdict(robots: String, path: String, agent: String) = {
    import spark.implicits._
    val r = Robots.robotsRules(
      Seq(("h", robots)).toDF("host", "robots"), "host", "robots")
    val urls = Seq((1L, "h", path)).toDF("id", "host", "path")
    val row = Robots.urlAllowed(urls, "id", "host", "path", r, "host", agent)
      .select("allowed", "matched_rule", "agent_used").head()
    (row.getBoolean(0), Option(row.getString(1)), Option(row.getString(2)))
  }

  test("urlAllowed: longest match wins, Allow wins ties, default allow") {
    val r = "User-agent: *\nDisallow: /p\nAllow: /p/ok\n"
    assert(verdict(r, "/p/no", "bot") == (false, Some("/p"), Some("*")))
    assert(verdict(r, "/p/ok/deep", "bot") == (true, Some("/p/ok"), Some("*")))
    assert(verdict(r, "/elsewhere", "bot") == (true, None, None))
    // equal length: Allow beats Disallow (RFC 9309 §2.2.2)
    val tie = "User-agent: *\nDisallow: /ab\nAllow: /ab\n"
    assert(verdict(tie, "/ab/x", "bot")._1)
  }

  test("urlAllowed: a specific agent group shadows * entirely") {
    val r = "User-agent: *\nDisallow: /\nUser-agent: me\nAllow: /\n"
    assert(verdict(r, "/anything", "ME") == (true, Some("/"), Some("me")))
    assert(verdict(r, "/anything", "other")._1 == false)
  }

  test("urlAllowed: $ anchors exactly, * wildcards, LIKE specials stay literal") {
    val r = "User-agent: *\nDisallow: /exact$\nDisallow: /a*z\nDisallow: /pct%lit\n"
    assert(verdict(r, "/exact", "b")._1 == false)
    assert(verdict(r, "/exact/more", "b")._1 == true, "$ must not prefix-match")
    assert(verdict(r, "/a-middle-z", "b")._1 == false, "* spans")
    assert(verdict(r, "/a-middle-zz", "b")._1 == false, "* rule is still a prefix rule")
    assert(verdict(r, "/pct%lit", "b")._1 == false)
    assert(verdict(r, "/pctXlit", "b")._1 == true,
      "% in a rule must be literal, not a LIKE wildcard")
  }

  test("urlAllowed: host with no rules at all defaults to allow (left join)") {
    import spark.implicits._
    val r = Robots.robotsRules(
      Seq(("other", "User-agent: *\nDisallow: /")).toDF("host", "robots"),
      "host", "robots")
    val urls = Seq((1L, "bare", "/x")).toDF("id", "host", "path")
    val got = Robots.urlAllowed(urls, "id", "host", "path", r, "host", "b").head()
    assert(got.getAs[Boolean]("allowed"))
  }

  test("fetchSchedule: disallowed URLs unscheduled; delay from the governing group; default elsewhere") {
    import spark.implicits._
    val r = Robots.robotsRules(Seq(
      ("slow", "User-agent: me\nCrawl-delay: 7\nDisallow: /no\n"),
      ("plain", "User-agent: *\nDisallow: /no\n")).toDF("host", "robots"),
      "host", "robots")
    val urls = Seq(
      (1L, "slow", "/a"), (2L, "slow", "/b"), (3L, "slow", "/no/x"),
      (4L, "plain", "/a"), (5L, "bare", "/a")).toDF("id", "host", "path")
    val got = Robots.fetchSchedule(urls, "id", "host", "path", r, "host",
        "ME", defaultDelaySec = 2)
      .select("id", "delay_s", "slot", "fetch_at_s").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(!got.contains(3L), "disallowed URL must not be scheduled")
    assert(got(1L) == ((7L, 0L, 0L)) && got(2L) == ((7L, 1L, 7L)),
      "slots spaced by the specific group's Crawl-delay")
    assert(got(4L) == ((2L, 0L, 0L)), "no Crawl-delay in group → default")
    assert(got(5L) == ((2L, 0L, 0L)), "robots-less host → default delay")
  }

  test("fetchSchedule: a specific group with ONLY Crawl-delay still governs — paths all allowed, delay applies") {
    import spark.implicits._
    val r = Robots.robotsRules(Seq(
      ("h", "User-agent: *\nDisallow: /\nUser-agent: me\nCrawl-delay: 3\n"))
      .toDF("host", "robots"), "host", "robots")
    val urls = Seq((1L, "h", "/x"), (2L, "h", "/y")).toDF("id", "host", "path")
    val got = Robots.fetchSchedule(urls, "id", "host", "path", r, "host", "me")
      .orderBy("slot").collect()
    assert(got.length == 2, "the * Disallow:/ must be shadowed away")
    assert(got.map(_.getAs[Long]("fetch_at_s")).toSeq == Seq(0L, 3L))
  }

  test("empty 'Disallow:' is the allow-all idiom — it must match NOTHING, not everything") {
    val r = "User-agent: *\nDisallow:\n"
    assert(verdict(r, "/anything", "bot") == (true, None, None),
      "an empty rule value compiled to LIKE '%' would invert allow-all into deny-all")
    // and an empty Allow must not become a universal tie-winner either
    val r2 = "User-agent: *\nAllow:\nDisallow: /x\n"
    assert(verdict(r2, "/x/y", "bot")._1 == false)
  }

  test("a Sitemap line between two User-agent lines must NOT split the run") {
    val got = rules(
      "User-agent: a\nSitemap: https://h/s.xml\nUser-agent: b\nDisallow: /x\n")
    assert(got.contains(("a", "disallow", "/x")) &&
      got.contains(("b", "disallow", "/x")),
      s"Sitemap is a non-group record (RFC 9309 §2.2.4); got $got")
  }

  test("sitemapEntries: sitemapindex docs parse; loc-less blocks drop; non-XML yields no rows") {
    import spark.implicits._
    val idx = """<?xml version="1.0"?><sitemapindex>
      <sitemap><loc>https://h/s1.xml</loc><lastmod>2024-03-01</lastmod></sitemap>
      <sitemap><lastmod>2024-03-02</lastmod></sitemap>
      <sitemap><loc>https://h/s2.xml</loc></sitemap>
      </sitemapindex>"""
    val df = Seq((1L, idx), (2L, "not xml at all")).toDF("id", "xml")
    val got = Robots.sitemapEntries(df, "xml", keepCols = Seq("id"))
      .orderBy("entry_idx").collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L), "non-XML doc contributes no rows")
    assert(got.map(r => (r.getInt(1), r.getString(2), r.getString(3))).toSeq ==
      Seq((0, "https://h/s1.xml", "2024-03-01"), (2, "https://h/s2.xml", null)),
      "loc-less block drops, leaving the entry_idx gap")
  }
}
