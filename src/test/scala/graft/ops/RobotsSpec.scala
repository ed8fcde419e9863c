package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("parseBody: star group only, stacked UA lines, comments, empty disallow dropped") {
    val body =
      """# top comment
        |User-agent: googlebot
        |Disallow: /google-only
        |
        |User-agent: *
        |User-agent: extra
        |Disallow: /private  # trailing comment
        |Allow: /private/ok
        |Disallow:
        |Crawl-delay: 4
        |
        |User-Agent: bing
        |Disallow: /bing-only""".stripMargin
    val got = Robots.parseBody("h.test", body)
    assert(got === Seq(
      Robots.Rule("h.test", allow = false, "/private"),
      Robots.Rule("h.test", allow = true, "/private/ok")))
  }

  test("parseBody: a new group RESETS star membership; no star group = no rules") {
    assert(Robots.parseBody("h", "User-agent: a\nDisallow: /x") === Nil)
    // the rule line closes the first UA run, so the second UA line opens a
    // NEW group that does not inherit '*'
    assert(Robots.parseBody("h",
      "User-agent: *\nDisallow: /x\nUser-agent: b\nDisallow: /y") ===
      Seq(Robots.Rule("h", allow = false, "/x")))
  }

  test("allowed: longest prefix wins in both directions; tie goes to Allow") {
    val rules = Seq(
      ("a.test", false, "/doc"), ("a.test", true, "/do"),    // disallow longer
      ("b.test", false, "/doc"), ("b.test", true, "/doc/"),  // allow longer
      ("c.test", false, "/p"), ("c.test", true, "/p"))       // tie -> allow
      .toDF("host", "allow", "prefix")
    val urls = Seq("https://a.test/doc/1", "https://b.test/doc/1",
      "https://c.test/p", "https://b.test/other", "https://norules.test/x")
      .toDF("u")
    val got = Robots.allowed(urls, col("u"), rules)
      .as[(String, Boolean)].collect().toMap
    assert(got === Map(
      "https://a.test/doc/1" -> false,
      "https://b.test/doc/1" -> true,
      "https://c.test/p" -> true,
      "https://b.test/other" -> true,   // rules exist but none match
      "https://norules.test/x" -> true)) // no rules for the host at all
  }

  test("crawlDelays: star group only, first declaration wins, junk dropped") {
    val docs = Seq(
      ("a.test", "User-agent: *\nCrawl-delay: 7\nCrawl-delay: 9"),
      ("b.test", "User-agent: bot\nCrawl-delay: 3"),
      ("c.test", "User-agent: *\nCrawl-delay: soon"),
      ("d.test", "User-agent: *\nDisallow: /x"))
      .toDF("host", "body")
    val got = Robots.crawlDelays(docs, col("host"), col("body"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("a.test" -> 7L))
  }

  test("sitemap: loc entries trimmed, empties dropped, canonicalized") {
    val xml =
      """<?xml version="1.0"?><urlset>
        |<url><loc>  HTTPS://S.test:443/a/  </loc></url>
        |<url><loc></loc></url>
        |<url><loc>https://s.test/b?utm_source=x&amp;k=1</loc></url>
        |</urlset>""".stripMargin
    val got = WebGraph.extractSitemapUrls(
      Seq(("s.test", xml)).toDF("host", "xml"), col("xml"), col("host"))
      .as[(String, String)].collect().toList
    assert(got === List(
      ("s.test", "https://s.test/a"),
      ("s.test", "https://s.test/b?k=1"))) // &amp; decoded, utm_ dropped
  }
}
