package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WebGraphSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def links(url: String, html: String) =
    WebGraph.extractLinks(
      Seq((url, html.getBytes("UTF-8"))).toDF("url", "html"),
      col("html"), col("url"))
      .as[(String, String, String)].collect().toList

  test("extractLinks: quote styles, case, attribute order, inner markup") {
    val html =
      """<HTML><body>
        |<A CLASS="x" HREF="https://other.test/a">First <b>bold</b>
        |  link</A>
        |<a href='https://other.test/b' rel=nofollow>second</a>
        |</body></HTML>""".stripMargin
    val got = links("https://src.test/dir/page", html)
    assert(got === List(
      ("https://src.test/dir/page", "https://other.test/a", "First bold link"),
      ("https://src.test/dir/page", "https://other.test/b", "second")))
  }

  test("extractLinks: relative resolution — root, protocol, directory") {
    val html = """<a href="/root/x">r</a><a href="//cdn.test/y">p</a><a href="sub/z">d</a>"""
    val got = links("https://h.test/dir/page?q=1#f", html).map(_._2)
    assert(got === List(
      "https://h.test/root/x", "https://cdn.test/y", "https://h.test/dir/sub/z"))
  }

  test("extractLinks: decoys dropped — no href, fragment, mailto/javascript/tel, empty") {
    val html = """<a name="n">plain</a><a href="#top">t</a><a href="mailto:a@b">m</a>
      |<a href="JavaScript:void(0)">j</a><a href="tel:+1">c</a><a href="">e</a>
      |<a href="https://keep.test/only">keep</a>""".stripMargin
    val got = links("https://h.test/p", html)
    assert(got === List(("https://h.test/p", "https://keep.test/only", "keep")))
  }

  test("extractLinks: dst canonicalized (port, fragment, params) and total on junk") {
    val html = """<a href="HTTPS://Keep.TEST:443/A/?utm_source=x&b=2&a=1#frag">k</a>"""
    assert(links("https://h.test/p", html).map(_._2) ===
      List("https://keep.test/A?a=1&b=2"))
    // authority-only page url: directory base gains '/'
    assert(links("https://h.test", """<a href="x">k</a>""").map(_._2) ===
      List("https://h.test/x"))
  }

  test("extractLinks is row-local: no exchange in the physical plan") {
    val pages = WebGraph.syntheticLinkedPages(
      Seq((1L, "t"), (2L, "u")).toDF("doc_id", "text"), col("doc_id"), col("text"))
    val p = WebGraph.extractLinks(pages, col("html"), col("url"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("synthetic fixture round-trip: extraction recovers exactly the formula links") {
    val ids = (0L until 50L).toList
    val docsDf = ids.map(i => (i, s"body $i")).toDF("doc_id", "text")
    val got = WebGraph.extractLinks(
      WebGraph.syntheticLinkedPages(docsDf, col("doc_id"), col("text")),
      col("html"), col("url"))
      .as[(String, String, String)].collect().toSet
    val want = (for { i <- ids; j <- 1L to (1L + i % 3) } yield {
      val dst = (i * 31 + j * 97) % 1000
      val dstHost = if (j % 2 == 1) s"h${dst % 40}.example.test" else s"h${i % 40}.example.test"
      (s"https://h${i % 40}.example.test/doc/$i",
        s"https://$dstHost/doc/$dst",
        s"see topic${dst % 7} doc $dst")
    }).toSet
    assert(got === want)
  }

  test("extractCanonical: both attribute orders and quotes, stylesheet decoy, resolution") {
    val html =
      """<html><head><link rel="stylesheet" href="/s.css">
        |<link rel="canonical" href="/canon">
        |<LINK HREF='https://other.test/c' REL='canonical'/></head><body/></html>""".stripMargin
    val got = WebGraph.extractCanonical(
      Seq(("https://h.test/p?x=1", html.getBytes("UTF-8"))).toDF("url", "html"),
      col("html"), col("url")).as[(String, String)].collect().toList
    assert(got === List(
      ("https://h.test/p?x=1", "https://h.test/canon"),
      ("https://h.test/p?x=1", "https://other.test/c")))
  }

  test("synthetic fixture: canonical declarations recover the alias formula") {
    val ids = (0L until 20L).toList
    val docsDf = ids.map(i => (i, s"body $i")).toDF("doc_id", "text")
    val got = WebGraph.extractCanonical(
      WebGraph.syntheticLinkedPages(docsDf, col("doc_id"), col("text")),
      col("html"), col("url")).as[(String, String)].collect().toSet
    val want = ids.map { i =>
      val c = i - i % 2
      (s"https://h${i % 40}.example.test/doc/$i",
        s"https://h${c % 40}.example.test/doc/$c")
    }.toSet
    assert(got === want)
  }

  test("frontier: uncrawled candidates, host-diverse priority, per-host politeness cap") {
    val l = Seq(
      ("https://a.test/1", "https://new.test/x", "nx"),
      ("https://b.test/1", "https://new.test/x", "nx"),
      ("https://a.test/1", "https://new.test/y", "ny"),
      ("https://a.test/2", "https://new.test/y", "ny"),
      ("https://a.test/1", "https://new.test/z", "nz"),
      ("https://a.test/1", "https://old.test/seen", "s"))
      .toDF("src", "dst", "anchor")
    val crawled = Seq("https://old.test/seen").toDF("url")
    val got = WebGraph.frontier(l, crawled, perHost = 2)
      .as[(String, Long, Long, Long)].collect().toSet
    // x: 2 links from 2 hosts outranks y: 2 links 1 host; z (1/1) cut by the cap;
    // old.test/seen is already crawled
    assert(got === Set(
      ("https://new.test/x", 2L, 2L, 1L),
      ("https://new.test/y", 2L, 1L, 2L)))
  }

  test("hostGraph / inLinkProfile / anchorTermProfile aggregate the link relation") {
    val l = Seq(
      ("https://a.test/1", "https://b.test/x", "big cats"),
      ("https://a.test/2", "https://b.test/x", "big dogs"),
      ("https://c.test/3", "https://b.test/x", "big cats now"),
      ("https://a.test/1", "https://c.test/y", "one"))
      .toDF("src", "dst", "anchor")
    val hosts = WebGraph.hostGraph(l).as[(String, String, Long)].collect().toSet
    assert(hosts === Set(("a.test", "b.test", 2L), ("c.test", "b.test", 1L),
      ("a.test", "c.test", 1L)))
    val prof = WebGraph.inLinkProfile(l).as[(String, Long, Long)].collect().toSet
    assert(prof === Set(("https://b.test/x", 3L, 2L), ("https://c.test/y", 1L, 1L)))
    val terms = WebGraph.anchorTermProfile(l, k = 2)
      .as[(String, String, Long, Long)].collect().toSet
    assert(terms === Set(
      ("https://b.test/x", "big", 3L, 1L), ("https://b.test/x", "cats", 2L, 2L),
      ("https://c.test/y", "one", 1L, 1L)))
  }

  test("anchorEntityEvidence: lexicon terms in anchors roll up per target") {
    val l = Seq(
      ("https://a.test/1", "https://b.test/x", "visit acme shop"),
      ("https://a.test/2", "https://b.test/x", "acme  again"),
      ("https://c.test/3", "https://b.test/y", "plain words only"))
      .toDF("src", "dst", "anchor")
    val got = WebGraph.anchorEntityEvidence(l, Map("acme" -> "ORG", "shop" -> "LOC"))
      .as[(String, String, String, Long)].collect().toSet
    assert(got === Set(
      ("https://b.test/x", "acme", "ORG", 2L),
      ("https://b.test/x", "shop", "LOC", 1L)))
  }

  test("fetchSchedule: per-host slots spaced by crawl delay, default for silent hosts") {
    val fr = Seq(
      ("https://slow.test/a", 1L), ("https://slow.test/b", 2L),
      ("https://quiet.test/c", 1L), ("https://quiet.test/d", 3L))
      .toDF("url", "rank")
    val dl = Seq(("slow.test", 5L)).toDF("host", "delay_sec")
    val got = WebGraph.fetchSchedule(fr, dl, defaultDelaySec = 1L)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("https://slow.test/a", "slow.test", 1L, 5L, 0L),
      ("https://slow.test/b", "slow.test", 2L, 5L, 5L),
      ("https://quiet.test/c", "quiet.test", 1L, 1L, 0L),
      ("https://quiet.test/d", "quiet.test", 3L, 1L, 2L)))
  }

  test("hostProfile: volume, thin-page count, language spread per host") {
    val pages = Seq(
      ("h1", "one two three four", "en"),
      ("h1", "tiny", "en"),
      ("h1", "eins zwei drei", "de"),
      ("h2", "a b c", "en"))
      .toDF("host", "text", "lang")
    val got = WebGraph.hostProfile(pages, col("host"), col("text"), col("lang"),
        thinTokens = 3)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(("h1", 3L, 8L, 1L, 2L), ("h2", 1L, 3L, 0L, 1L)))
  }

  test("mirrorHosts: shared-fingerprint pairs, sizes, and the hot-fp cap") {
    val pages = Seq(
      ("a.test", "f1"), ("a.test", "f2"), ("a.test", "f3"),
      ("b.test", "f1"), ("b.test", "f2"), ("b.test", "f9"),
      ("c.test", "f1"),
      // fh is shared by all four hosts -> dropped by maxHostsPerFp = 3
      ("a.test", "fh"), ("b.test", "fh"), ("c.test", "fh"), ("d.test", "fh"),
      // duplicate observation of the same (host, fp) must not double-count
      ("a.test", "f1"))
      .toDF("host", "fp")
    val got = WebGraph.mirrorHosts(pages, col("host"), col("fp"),
        minShared = 1L, maxHostsPerFp = 3L)
      .as[(String, String, Long, Long, Long)].collect().toSet
    // post-cap fingerprint sets: a={f1,f2,f3}, b={f1,f2,f9}, c={f1}
    assert(got === Set(
      ("a.test", "b.test", 2L, 3L, 3L),
      ("a.test", "c.test", 1L, 3L, 1L),
      ("b.test", "c.test", 1L, 3L, 1L)))
    // minShared = 2 keeps only the real mirror pair
    val strict = WebGraph.mirrorHosts(pages, col("host"), col("fp"),
        minShared = 2L, maxHostsPerFp = 3L)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(strict === Set(("a.test", "b.test", 2L, 3L, 3L)))
  }

  test("resolveRedirects: chains resolve to the terminal with exact hop counts") {
    // a -> b -> c -> d (3 hops), e -> d (1 hop), lone -> off (1 hop)
    val rd = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("e", "d"), ("lone", "off"))
      .toDF("src", "dst")
    val got = WebGraph.resolveRedirects(rd, doublingRounds = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("a", "d", 3L), ("b", "d", 2L), ("c", "d", 1L),
      ("e", "d", 1L), ("lone", "off", 1L)))
    // one round only resolves chains up to 2 hops — bounded-rounds contract
    val r1 = WebGraph.resolveRedirects(rd, doublingRounds = 1)
      .as[(String, String, Long)].collect().toSet
    assert(r1.contains(("a", "c", 2L)) && r1.contains(("b", "d", 2L)))
  }

  test("resolveRedirects: a cycle stays bounded and deterministic") {
    val rd = Seq(("x", "y"), ("y", "x"), ("a", "x")).toDF("src", "dst")
    val got = WebGraph.resolveRedirects(rd, doublingRounds = 3)
      .as[(String, String, Long)].collect()
      .map { case (u, f, h) => u -> ((f, h)) }.toMap
    // every src still maps somewhere inside the cycle, hops saturated at 2^3
    assert(got.keySet === Set("x", "y", "a"))
    assert(Set("x", "y").contains(got("a")._1))
    val again = WebGraph.resolveRedirects(rd.repartition(7), doublingRounds = 3)
      .as[(String, String, Long)].collect()
      .map { case (u, f, h) => u -> ((f, h)) }.toMap
    assert(again === got)
  }
}
