package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** URL canonicalization unit semantics — each rule of the UrlOps spec on a
  * hand-built case table (the cross-engine oracle re-derives the same spec
  * in SQL over the fixture corpus). */
class UrlOpsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("scheme and host lowercased; path case preserved") {
    assert(canon("HTTP://WWW.Example.COM/Art/One") == Seq("http://www.example.com/Art/One"))
  }

  test("default ports dropped, non-default ports kept") {
    assert(canon(
      "http://a.com:80/x", "https://a.com:443/x",
      "http://a.com:8080/x", "https://a.com:80/x") ==
      Seq("http://a.com/x", "https://a.com/x",
        "http://a.com:8080/x", "https://a.com:80/x"))
  }

  test("fragment dropped; utm params dropped; survivors sorted") {
    assert(canon("https://a.com/p?z=1&utm_source=x&a=2#frag") ==
      Seq("https://a.com/p?a=2&z=1"))
    // all params dropped -> no '?' at all
    assert(canon("https://a.com/p?utm_source=x&utm_medium=y") ==
      Seq("https://a.com/p"))
  }

  test("trailing slashes trimmed on non-root; empty path becomes root") {
    assert(canon("https://a.com/p/", "https://a.com/p//", "https://a.com/",
      "https://a.com") ==
      Seq("https://a.com/p", "https://a.com/p", "https://a.com/", "https://a.com/"))
  }

  test("total on junk: no scheme falls back to lower(trim); whitespace trimmed") {
    assert(canon("  not a url  ", "ALSO/NOT?A#URL") ==
      Seq("not a url", "also/not?a#url"))
  }

  test("query on root path; '?' with empty query collapses") {
    assert(canon("https://a.com?b=2&a=1", "https://a.com/p?") ==
      Seq("https://a.com/?a=1&b=2", "https://a.com/p"))
  }

  test("hostOf: lowercased authority minus userinfo and port; empty on junk") {
    val got = Seq("HTTPS://WWW.Example.COM:8443/p?q=1", "http://a.b.c/x",
      "http://alice:pw@Example.com:8080/x", "http://[::1]:8080/x",
      "no scheme here").toDF("url")
      .select(UrlOps.hostOf(col("url")).as("h")).collect().map(_.getString(0)).toSeq
    assert(got == Seq("www.example.com", "a.b.c", "example.com", "[::1]", ""))
  }

  test("registrableDomain: last two labels, three under a ccSLD; total on junk") {
    val got = Seq(
      "https://w3.shop.co.uk/p", "https://deep.w3.shop.co.uk/p",
      "https://w2.example.com/p", "https://example.com/p",
      "https://co.uk/p", // the suffix ITSELF as host: 2 labels -> unchanged
      "https://localhost/p", "http://[::1]/x", "junk")
      .toDF("url").select(UrlOps.registrableDomain(col("url")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("shop.co.uk", "shop.co.uk", "example.com", "example.com",
      "co.uk", "localhost", "[::1]", ""))
  }

  test("hostCap: cap enforced per host, under-cap hosts whole, partition-invariant") {
    // host h0: 50 docs, host h1: 7 docs, cap 10
    val docs = ((0 until 50).map(i => (i.toLong, s"https://h0.com/p$i")) ++
      (0 until 7).map(i => (100L + i, s"https://h1.org/p$i")))
      .toDF("doc_id", "url")
    val kept = UrlOps.hostCap(docs, col("url"), col("doc_id"), cap = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byHost = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byHost("h0.com").size == 10)
    assert(byHost("h1.org") == (0 until 7).map(100L + _).toSet) // under cap: all kept
    val again = UrlOps.hostCap(docs.repartition(13), col("url"), col("doc_id"), cap = 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == kept.toSet)
  }

  test("trapSignals: path explosion, depth, adjacent repeats, param volume") {
    val urls = Seq(
      // trap.com: same path under exploding session params + a /cal/cal loop
      "https://trap.com/item?sess=1&page=1",
      "https://trap.com/item?sess=2&page=1",
      "https://trap.com/item?sess=3&page=2",
      "https://trap.com/cal/cal/2024",
      // clean.org: distinct shallow paths, no params
      "https://clean.org/a",
      "https://clean.org/b/c",
      "https://clean.org/")
      .toDF("url")
    val got = UrlOps.trapSignals(urls, col("url")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // 4 urls but only 2 distinct paths; max depth 3 (/cal/cal/2024); one
    // repeat-segment url; 6 params over 4 urls -> 1_500_000 ppm
    assert(got("trap.com") == ((4L, 2L, 3L, 1L, 6L, 1500000L)))
    // 3 urls, 3 paths (root is "/"), depth 2, no repeats, no params
    assert(got("clean.org") == ((3L, 3L, 2L, 0L, 0L, 0L)))
  }
}
