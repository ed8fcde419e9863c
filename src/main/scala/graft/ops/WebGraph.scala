package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-link-graph construction from the `html:binary` page column — the
  * engine extension the BASELINE input shape `(url, warc_ts, html, text,
  * lang)` calls for beyond the reference's text-only pipeline (the reference
  * ingests pre-extracted text and never sees markup; SURVEY.md §1). A
  * Common-Crawl-scale KG job needs the hyperlink graph for host-level
  * authority (PageRank over hosts), crawl frontier curation, and anchor-text
  * entity evidence.
  *
  * Everything here is composed from codegen'd built-ins (decode /
  * regexp_extract_all / arrays_zip / explode / concat): extraction is one
  * narrow row-local generator projection — NO shuffle, no UDF — so at 100 TB
  * it rides the page scan for free; only the downstream host/anchor rollups
  * exchange, and those are on the already-tiny (src,dst,anchor) relation.
  *
  * Extraction contract (documented limits, WebGraphSpec pins each):
  *   - `<a ... href="..."|'...' ...> inner </a>`, case-insensitive, tags and
  *     newlines allowed inside the anchor body (inner markup is stripped);
  *     unquoted href values are NOT recognized (vanishingly rare in real
  *     crawls and ambiguous to delimit with a regex).
  *   - fragment-only (`#...`), `javascript:`, `mailto:`, `tel:` and empty
  *     hrefs are dropped — they are not crawlable graph edges.
  *   - relative references resolve RFC-3986-style against the page url:
  *     `//host/p` keeps the source scheme, `/p` keeps scheme://host, `p`
  *     resolves against the source directory. The result is canonicalized
  *     with [[UrlOps.canonicalizeUrl]] so the graph keys are dedup-stable.
  */
object WebGraph {

  private val AnchorPat =
    "(?is)<a\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"']*)[\"'][^>]*>(.*?)</a>"

  private def schemeOf(url: Column): Column =
    regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)

  /** scheme://host prefix of a url (lowercased host, port preserved). */
  private def originOf(url: Column): Column =
    concat(schemeOf(url), lit("://"), UrlOps.hostOf(url))

  /** Directory base of a url: everything up to and including the last '/'
    * of the path (query/fragment stripped); authority-only urls gain '/'. */
  private def dirBaseOf(url: Column): Column = {
    val noQf = regexp_replace(url, "[?#].*", "")
    when(noQf.rlike("^[A-Za-z][A-Za-z0-9+.-]*://[^/]+/"),
      regexp_replace(noQf, "/[^/]*$", "/"))
      .otherwise(concat(noQf, lit("/")))
  }

  /** Resolve an href against the page url and canonicalize. Total: never
    * errors on junk hrefs (returns a canonicalized best-effort string). */
  def resolveHref(pageUrl: Column, href: Column): Column = {
    val h = trim(href)
    val abs = when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), h)
      .when(h.startsWith("//"), concat(schemeOf(pageUrl), lit(":"), h))
      .when(h.startsWith("/"), concat(originOf(pageUrl), h))
      .otherwise(concat(dirBaseOf(pageUrl), h))
    UrlOps.canonicalizeUrl(abs)
  }

  /** Hyperlink extraction: one row per `<a href>` anchor of every page.
    * Output: (src, dst, anchor) — src/dst canonicalized urls, anchor the
    * tag-stripped whitespace-collapsed inner text. Row-local (no exchange);
    * pages without links contribute nothing. `html` may be binary (UTF-8
    * decoded) or string. */
  def extractLinks(pages: DataFrame, html: Column, url: Column): DataFrame = {
    val h = decode(html.cast("binary"), "UTF-8")
    val pairs = arrays_zip(
      regexp_extract_all(h, lit(AnchorPat), lit(1)).as("href"),
      regexp_extract_all(h, lit(AnchorPat), lit(2)).as("body"))
    val src = UrlOps.canonicalizeUrl(url)
    val exploded = pages
      .select(src.as("src"), explode(pairs).as("a"))
      .select(col("src"), trim(col("a.href")).as("href"), col("a.body").as("body"))
    val skip = col("href") === "" || col("href").startsWith("#") ||
      lower(col("href")).rlike("^(javascript|mailto|tel):")
    exploded.filter(!skip)
      .select(
        col("src"),
        resolveHref(col("src"), col("href")).as("dst"),
        trim(regexp_replace(regexp_replace(col("body"), "<[^>]*>", " "),
          "\\s+", " ")).as("anchor"))
  }

  /** Host-level link graph: (src_host, dst_host, n_links). The web graph's
    * standard coarsening — hosts are ~1e-4 of urls, so the rollup turns a
    * trillion-edge url graph into a relation PageRank can iterate on. One
    * exchange with map-side partial aggregation. */
  def hostGraph(links: DataFrame): DataFrame =
    links.select(UrlOps.hostOf(col("src")).as("src_host"),
        UrlOps.hostOf(col("dst")).as("dst_host"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))

  /** Per-target in-link profile: total in-links and distinct linking hosts —
    * the crawl-priority / spam signal pair (many links from ONE host is
    * navigation boilerplate; many hosts is genuine endorsement). */
  def inLinkProfile(links: DataFrame): DataFrame =
    links.select(col("dst"), UrlOps.hostOf(col("src")).as("src_host"))
      .groupBy(col("dst"))
      .agg(count(lit(1)).as("n_inlinks"),
        count_distinct(col("src_host")).as("n_src_hosts"))

  /** Top-k anchor terms per link target, ordered (count DESC, term ASC) —
    * aggregated anchor text is off-page evidence of what a url IS (the
    * classic retrieval/KG-linking signal). Terms are the whitespace tokens
    * of the tag-stripped anchor. Two exchanges ((dst,term) count, then the
    * per-dst window); the rank filter is a WindowGroupLimit, so only k rows
    * per dst survive the sort. */
  def anchorTermProfile(links: DataFrame, k: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = links
      .select(col("dst"), explode(split(col("anchor"), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("dst"), col("term")).agg(count(lit(1)).as("n"))
    terms.withColumn("rank", row_number().over(
        Window.partitionBy(col("dst")).orderBy(col("n").desc, col("term").asc)))
      .filter(col("rank") <= k)
      .select(col("dst"), col("term"), col("n"), col("rank").cast("long"))
  }

  private val LinkTagPat = "(?is)<link\\b[^>]*>"

  /** `<link rel="canonical">` extraction: one (url, canonical) row per
    * canonical declaration — the publisher's own duplicate-alias signal,
    * which a crawl pipeline folds into exact dedup (group by canonical
    * instead of fetched url) and into frontier dedup. Attribute order and
    * quote style are free (`rel` before or after `href`, single or double
    * quotes, self-closing tags); relative hrefs resolve like anchors.
    * Row-local, no shuffle; pages without a canonical contribute nothing;
    * a page declaring several canonicals (malformed but seen in the wild)
    * emits one row each — callers decide the tiebreak. */
  def extractCanonical(pages: DataFrame, html: Column, url: Column): DataFrame = {
    val h = decode(html.cast("binary"), "UTF-8")
    val src = UrlOps.canonicalizeUrl(url)
    pages.select(src.as("url"),
        explode(regexp_extract_all(h, lit(LinkTagPat), lit(0))).as("tag"))
      .filter(lower(col("tag")).rlike("\\brel\\s*=\\s*[\"']?canonical\\b"))
      .select(col("url"),
        regexp_extract(col("tag"), "(?i)\\bhref\\s*=\\s*[\"']([^\"']*)[\"']", 1).as("href"))
      .filter(col("href") =!= "")
      .select(col("url"), resolveHref(col("url"), col("href")).as("canonical"))
  }

  /** Sitemap `<loc>` extraction — crawl seeding from the publisher's own
    * url inventory. Row-local regex over the xml body; surrounding
    * whitespace inside `<loc>` is trimmed, the five predefined XML entities
    * are decoded (`&amp;` LAST, so `&amp;lt;` correctly yields the literal
    * `&lt;`), empty entries dropped, results canonicalized.
    * Output: (sitemap_host, url). */
  def extractSitemapUrls(docs: DataFrame, xml: Column, host: Column): DataFrame = {
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(col("loc")) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    docs.select(host.as("sitemap_host"),
        explode(regexp_extract_all(xml.cast("string"),
          lit("(?is)<loc>\\s*(.*?)\\s*</loc>"), lit(1))).as("loc"))
      .filter(col("loc") =!= "")
      .select(col("sitemap_host"), UrlOps.canonicalizeUrl(decoded).as("url"))
  }

  /** Crawl-frontier selection: discovered-but-uncrawled urls, prioritized
    * by endorsement and capped per host (politeness). `links` is an
    * [[extractLinks]] relation; `crawled` any relation with a `url` column
    * of already-fetched canonical urls. Per candidate url the score is
    * (distinct linking hosts, total in-links) — host diversity first, the
    * same endorsement-over-navigation ordering as [[inLinkProfile]] — and
    * `perHost` caps how many urls any single target host contributes
    * (a crawler's politeness budget).
    *
    * Shape at 10^12 urls: one partial-agg exchange on dst, a shuffle
    * LEFT ANTI join against the crawled set (both sides hash-partitioned
    * on url — never broadcast: the crawled set is the big one), and the
    * per-host cap is a WindowGroupLimit, so only `perHost` rows per host
    * survive the sort. Output: (url, n_inlinks, n_src_hosts, rank). */
  def frontier(links: DataFrame, crawled: DataFrame, perHost: Int = 2): DataFrame =
    frontierRank(
      links.select(col("dst"), UrlOps.hostOf(col("src")).as("src_host"))
        .groupBy(col("dst"))
        .agg(count(lit(1)).as("n_inlinks"),
          count_distinct(col("src_host")).as("n_src_hosts")),
      crawled, perHost)

  /** The ranking stage of [[frontier]] over an already-aggregated candidate
    * profile (dst, n_inlinks, n_src_hosts) — shared with the store-backed
    * continuous variant ([[frontierFromStore]]). */
  def frontierRank(profile: DataFrame, crawled: DataFrame, perHost: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    profile
      .join(crawled.select(col("url").as("dst")), Seq("dst"), "left_anti")
      .withColumn("rank", row_number().over(
        Window.partitionBy(UrlOps.hostOf(col("dst")))
          .orderBy(col("n_src_hosts").desc, col("n_inlinks").desc, col("dst").asc)))
      .filter(col("rank") <= perHost)
      .select(col("dst").as("url"), col("n_inlinks"), col("n_src_hosts"),
        col("rank").cast("long"))
  }

  /** Frontier over a persistent in-link store (see
    * [[graft.streaming.StreamOps.frontierIngestStream]]): the store's
    * `(dst url, src host, "inlink", cnt)` state rows aggregate to the same
    * candidate profile a batch [[frontier]] computes, so a crawler can ask
    * "what next" at any cadence without rescanning crawl history. */
  def frontierFromStore(spark: org.apache.spark.sql.SparkSession, store: String,
      crawled: DataFrame, perHost: Int = 2): DataFrame =
    frontierRank(
      graft.ops.EdgeStore.state(spark, store)
        .filter(col("sent") === "inlink")
        .groupBy(col("source").as("dst"))
        .agg(sum(col("cnt")).as("n_inlinks"),
          count_distinct(col("target")).as("n_src_hosts")),
      crawled, perHost)

  /** Anchor text as ENTITY evidence for the link target: off-page mentions
    * of lexicon entities inside anchors, rolled up per (target url, entity).
    * The classic web-KG signal — link text describes the TARGET (often
    * better than the target's own body: anchors gave early web search its
    * entity labels), so these rows feed the same mention relation the
    * on-page NER produces, with `n_mentions` as the off-page support
    * count. Whitespace tokenization to match the pipeline's tokenizer; the
    * lexicon join is a broadcast (closed vocabulary). */
  def anchorEntityEvidence(links: DataFrame, lexicon: Map[String, String]): DataFrame = {
    val spark = links.sparkSession
    import spark.implicits._
    val lex = broadcast(lexicon.toSeq.toDF("value", "type"))
    links.select(col("dst"), explode(split(col("anchor"), "\\s+")).as("value"))
      .filter(col("value") =!= "")
      .join(lex, Seq("value"))
      .groupBy(col("dst"), col("value"), col("type"))
      .agg(count(lit(1)).as("n_mentions"))
  }

  /** Politeness-aware fetch schedule over a ranked frontier: each host's
    * candidates fetch `crawl-delay` seconds apart (RFC-9309 Crawl-delay via
    * [[Robots.crawlDelays]]; hosts that declare none use `defaultDelaySec`),
    * so slot k of a host fires at offset (k-1)·delay. Turns the frontier
    * ranking into the dispatcher's actual work order — (url, host, rank,
    * delay_sec, fetch_offset_sec) — with one left join on host (the delays
    * relation is per-host — small — but joined hash-to-hash since host
    * cardinality at web scale is ~1e8). */
  def fetchSchedule(frontier: DataFrame, delays: DataFrame,
      defaultDelaySec: Long = 1L): DataFrame =
    frontier.withColumn("host", UrlOps.hostOf(col("url")))
      .join(delays, Seq("host"), "left")
      .select(col("url"), col("host"), col("rank"),
        coalesce(col("delay_sec"), lit(defaultDelaySec)).as("delay_sec"),
        ((col("rank") - 1L) * coalesce(col("delay_sec"), lit(defaultDelaySec)))
          .as("fetch_offset_sec"))

  /** Per-host content profile over the page set: document count, token
    * volume, thin-page count (< `thinTokens` tokens), and language spread —
    * the crawl-prioritization / quality gate at host granularity (a host
    * that is 90% thin pages gets its budget cut before per-doc scoring even
    * runs). All-integer, one shuffle on host. */
  def hostProfile(pages: DataFrame, host: Column, text: Column, lang: Column,
      thinTokens: Int = 20): DataFrame = {
    val nTokens = size(split(trim(text), "\\s+"))
    pages.select(host.as("host"), nTokens.as("n_tokens"), lang.as("lang"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens_sum"),
        sum(when(col("n_tokens") < thinTokens, 1L).otherwise(0L)).as("n_thin"),
        count_distinct(col("lang")).as("n_langs"))
  }

  /** Per-host content change rate between two crawl snapshots of the same
    * url set, and the derived revisit schedule — the freshness policy a
    * continuous crawler feeds back into its frontier (hosts that never
    * change get long revisit intervals; churn-heavy hosts get short ones).
    * Both inputs are (url, text); a page counts as CHANGED when its content
    * digest (md5 of the raw text — cross-engine exact) differs between the
    * snapshots. Outputs per host: page count, changed count, the change
    * ratio as exact ppm (`n_changed · 10^6 div n_pages`, truncating), and a
    * revisit interval interpolated linearly from 168 h (static host) down to
    * a 6 h floor (fully churning host) in exact BIGINT arithmetic.
    *
    * Scale shape: digests are map-side; one url-keyed equi-join between the
    * snapshots (co-partitioned when both crawls are bucketed by url hash,
    * as the checkpoint layout already does); one host-keyed rollup with
    * partial aggregation. Urls present in only one snapshot drop out of the
    * inner join — change rate is defined on the re-fetched set. */
  def changeRate(prev: DataFrame, cur: DataFrame): DataFrame =
    prev.select(col("url"), md5(col("text").cast("binary")).as("h_prev"))
      .join(cur.select(col("url"), md5(col("text").cast("binary")).as("h_cur")), "url")
      .select(UrlOps.hostOf(col("url")).as("host"),
        when(col("h_prev") =!= col("h_cur"), 1L).otherwise(0L).as("changed"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_pages"), sum(col("changed")).cast("long").as("n_changed"))
      .withColumn("change_ppm", expr("(n_changed * 1000000L) div n_pages"))
      .withColumn("revisit_hours", expr("greatest(6L, 168L - (162L * n_changed) div n_pages)"))

  /** Mirror / shared-content host pairs: hosts whose page-content
    * fingerprint sets overlap in at least `minShared` fingerprints —
    * site-mirror and mass-syndication detection, the host-granularity
    * complement of document dedup (a crawler demotes a detected mirror
    * instead of re-fetching it page by page).
    *
    * Shape: (host, fingerprint) distinct pairs, inverted-index self-join on
    * the fingerprint, pair rollup — the decontaminate join pattern. A
    * fingerprint shared by more than `maxHostsPerFp` hosts is dropped
    * before the join (boilerplate/empty-page fingerprints would otherwise
    * go quadratic — the standard degenerate-bucket cap, pinned in the
    * oracle). Output: (host_a, host_b, n_shared, n_a, n_b) with
    * host_a < host_b; n_a/n_b are the hosts' distinct fingerprint counts
    * (post-cap), so overlap coefficients derive downstream without a
    * rescan. */
  def mirrorHosts(pages: DataFrame, host: Column, fingerprint: Column,
      minShared: Long = 2L, maxHostsPerFp: Long = 16L): DataFrame = {
    val hf = pages.select(host.as("host"), fingerprint.as("fp")).distinct()
    val fpHosts = hf.groupBy(col("fp")).agg(count(lit(1)).as("n_hosts"))
      .filter(col("n_hosts") <= maxHostsPerFp)
    val kept = hf.join(fpHosts.select(col("fp")), Seq("fp"))
    val sizes = kept.groupBy(col("host")).agg(count(lit(1)).as("n_fps"))
    val a = kept.select(col("fp"), col("host").as("host_a"))
    val b = kept.select(col("fp"), col("host").as("host_b"))
    a.join(b, Seq("fp")).filter(col("host_a") < col("host_b"))
      .groupBy(col("host_a"), col("host_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(sizes.select(col("host").as("host_a"), col("n_fps").as("n_a")), Seq("host_a"))
      .join(sizes.select(col("host").as("host_b"), col("n_fps").as("n_b")), Seq("host_b"))
      .select(col("host_a"), col("host_b"), col("n_shared"), col("n_a"), col("n_b"))
  }

  /** [[mirrorHosts]] over a persistent fingerprint store (see
    * [[graft.streaming.StreamOps.fpIngestStream]]): the store's
    * `(host, fingerprint, "fp", cnt)` state rows ARE the distinct
    * (host, fp) relation — duplicate observations across batches were
    * compacted into the count at fold time — so the mirror report runs
    * over the whole crawl history without rescanning any page. */
  def mirrorHostsFromStore(spark: org.apache.spark.sql.SparkSession, store: String,
      minShared: Long = 2L, maxHostsPerFp: Long = 16L): DataFrame =
    mirrorHosts(
      graft.ops.EdgeStore.state(spark, store).filter(col("sent") === "fp")
        .select(col("source").as("host"), col("target").as("fp")),
      col("host"), col("fp"), minShared, maxHostsPerFp)

  /** Resolve redirect chains to their terminal target by pointer doubling:
    * `redirects` is the (src, dst) hop relation a crawler accretes from
    * 3xx responses and meta-refresh tags; the output maps every redirecting
    * url to the end of its chain with the hop count
    * (url, final_url, hops).
    *
    * Each round substitutes every pointer with the pointee's CURRENT
    * pointer (f(u) <- f(f(u)), hops adding), so after `doublingRounds`
    * rounds every chain of length <= 2^doublingRounds is fully resolved —
    * rounds is the contract, like kg_scc's bounded peeling: real redirect
    * chains are browser-capped (~20 hops), so 5 rounds covers them, and a
    * redirect CYCLE (which never terminates) simply stops advancing its
    * `final_url` while its hop count saturates — bounded and deterministic,
    * no driver-side convergence polling. Each round is ONE self
    * left-join on the url key; the whole loop stays a single lazy plan
    * (small fixed budget — AQE materializes each exchange once; see
    * GraphOps.roundCkpt note on lazy round loops). */
  def resolveRedirects(redirects: DataFrame, doublingRounds: Int = 3): DataFrame = {
    var cur = redirects.select(col("src"), col("dst").as("cur"), lit(1L).as("hops"))
    for (_ <- 1 to doublingRounds) {
      val next = cur.select(col("src").as("n_src"), col("cur").as("n_cur"),
        col("hops").as("n_hops"))
      cur = cur.join(next, cur("cur") === next("n_src"), "left")
        .select(col("src"),
          coalesce(col("n_cur"), col("cur")).as("cur"),
          (col("hops") + coalesce(col("n_hops"), lit(0L))).as("hops"))
    }
    cur.select(col("src").as("url"), col("cur").as("final_url"), col("hops"))
  }

  // ------------------------------------------------------------------
  // Deterministic linked-page fixture (the oracle mirror).
  //
  // The registered web_* queries run over the driver's `documents` table,
  // which has no html column — so the queries synthesize one per row with a
  // formula the DuckDB oracle replicates symbolically (same pattern as
  // mm_frame_sample). The link derivation is the SPEC; the engine must
  // recover exactly these edges from the real markup, so a regex that
  // misses an anchor form, botches relative resolution, or fails to filter
  // a decoy shows up as an oracle row mismatch.
  //
  // Per doc i (url https://h{i%40}.example.test/doc/{i}):
  //   links j = 1 .. 1 + i%3, dst_id = (i*31 + j*97) % 1000
  //   odd j: absolute double-quoted href to dst_id's own host
  //   even j: single-quoted ROOT-RELATIVE href /doc/{dst_id} (resolves to
  //           the SOURCE host — same-site navigation, like real pages)
  //   anchor: "see topic{dst_id%7} doc {dst_id}"
  // plus three decoys that must NOT extract: an <a> without href, a
  // fragment-only link, and a mailto link.
  // The <head> carries a rel=canonical declaration to doc (i - i%2) — odd
  // pages alias their even predecessor, even pages self-canonicalize —
  // with attribute ORDER and QUOTE STYLE varied by parity (even:
  // rel-then-href double-quoted; odd: href-then-rel single-quoted,
  // self-closing), plus a rel=stylesheet decoy that must NOT extract.
  // ------------------------------------------------------------------

  def syntheticUrl(id: Column): Column =
    concat(lit("https://h"), pmod(id, lit(40L)).cast("string"),
      lit(".example.test/doc/"), id.cast("string"))

  def syntheticLinkedHtml(id: Column, text: Column): Column = {
    val items = transform(sequence(lit(1L), lit(1L) + pmod(id, lit(3L))), j => {
      val dst = pmod(id * 31L + j * 97L, lit(1000L))
      val anchor = concat(lit("see topic"), pmod(dst, lit(7L)).cast("string"),
        lit(" doc "), dst.cast("string"))
      when(pmod(j, lit(2L)) === 1L,
        concat(lit("<li><a class=\"ref\" href=\"https://h"),
          pmod(dst, lit(40L)).cast("string"), lit(".example.test/doc/"),
          dst.cast("string"), lit("\">"), anchor, lit("</a></li>")))
        .otherwise(concat(lit("<li><a href='/doc/"), dst.cast("string"),
          lit("'>"), anchor, lit("</a></li>")))
    })
    val canonId = id - pmod(id, lit(2L))
    val canonUrl = concat(lit("https://h"), pmod(canonId, lit(40L)).cast("string"),
      lit(".example.test/doc/"), canonId.cast("string"))
    val canonTag = when(pmod(id, lit(2L)) === 0L,
      concat(lit("<link rel=\"canonical\" href=\""), canonUrl, lit("\">")))
      .otherwise(concat(lit("<link href='"), canonUrl, lit("' rel='canonical'/>")))
    concat(
      lit("<html><head><title>t</title>"), canonTag,
      lit("<link rel=\"stylesheet\" href=\"/s.css\"></head><body><p>"), text,
      lit("</p><a name=\"x\">not a link</a><a href=\"#top\">top</a>" +
        "<a href=\"mailto:a@b.c\">mail</a><ul>"),
      array_join(items, ""),
      lit("</ul></body></html>"))
  }

  /** The documents table as synthetic linked pages: (url, html). */
  def syntheticLinkedPages(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(syntheticUrl(id).as("url"),
      encode(syntheticLinkedHtml(id, text), "UTF-8").as("html"))

  /** Deterministic redirect-map fixture over the documents table: doc i with
    * i % 4 != 0 redirects to doc i-1 — chains of length up to 3 ending at
    * the nearest multiple of 4 (which does not redirect). The oracle replays
    * the formula and unrolls the doubling rounds symbolically. */
  def syntheticRedirects(docs: DataFrame, id: Column): DataFrame =
    docs.filter(pmod(id, lit(4L)) =!= 0L)
      .select(syntheticUrl(id).as("src"), syntheticUrl(id - 1L).as("dst"))
}
