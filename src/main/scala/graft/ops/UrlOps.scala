package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web-page dedup — step zero of every
  * Common-Crawl-style curation pipeline (the reference ingests pre-fetched
  * text and never sees URLs; this is the engine extension the BASELINE
  * input shape `(url, warc_ts, html, text, lang)` calls for).
  *
  * Canonical form, applied in order:
  *   1. trim surrounding whitespace;
  *   2. lowercase the scheme://host[:port] prefix ONLY (paths are
  *      case-sensitive per RFC 3986 — `/Art` and `/art` stay distinct);
  *   3. drop the default port (`:80` for http, `:443` for https);
  *   4. drop the `#fragment` (never sent to the server);
  *   5. drop `utm_*` tracking params, then sort the surviving query params
  *      byte-lexicographically (param order is not semantic);
  *   6. strip trailing slashes from a non-root path; empty path becomes `/`.
  *
  * Everything is composed from codegen'd built-ins (regexp_extract /
  * regexp_replace / split / array_sort / array_join) — one narrow map-side
  * projection, no UDF, whole-stage-codegen friendly, and every step is
  * mirrorable in the DuckDB oracle as an independent SQL expression of the
  * same spec. Inputs without a `scheme://` prefix pass through as
  * lower(trim(url)) — a total function, never an error, so a malformed URL
  * in a trillion-row scan cannot kill the job. */
object UrlOps {

  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    // scheme://authority — everything up to the first /, ? or # after ://
    val prefixRaw = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val lowPrefix = lower(prefixRaw)
    val prefix = when(lowPrefix.startsWith("http://") && lowPrefix.endsWith(":80"),
        lowPrefix.substr(lit(1), length(lowPrefix) - 3))
      .when(lowPrefix.startsWith("https://") && lowPrefix.endsWith(":443"),
        lowPrefix.substr(lit(1), length(lowPrefix) - 4))
      .otherwise(lowPrefix)
    val rest = u.substr(length(prefixRaw) + 1, length(u))
    val noFrag = regexp_replace(rest, "#.*", "")
    val path = regexp_extract(noFrag, "^[^?]*", 0)
    val query = regexp_replace(noFrag, "^[^?]*\\??", "")
    val params = array_join(
      array_sort(filter(split(query, "&"),
        x => !x.startsWith("utm_") && x =!= lit(""))), "&")
    val pathTrimmed = rtrim(path, "/")
    val pathCanon = when(pathTrimmed === "", lit("/")).otherwise(pathTrimmed)
    val canon = concat(prefix, pathCanon,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
    when(prefixRaw === "", lower(u)).otherwise(canon)
  }

  /** Host (registrable authority minus userinfo and port) of a URL — the
    * grouping key for per-domain corpus rollups. `user:pw@` credentials are
    * skipped (real crawls contain them), IPv6 literals come back in their
    * bracket form (`[::1]`), and inputs without a scheme://host prefix yield
    * the empty string (total, like [[canonicalizeUrl]]). The host is
    * lowercased even when the input URL is not canonical yet. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(trim(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?(\\[[^\\]]*\\]|[^/:?#]+)", 1))

  /** Country-code second-level suffixes under which a THIRD label is needed
    * to make a registrable domain (the high-traffic subset of the public
    * suffix list; the full PSL is a data-file swap behind the same column
    * expression — this subset is pinned so the DuckDB oracle can replay the
    * identical decision). */
  val ccSlds: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "com.tr",
    "com.ar", "co.za", "com.sg", "com.hk", "co.nz", "com.tw")

  /** Registrable domain (pay-level domain): the host's last two labels, or
    * last three when the 2-label suffix is a [[ccSlds]] country-code SLD —
    * the grouping key for domain-level corpus caps and the host-graph
    * coarsening one level above [[hostOf]] (`w3.shop.co.uk` and
    * `w5.shop.co.uk` are the same publisher). Total: IP literals,
    * single-label hosts and scheme-less junk pass through as [[hostOf]]'s
    * result. Pure codegen'd built-ins (split / element_at / isin). */
  def registrableDomain(url: Column): Column = {
    val host = hostOf(url)
    val parts = split(host, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".", element_at(parts, -3), element_at(parts, -2),
      element_at(parts, -1))
    when(n <= 2, host)
      .when(last2.isin(ccSlds: _*), last3)
      .otherwise(last2)
  }

  /** Per-host document cap — domain balancing for training corpora: no host
    * contributes more than `cap` documents. The keep decision is a
    * deterministic md5 rank within the host (ties broken by id), so reruns
    * and different partitionings agree and the selection is an unbiased
    * hash-sample of the host's pages, not a scan-order artifact.
    *
    * One exchange on the host key; the per-host window is a sort of that
    * host's rows, so a pathological mega-host concentrates in one task — at
    * web scale, pre-screen hosts with the CMS heavy-hitter sketch
    * ([[graft.ops.Sketches.cmsSketch]]) and window only the offenders (hosts
    * under the cap keep everything unconditionally). Output: (id, host) of
    * the kept documents. */
  def hostCap(df: DataFrame, url: Column, id: Column, cap: Int): DataFrame =
    Sampling.groupCap(
      df.select(id.cast("long").as("id"), hostOf(url).as("host")),
      col("host"), col("id"), cap)

  /** Per-host spider-trap signals — the URL-shape diagnostics a crawl
    * scheduler reads before committing budget to a host (calendar loops,
    * session-id explosions, infinitely-deep faceted navigation):
    *
    *  - n_urls / n_paths: URL count vs DISTINCT path count — a host with
    *    many URLs but few paths is exploding on query params;
    *  - max_depth: deepest path (segment count) seen on the host;
    *  - n_repeat_seg: URLs with an IDENTICAL ADJACENT path-segment pair
    *    (`/cal/cal/...` — the canonical crawler-trap loop shape);
    *  - n_params / params_ppm: total query parameters and the exact
    *    per-URL average in ppm (BIGINT truncating division, cross-engine).
    *
    * All signals are map-side string/array expressions (codegen'd
    * built-ins); the only exchange is the host rollup, with partial
    * aggregation. Pair with [[hostCap]] / the frontier scheduler: hosts
    * with high n_repeat_seg or params_ppm get their budget cut. Engine
    * extension (the reference never sees URLs). */
  def trapSignals(df: DataFrame, url: Column): DataFrame = {
    val path = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val query = regexp_extract(url, raw"\?([^#]*)", 1)
    val segs = filter(split(path, "/"), s => s =!= "")
    val nparams = when(query === "", 0L)
      .otherwise(size(split(query, "&")).cast("long"))
    val repeatSeg = when(size(segs) >= 2,
      exists(transform(sequence(lit(1), size(segs) - 1),
        i => element_at(segs, i) === element_at(segs, i + 1)), x => x))
      .otherwise(lit(false))
    df.select(hostOf(url).as("host"), path.as("p"),
        size(segs).cast("long").as("depth"), nparams.as("np"),
        when(repeatSeg, 1L).otherwise(0L).as("rep"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col("p")).as("n_paths"),
        max(col("depth")).as("max_depth"),
        sum(col("rep")).as("n_repeat_seg"),
        sum(col("np")).as("n_params"))
      .withColumn("params_ppm", expr("(n_params * 1000000L) div n_urls"))
  }
}
