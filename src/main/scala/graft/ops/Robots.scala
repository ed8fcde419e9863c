package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Robots-exclusion (RFC 9309) evaluation at corpus scale — the crawl-stack
  * piece between frontier selection ([[WebGraph.frontier]]) and fetching: a
  * candidate url may only be fetched if the target host's robots.txt allows
  * it. The reference pipeline starts from fetched text and never sees this
  * layer; it is the engine extension the Common-Crawl input shape implies.
  *
  * Scope (documented simplifications, RobotsSpec pins each):
  *   - only the `User-agent: *` group is honored (a per-agent overload is a
  *     column away — the group name rides every rule row);
  *   - `Allow` / `Disallow` path prefixes, literal match only (no `*` / `$`
  *     wildcards — rows with wildcards are kept verbatim and simply match
  *     their literal prefix up to the first wildcard char's absence);
  *   - precedence per RFC 9309: LONGEST matching prefix wins; on equal
  *     length Allow wins; no matching rule (or no rules at all) = allowed;
  *     an empty `Disallow:` value is "disallow nothing" and is dropped.
  *
  * Parsing is a row-local typed flatMap (one robots body is a few hundred
  * bytes; a per-host parse is not a column-HOF shape worth forcing), so the
  * relation stays shuffle-free until the host-keyed rule join. */
object Robots {

  /** One `Allow`/`Disallow` line of a host's `User-agent: *` group. */
  final case class Rule(host: String, allow: Boolean, prefix: String)

  /** Parse robots.txt bodies into the rule relation: (host, allow, prefix).
    * Group tracking: a `User-agent:` line opens a new group (consecutive
    * UA lines stack onto the same group); rule lines bind to the open
    * group; only groups containing `*` emit. Comments (`#…`) stripped. */
  def rules(docs: DataFrame, host: Column, body: Column): Dataset[Rule] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(host.cast("string").as("h"), body.cast("string").as("b"))
      .as[(String, String)]
      .flatMap { case (h, b) => parseBody(h, Option(b).getOrElse("")) }
  }

  private[ops] def parseBody(host: String, body: String): Seq[Rule] = {
    val out = Seq.newBuilder[Rule]
    var starGroup = false   // the open group applies to '*'
    var inUaRun = false     // currently stacking consecutive User-agent lines
    for (raw <- body.split("\n", -1)) {
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inUaRun) { starGroup = false; inUaRun = true } // new group
            if (value == "*") starGroup = true
          case "allow" | "disallow" =>
            inUaRun = false
            // empty Disallow = "disallow nothing": not a rule. Empty Allow
            // likewise matches nothing useful — both dropped.
            if (starGroup && value.nonEmpty)
              out += Rule(host, allow = key == "allow", prefix = value)
          case _ => inUaRun = false // crawl-delay etc. close the UA run
        }
      }
    }
    out.result()
  }

  /** Crawl-delay seconds of the `User-agent: *` group, one row per host
    * that declares one: (host, delay_sec). Non-numeric values are dropped
    * (total — a junk robots line cannot kill a trillion-row job). */
  def crawlDelays(docs: DataFrame, host: Column, body: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(host.cast("string").as("h"), body.cast("string").as("b"))
      .as[(String, String)]
      .flatMap { case (h, b) =>
        var starGroup = false
        var inUaRun = false
        var delay: Option[Long] = None
        for (raw <- Option(b).getOrElse("").split("\n", -1)) {
          val line = raw.takeWhile(_ != '#').trim
          val colon = line.indexOf(':')
          if (colon > 0) {
            val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
            val value = line.substring(colon + 1).trim
            key match {
              case "user-agent" =>
                if (!inUaRun) { starGroup = false; inUaRun = true }
                if (value == "*") starGroup = true
              case "crawl-delay" =>
                inUaRun = false
                if (starGroup && delay.isEmpty)
                  delay = scala.util.Try(value.toLong).toOption
              case _ => inUaRun = false
            }
          }
        }
        delay.map(d => (h, d))
      }.toDF("host", "delay_sec")
  }

  /** Filter candidate urls by the rule relation: keeps urls whose host has
    * no matching rule or whose LONGEST matching prefix is an Allow (ties go
    * to Allow). Output: (url, allowed) for every input url — callers filter
    * on `allowed` or keep the column as provenance.
    *
    * Shape: one host-keyed join (urls × that host's few rules), prefix
    * filter, then a per-url WindowGroupLimit argmax — rules relations are
    * ~|hosts| rows, so at web scale this is a url-partitioned join against
    * a relation 4-6 orders of magnitude smaller (broadcast when it fits). */
  def allowed(urls: DataFrame, url: Column, rulesDf: DataFrame): DataFrame = {
    val u = urls.select(url.as("url"),
        UrlOps.hostOf(url).as("host"),
        // the path component (query/fragment kept out of robots matching)
        regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1).as("path"))
      .withColumn("path", when(col("path") === "", lit("/")).otherwise(col("path")))
      .distinct()
    // winning rule per url = max over matching rules of (prefix length,
    // allow): longest prefix first, Allow above Disallow on ties (boolean
    // max) — one partial-agg exchange, no per-url sort
    val best = u.join(rulesDf, Seq("host"))
      .filter(col("path").startsWith(col("prefix")))
      .groupBy(col("url"))
      .agg(max(struct(length(col("prefix")).as("l"), col("allow").as("a"))).as("best"))
    u.select(col("url")).join(best, Seq("url"), "left")
      .select(col("url"), coalesce(col("best.a"), lit(true)).as("allowed"))
  }
}
