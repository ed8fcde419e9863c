package graft.cli

import graft.core.{Graph, GraphLink, GraphNode}
import graft.graph.{D3Json, GraphOps}

/** CLI mirroring `python -m arelight.run.operations` (reference
  * arelight/run/operations.py:85-149): set algebra over two force-graph JSONs,
  * extended with single-graph analytics (engine extension — the reference has
  * no analytics surface).
  *
  * Usage: runMain graft.cli.Operations --a A.json --b B.json \
  *          --operation UNION|INTERSECTION|DIFFERENCE --out DIR [--name N] [--weights y|n]
  *          [--host PORT]  (serve the written artifact on a local port and
  *            block — reference `--host` parity, graft.graph.Serve)
  *
  * Analytics (read --a only, write <out>/analytics.csv + summary JSON line):
  *   --operation PAGERANK|PPR|HITS|COMPONENTS|LPA|KCORE|BFS|CLUSTCOEFF|KTRUSS|
  *               WALKS|NODE2VEC|DEGHIST|ASSORT|HARMONIC|HYPERBALL|NTRIPLES|TURTLE|
  *               LOUVAIN|COMMUNITIES|WL|TRUSTRANK|SPAMMASS|BGP|DESCRIBE|
  *               ASOF|ASOFDELTA (versioned-KG reads: --changelog-store DIR
  *                 with --t EPOCH, or --t1/--t2 for the diff)
  *   [--iters N] [--source NODE (PPR/BFS)] [--k N (KCORE/KTRUSS)]
  *   [--patterns "?x pos ?y; ?y neg ?z" (BGP: ';'-separated triple patterns —
  *     variables '?v', constants, '^p' inverse, '!p1|p2' negated sets;
  *     auto-ordered by the greedy selectivity planner)]
  *   [--rounds N (KTRUSS peeling depth, default 8; LOUVAIN/WL refinement)]
  *   [--seed S (WALKS/NODE2VEC)] [--seeds a,b (TRUSTRANK/SPAMMASS whitelist)]
  *   [--master local[N]]
  * Analytics can also run straight over an `Infer --links` output instead of
  * a force JSON: `--links-parquet DIR` loads DIR/links, host-coarsens and
  * count-weights it — the crawl -> host-authority path with no JSON hop.
  * FRONTIER reads the persistent in-link store instead (`--frontier-store
  * DIR [--crawled PARQUET] [--per-host N]`) — the scheduler query over
  * state accreted by `Infer --frontier-store` / frontierIngestStream.
  * MIRRORS reads the persistent fingerprint store (`--fp-store DIR
  * [--min-shared N]`) — shared-content host pairs over the whole crawl
  * history accreted by StreamOps.fpIngestStream.
  * COMPONENTS with `--component-store DIR [--batch-id ID]` folds this
  * graph's edges into the persistent label store (exactly-once) and reads
  * the accreted labels — continuous entity resolution.
  * SSSP (`--source NODE [--iters N]`), PARTSTATS (`--parts N`) and LPEVAL
  * (`--test-mod N`) run the Bellman-Ford distances, the placement-quality
  * report and the filtered link-prediction ranking over the same edges.
  * NTRIPLES writes <out>/graph.nt and TURTLE <out>/graph.ttl (RDF dumps)
  * instead of the csv.
  * DELTA reads BOTH --a and --b and writes the edge-level
  * added/removed/changed/stable diff as analytics.csv.
  * Count-weighted graphs expected (Infer's default export): the PageRank
  * family fails fast on fractional weights (GraphOps.pageRank's guard).
  */
object Operations {

  private val Analytics =
    Set("PAGERANK", "PPR", "HITS", "COMPONENTS", "LPA", "KCORE", "BFS", "CLUSTCOEFF",
      "KTRUSS", "WALKS", "NODE2VEC", "DEGHIST", "ASSORT", "HARMONIC", "HYPERBALL",
      "NTRIPLES", "TURTLE", "MIS", "KATZ", "MODULARITY", "SCC", "NEIGHBORHOOD", "CLOSENESS",
      "FRONTIER", "MIRRORS", "SSSP", "PARTSTATS", "LPEVAL",
      "LOUVAIN", "COMMUNITIES", "WL", "TRUSTRANK", "SPAMMASS", "BGP", "DESCRIBE",
      "ASOF", "ASOFDELTA")

  private def seedList(opts: Map[String, String]): Seq[String] =
    opts.getOrElse("--seeds", sys.error(s"this operation requires --seeds a,b,..."))
      .split(",").toSeq.filter(_.nonEmpty)

  private def runAnalytics(a: Option[Graph], b: Option[Graph], op: String,
      opts: Map[String, String], out: String): Unit = {
    val master = opts.getOrElse("--master",
      s"local[${math.min(8, Runtime.getRuntime.availableProcessors)}]")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(master).appName("graft-operations")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit}
    // --links-parquet DIR: analytics straight over an `Infer --links` link
    // relation — host-coarsened, count-weighted (the crawl -> host-authority
    // path with no JSON hop). Otherwise edges come from the --a force JSON.
    lazy val edges = opts.get("--links-parquet") match {
      case Some(dir) =>
        spark.read.parquet(s"$dir/links")
          .select(graft.ops.UrlOps.hostOf(col("src")).as("source"),
            graft.ops.UrlOps.hostOf(col("dst")).as("target"))
          .groupBy(col("source"), col("target"))
          .agg(count(lit(1)).cast("double").as("c"))
          .select(col("source"), col("target"), lit("href").as("sent"), col("c"))
      case None =>
        val g = a.getOrElse(sys.error("--a (force JSON) or --links-parquet required"))
        g.links.map(l => (l.source, l.target, l.sent, l.c)).toDF("source", "target", "sent", "c")
    }
    val iters = opts.getOrElse("--iters", "3").toInt
    val result = op match {
      // FRONTIER: crawl-scheduler read over the persistent in-link store
      // (Infer --frontier-store / StreamOps.frontierIngestStream feed it);
      // --crawled PARQUET excludes already-fetched urls (url column)
      case "FRONTIER" =>
        val crawled = opts.get("--crawled")
          .map(p => spark.read.parquet(p).select(col("url")))
          .getOrElse(Seq.empty[String].toDF("url"))
        graft.ops.WebGraph.frontierFromStore(spark,
          opts.getOrElse("--frontier-store", sys.error("FRONTIER requires --frontier-store")),
          crawled, opts.getOrElse("--per-host", "2").toInt)
      // MIRRORS: mirror/shared-content host pairs over the persistent
      // fingerprint store (StreamOps.fpIngestStream feeds it)
      case "MIRRORS" =>
        graft.ops.WebGraph.mirrorHostsFromStore(spark,
          opts.getOrElse("--fp-store", sys.error("MIRRORS requires --fp-store")),
          opts.getOrElse("--min-shared", "2").toLong)
      // --rank-store DIR: resume the exact iteration from the stored
      // snapshot and swap the advanced ranks back (continuous analytics
      // over the accreting KG — pairs with Infer's --edge-store)
      case "PAGERANK"   => opts.get("--rank-store") match {
        case Some(dir) => graft.graph.RankStore.advance(edges, dir, iters)
        case None      => GraphOps.pageRank(edges, iters)
      }
      case "PPR"        => GraphOps.personalizedPageRank(edges,
        opts.getOrElse("--source", sys.error("PPR requires --source NODE")), iters)
      case "HITS"       => GraphOps.hits(edges, math.max(1, iters - 1))
      // --component-store DIR: continuous entity resolution — with
      // --batch-id, fold THIS graph's edges in (exactly-once), then read the
      // accreted labels; without it, just read the store (pairs with
      // Infer --component-store / the store queries)
      case "COMPONENTS" => opts.get("--component-store") match {
        case Some(dir) =>
          opts.get("--batch-id").foreach { bid =>
            if (!graft.ops.ComponentStore.merge(edges, dir, bid))
              System.err.println(
                s"batch '$bid' already in $dir ledger; fold skipped (idempotent retry)")
          }
          graft.ops.ComponentStore.state(spark, dir)
        case None => GraphOps.connectedComponents(edges)
      }
      case "LPA"        => GraphOps.labelPropagation(edges, iters)
      case "KCORE"      => GraphOps.kCore(edges, opts.getOrElse("--k", "2").toLong, iters + 1)
      case "BFS"        => GraphOps.bfs(edges,
        opts.getOrElse("--source", sys.error("BFS requires --source NODE")), iters)
      case "CLUSTCOEFF" => GraphOps.clusteringCoeff(edges)
      // peeling cascades can need many rounds (each round only removes the
      // currently-unsupported edges) — --rounds defaults DEEP, unlike --iters
      case "KTRUSS"     => GraphOps.kTruss(edges, opts.getOrElse("--k", "3").toLong,
        opts.getOrElse("--rounds", "8").toInt)
      case "WALKS"      => GraphOps.randomWalks(edges, iters,
        opts.getOrElse("--seed", "w"))
      case "NODE2VEC"   => GraphOps.node2vecWalks(edges, iters,
        seed = opts.getOrElse("--seed", "n2v"))
      case "DEGHIST"    => GraphOps.degreeHistogram(edges)
      case "ASSORT"     => GraphOps.assortativity(edges)
      case "HARMONIC"   => GraphOps.harmonic(edges, iters)
      case "HYPERBALL"  =>
        val sizes = GraphOps.hyperBallSizes(
          GraphOps.hyperBall(edges, p = 8, rounds = iters), p = 8)
        sizes.toSeq.toDF("id", "est_ball_size")
      case "NTRIPLES"   => graft.graph.Rdf.ntriples(edges)
      case "TURTLE"     => graft.graph.Rdf.turtle(edges)
      case "MIS"        => GraphOps.maximalIndependentSet(edges,
        opts.getOrElse("--rounds", "8").toInt)
      case "KATZ"       => GraphOps.katz(edges, iters)
      case "MODULARITY" => GraphOps.modularity(edges, iters)
      case "SCC"        => GraphOps.scc(edges, outerRounds = iters, innerRounds = iters)
      case "NEIGHBORHOOD" => GraphOps.neighborhoodFunction(edges, iters)
      case "CLOSENESS"  => GraphOps.closeness(edges, iters)
      case "SSSP"       => GraphOps.sssp(edges,
        opts.getOrElse("--source", sys.error("SSSP requires --source NODE")), iters)
      case "PARTSTATS"  => GraphOps.partitionStats(edges,
        opts.getOrElse("--parts", "8").toInt)
      case "LPEVAL"     => GraphOps.linkPredictionEval(edges,
        opts.getOrElse("--test-mod", "4").toInt)
      case "DELTA"      =>
        val be = b.get.links.map(l => (l.source, l.target, l.sent, l.c))
          .toDF("source", "target", "sent", "c")
        GraphOps.edgeDelta(edges, be)
      case "LOUVAIN"     => GraphOps.louvainMoves(edges,
        opts.getOrElse("--rounds", "4").toInt)
      case "COMMUNITIES" => GraphOps.communityProfile(edges,
        opts.getOrElse("--rounds", "4").toInt)
      case "WL"          => GraphOps.wlLabels(edges,
        opts.getOrElse("--rounds", "2").toInt)
      // --seeds a,b,c: the trusted whitelist (node ids / hosts)
      case "TRUSTRANK"   => GraphOps.trustRank(edges,
        col("id").isin(seedList(opts): _*), iters)
      case "SPAMMASS"    => GraphOps.spamMass(edges,
        col("id").isin(seedList(opts): _*), iters)
      // SPARQL over the graph's (source, sent, target) viewed as (s, p, o):
      // the KG-consumer query surface, reachable straight from the CLI
      case "BGP" =>
        val pats = opts.getOrElse("--patterns",
            sys.error("BGP requires --patterns \"?x p ?y; ?y q ?z\""))
          .split(";").toIndexedSeq.map(_.trim).filter(_.nonEmpty).map { t =>
            t.split("\\s+") match {
              case Array(ts, tp, to) => graft.ops.Bgp.Pat(ts, tp, to)
              case _ => sys.error(s"bad pattern '$t' (need exactly 3 terms)")
            }
          }
        // --plan stats: measure per-pattern cardinalities with one scan and
        // order the join chain by them; default is the shape-based planner.
        // --stats-store DIR: run over a resident EdgeStore KG and plan from
        // its persisted per-predicate counts — NO extra scan (the stats are
        // maintained by the store's own merges, Bgp.planPatternsCached)
        val (rel, planned) = opts.get("--stats-store") match {
          case Some(dir) =>
            val r = bgpRel(graft.ops.EdgeStore.edges(spark, dir))
            val pl = graft.ops.EdgeStore.stats(spark, dir) match {
              case Some((counts, total)) =>
                graft.ops.Bgp.planPatternsCached(counts, total, pats)
              case None => graft.ops.Bgp.planPatterns(pats) // pre-stats store
            }
            (r, pl)
          case None =>
            val r = bgpRel(edges)
            val pl =
              if (opts.get("--plan").contains("stats"))
                graft.ops.Bgp.planPatternsStats(r, pats)
              else graft.ops.Bgp.planPatterns(pats)
            (r, pl)
        }
        graft.ops.Bgp.matchPatterns(rel, planned)
      case "DESCRIBE" =>
        graft.ops.Bgp.describe(bgpRel(edges), seedList(opts))
      // versioned-KG reads over the persistent changelog store
      // (StreamOps.changelogIngestStream / ChangelogStore.merge feed it)
      case "ASOF" =>
        graft.ops.ChangelogStore.snapshot(spark,
          opts.getOrElse("--changelog-store", sys.error("ASOF requires --changelog-store")),
          opts.getOrElse("--t", sys.error("ASOF requires --t EPOCH")).toLong)
      case "ASOFDELTA" =>
        graft.ops.ChangelogStore.delta(spark,
          opts.getOrElse("--changelog-store", sys.error("ASOFDELTA requires --changelog-store")),
          opts.getOrElse("--t1", sys.error("ASOFDELTA requires --t1")).toLong,
          opts.getOrElse("--t2", sys.error("ASOFDELTA requires --t2")).toLong)
    }
    val cols = result.columns
    val rows = result.orderBy(cols.head, cols.tail: _*).collect() // graph-sized
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    if (op == "NTRIPLES" || op == "TURTLE") {
      // NTRIPLES: one statement per line -> graph.nt; TURTLE: one subject
      // block per paragraph -> graph.ttl (blocks are independently valid,
      // so plain concatenation is a correct document)
      val (colName, file, sep) =
        if (op == "NTRIPLES") ("line", "graph.nt", "\n") else ("block", "graph.ttl", "\n\n")
      val li = cols.indexOf(colName)
      val body = rows.map(_.getString(li)).mkString("", sep, "\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/$file"),
        body.getBytes("UTF-8"))
      println(s"""{"operation":"$op","rows":${rows.length},"out":"$out/$file"}""")
    } else {
      val csv = (cols.mkString(",") +: rows.map(_.toSeq.mkString(","))).mkString("", "\n", "\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/analytics.csv"),
        csv.getBytes("UTF-8"))
      println(s"""{"operation":"$op","rows":${rows.length},"out":"$out/analytics.csv"}""")
    }
    spark.stop()
  }

  /** The edge relation as an (s, p, o) triple view for the SPARQL surface. */
  private def bgpRel(edges: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions.col
    edges.select(col("source").as("s"), col("sent").as("p"), col("target").as("o"))
  }

  /** Minimal force-graph JSON reader for the reference layout (driver-sized). */
  private[cli] def parseGraph(json: String): Graph = {
    // tiny recursive-descent JSON parser: objects/arrays/strings/numbers only
    val s = json; var i = 0
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(c: Char): Unit = { ws(); require(s(i) == c, s"expected $c at $i"); i += 1 }
    def str(): String = {
      ws(); expect('"'); val b = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case 'n' => b += '\n'; case 't' => b += '\t'; case 'r' => b += '\r'
            case 'b' => b += '\b'; case 'f' => b += '\f'
            case 'u' => b += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c   => b += c
          }
        } else b += s(i)
        i += 1
      }
      i += 1; b.toString
    }
    def num(): Double = {
      ws(); val start = i
      while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
      s.substring(start, i).toDouble
    }
    def value(): Any = {
      ws()
      s(i) match {
        case '{' => obj(); case '[' => arr(); case '"' => str()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _   => num()
      }
    }
    def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (s(i) == '}') { i += 1; Map.empty }
      else {
        val b = Map.newBuilder[String, Any]
        var done = false
        while (!done) {
          val k = str(); expect(':'); b += (k -> value()); ws()
          if (s(i) == ',') i += 1 else { expect('}'); done = true }
        }
        b.result()
      }
    }
    def arr(): Vector[Any] = {
      expect('['); ws()
      if (s(i) == ']') { i += 1; Vector.empty }
      else {
        val b = Vector.newBuilder[Any]
        var done = false
        while (!done) {
          b += value(); ws()
          if (s(i) == ',') i += 1 else { expect(']'); done = true }
        }
        b.result()
      }
    }
    val root = obj()
    def d(a: Any): Double = a match { case x: Double => x; case x => x.toString.toDouble }
    Graph(
      basis = root.getOrElse("basis", Vector.empty).asInstanceOf[Vector[Any]].map(_.toString),
      equation = root.getOrElse("equation", "").toString,
      nodes = root.getOrElse("nodes", Vector.empty).asInstanceOf[Vector[Any]].map { n =>
        val m = n.asInstanceOf[Map[String, Any]]
        GraphNode(m("id").toString, d(m("c")))
      },
      links = root.getOrElse("links", Vector.empty).asInstanceOf[Vector[Any]].map { l =>
        val m = l.asInstanceOf[Map[String, Any]]
        GraphLink(m("source").toString, m("target").toString, d(m("c")), m("sent").toString)
      })
  }

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    def read(p: String) = parseGraph(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"))
    val op = opts.getOrElse("--operation", GraphOps.Union)
    // fail fast with the op name BEFORE demanding the algebra branch's --b
    // (an unknown op used to surface as `key not found: --b`)
    val algebraOps = Set(GraphOps.Union, GraphOps.Intersection, GraphOps.Difference)
    if (!Analytics.contains(op) && op != "DELTA" && !algebraOps.contains(op))
      throw new IllegalArgumentException(s"unknown operation: $op")
    if (Analytics.contains(op) || op == "DELTA") {
      val bOpt = if (op == "DELTA") Some(read(opts("--b"))) else None
      runAnalytics(opts.get("--a").map(read), bOpt, op, opts,
        opts.getOrElse("--out", sys.error("--out required")))
      return
    }
    val a = read(opts("--a"))
    val b = read(opts("--b"))
    val weights = opts.getOrElse("--weights", "y") == "y"
    val out = opts.getOrElse("--out", sys.error("--out required"))
    val name = opts.getOrElse("--name", op.toLowerCase)
    val g = GraphOps(a, b, op, weights)
    D3Json.save(g, out, name, intLinkC = !weights, intNodeC = !weights)
    graft.graph.Viewer.save(out, name) // openable artifact: <out>/index.html
    println(s"""{"operation":"$op","nodes":${g.nodes.size},"links":${g.links.size},"out":"$out"}""")
    // reference parity: `--host PORT` serves the artifact and blocks
    // (arelight/run/operations.py:106-107)
    opts.get("--host").foreach(p => graft.graph.Serve.serveBlocking(out, p.toInt))
  }
}
