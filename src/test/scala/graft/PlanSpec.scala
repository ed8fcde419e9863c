package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the physical plans the engine promises
  * (SURVEY.md §4) — pushdown, pruning, broadcast — stay in place. */
class PlanSpec extends AnyFunSuite with SparkTestSession {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1: shipdate filter pushed to the parquet scan; only needed columns read") {
    val p = planOf("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("ReadSchema") && !p.contains("l_orderkey"),
      "scan must prune unused columns")
  }

  test("q3: dimension side broadcast") {
    val p = planOf("q3_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("kg_triples: documents scan reads only (doc_id, text, lang)") {
    val p = planOf("kg_triples")
    assert(p.contains("struct<doc_id:bigint,text:string,lang:string>"), p)
    assert(!p.contains("n_chars"), "unused documents columns must be pruned")
  }

  test("kg_edges: node-key lookup is a broadcast join, aggregation is partial+final hash agg") {
    val p = planOf("kg_edges")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("ann_lsh_pairs: scaled near-dup path is a bucket join — no cartesian product") {
    val p = planOf("ann_lsh_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("decontaminate_overlap: inverted-index join (probe filter pushed, no cartesian)") {
    val p = planOf("decontaminate_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LessThan(doc_id,25)") || p.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id"),
      s"probe-side doc_id filter must reach the scan:\n$p")
  }

  test("dedup_incremental: batch-vs-store bucket join — no cartesian, no batch x batch") {
    val p = planOf("dedup_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_semantic: LSH candidate path — no cartesian product") {
    val p = planOf("dedup_semantic")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ann_kmeans_topk: learned-cell search is a cell join — no cartesian product") {
    val p = planOf("ann_kmeans_topk")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ann_kmeans_probe: multi-probe search is still a cell join — no cartesian product") {
    val p = planOf("ann_kmeans_probe")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("layout_zorder: map-side bit interleave — no exchange in the plan") {
    val p = planOf("layout_zorder")
    assert(!p.contains("Exchange"), p)
  }

  test("row-local text family (c4/gopher/pii): no exchange in the plans") {
    for (q <- Seq("text_c4_filter", "text_gopher_rules", "text_pii_scrub")) {
      val p = planOf(q)
      assert(!p.contains("Exchange"), s"$q: $p")
    }
  }

  test("ann_ivf_pq: residual-PQ search is a cell equijoin — no cartesian product") {
    val p = planOf("ann_ivf_pq")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_simhash_pairs: chunk-banded candidate join — no cartesian product") {
    val p = planOf("dedup_simhash_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sample_stratified: pure filter over the scan — no shuffle, no Spark rng Sample") {
    val p = planOf("sample_stratified")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Sample"), p)
  }

  test("sample_weighted: data-dependent threshold is still a pure map-side filter") {
    val p = planOf("sample_weighted")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Sample"), p)
  }

  test("pack_chunks: doc-level prefix sum windows partition by block (no global sort of docs)") {
    val p = planOf("pack_chunks")
    // the per-doc window must carry a partition spec; the only unpartitioned
    // window (and its single-partition exchange) runs over the tiny
    // block-totals relation AFTER the per-block aggregation
    val docWindow = p.linesIterator.find(l => l.contains("Window") && l.contains("cum_in_block"))
    assert(docWindow.exists(_.contains("block")),
      s"doc-level cumulative window must be partitioned by block:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"block offsets must join back as a broadcast:\n$p")
  }

  test("kg_node_jaccard: wedge and degree joins are key joins — no cartesian") {
    val p = planOf("kg_node_jaccard")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("kg_top_relations: rank<=k pushed into the window operator (WindowGroupLimit)") {
    val p = planOf("kg_top_relations")
    assert(p.contains("WindowGroupLimit"),
      s"row_number+filter must become a group-limit, not a full per-key sort:\n$p")
  }

  test("text_lm_surprisal: corpus tokenized once — consumers read the checkpointed counts") {
    val p = planOf("text_lm_surprisal")
    assert(!p.contains("Generate"),
      s"trainer/scorer/total must read the materialized (id,bigram) counts, not re-tokenize:\n$p")
    assert(!p.contains("FileScan"),
      s"no consumer may rescan the corpus:\n$p")
  }

  test("kg_pmi: marginal joins are key joins; the one-row total broadcasts") {
    val p = planOf("kg_pmi")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop join allowed is the broadcast of the one-row total
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert(p.contains("BroadcastExchange"), "one-row total must broadcast")
  }

  test("text_tfidf_topk: per-doc top-k is a WindowGroupLimit; df join is a key join") {
    val p = planOf("text_tfidf_topk")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("kg_edges_incremental: merge is a key aggregation — no cartesian, no extra scan") {
    val p = planOf("kg_edges_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
    // both batches read the one localCheckpointed triples relation
    assert(!p.contains("FileScan"), s"batches must not rescan the corpus:\n$p")
  }

  test("ann_sq8: small query side broadcast over quantized codes") {
    val p = planOf("ann_sq8")
    assert(p.contains("BroadcastExchange"), p)
  }

  test("curate_keep: documents scan pruned to (doc_id, text)") {
    val p = planOf("curate_keep")
    assert(!p.contains("n_chars") && !p.contains("source"), "unused columns must be pruned")
    assert(p.contains("HashAggregate"), p)
  }

  test("stats sketches: one exchange total — partial agg collapses before the shuffle") {
    for (q <- Seq("stats_hll_registers", "stats_cms_sketch")) {
      val p = planOf(q)
      assert("Exchange".r.findAllIn(p).size == 1, s"$q must shuffle exactly once:\n$p")
      assert(p.contains("partial_"), s"$q needs map-side partial aggregation:\n$p")
    }
    // scans pruned to the sketched key only
    assert(!planOf("stats_hll_registers").contains("n_chars"))
    assert(!planOf("stats_cms_sketch").contains("n_chars"))
  }

  test("curate_url_canonical: pure map-side projection, zero shuffles") {
    val p = planOf("curate_url_canonical")
    assert(!p.contains("Exchange"), s"canonicalization must not shuffle:\n$p")
  }

  test("kg_clustering_coeff: wedge joins are key joins — no cartesian product") {
    val p = planOf("kg_clustering_coeff")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_spans: gram/coverage/rebuild are key joins and aggs — no cartesian") {
    val p = planOf("dedup_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p)
  }

  test("decontaminate_bloom: the bit relation broadcasts; probe join is hash, not cartesian") {
    val p = planOf("decontaminate_bloom")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ann_pq_topk: only the intended query broadcast is a nested-loop join") {
    val p = planOf("ann_pq_topk")
    assert(!p.contains("CartesianProduct"), p)
    // codes⨝codebook is a key join; the Q-row query relation rides ONE
    // broadcast nested loop (the declared all-pairs step, Q bounded)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("kg_node2vec / kg_hyperball / kg_harmonic: iterative rounds stay key-joined") {
    Seq("kg_node2vec", "kg_hyperball", "kg_harmonic").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q:\n$p")
    }
  }

  test("kg_ntriples: formatting adds no shuffle beyond the edge aggregation") {
    val pEdges = planOf("kg_edges")
    val pNt = planOf("kg_ntriples")
    def exchanges(s: String) = "Exchange".r.findAllIn(s).size
    assert(exchanges(pNt) == exchanges(pEdges),
      s"ntriples must be map-side over edges:\n$pNt")
  }

  test("web_links: extraction is shuffle-free and prunes the documents scan") {
    val p = planOf("web_links")
    assert(!p.contains("Exchange"), s"link extraction must be row-local:\n$p")
    assert(p.contains("struct<doc_id:bigint,text:string>"), p)
    assert(!p.contains("n_chars") && !p.contains("source"),
      "unused documents columns must be pruned")
  }

  test("web_host_graph: one exchange (the partial-agg host rollup), nothing else") {
    val p = planOf("web_host_graph")
    assert("Exchange".r.findAllIn(p).size == 1, s"host rollup must be one shuffle:\n$p")
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
  }

  test("web_pagerank / web_frontier: extracted-graph iterations stay key-joined") {
    for (q <- Seq("web_pagerank", "web_frontier")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q:\n$p")
    }
  }

  test("kg_bgp_orderlimit: sort+limit plans as TakeOrderedAndProject, never a full sort") {
    val p = planOf("kg_bgp_orderlimit")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("kg_bgp_values: the inline VALUES relation enters as a broadcast — no shuffle on its account") {
    val p = planOf("kg_bgp_values")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("kg_asof_snapshot: ONE aggregation pass (partial+final), no window sort over the log") {
    val p = planOf("kg_asof_snapshot")
    assert(!p.contains("Window"), s"changelog winner must be an aggregate, not a per-key window sort:\n$p")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
  }

  test("kg_asof_delta: both cut winners come from the same single aggregation") {
    val p = planOf("kg_asof_delta")
    assert(!p.contains("Window"), p)
    // one partial+final aggregate pair over the union log — not one per cut
    assert("HashAggregate|SortAggregate".r.findAllIn(p).size <= 4, p)
  }

  test("kg_rdfs_types: the axiom lift is map-side — no join of any strategy") {
    val p = planOf("kg_rdfs_types")
    // the schema-sized domain/range maps and the subclass-closure lift are
    // driver-side literal maps evaluated per row (Rdfs.inferTypes) — the plan
    // must contain NO join node at all, only scans, generates and the dedup
    // aggregations
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Generate explode"), p)
  }

  test("kg_quads_graph / kg_bgp_negated: filtered-scan joins, no cartesian") {
    assert(!planOf("kg_quads_graph").contains("CartesianProduct"))
    assert(!planOf("kg_bgp_negated").contains("CartesianProduct"))
  }

  test("entry: flagship pipeline has no shuffle before the final aggregation") {
    val df = SparkEntry.entry(spark)
    val p = df.queryExecution.executedPlan.toString
    // triples lineage: generator -> flatMap chain; only count-side exchange allowed
    assert(!p.contains("Exchange"), s"pages->triples must be shuffle-free:\n$p")
    // the typed stages (parse -> sample -> score) must chain as ONE object
    // pipeline: EliminateSerialization leaves exactly one serialize boundary
    // (objects are never round-tripped through InternalRow between stages)
    assert("SerializeFromObject".r.findAllIn(p).size == 1,
      s"typed stages must not re-serialize between maps:\n$p")
  }
}
