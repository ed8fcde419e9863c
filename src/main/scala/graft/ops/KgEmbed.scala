package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KG-embedding training-data preparation: deterministic negative sampling
  * over the materialized triple/edge relation.
  *
  * TransE-family embedding training (Bordes et al. 2013) consumes, per true
  * triple (h, r, t), corrupted triples (h, r, t') with t' drawn from the
  * entity vocabulary; the standard "filtered" setting then removes any
  * corruption that happens to be a true triple elsewhere in the KG. The
  * engine extension here produces exactly that relation from the KG the
  * pipeline materializes (no reference counterpart — ARElight stops at the
  * d3 graph; this feeds the graph INTO representation learning, the natural
  * next consumer at corpus scale).
  *
  * Determinism contract (the same re-run / incremental / oracle story as
  * [[Sampling]]): the picked corruption is a pure function of the triple key
  * and `seed` — no rng state, partition-invariant, cross-engine replayable.
  *
  * Scale shape: a GLOBAL vocabulary rank would be a single-partition window.
  * Instead the vocabulary is bucketed by entity hash (`buckets` ways); ranks
  * are per-bucket windows (parallel), the per-bucket counts are a
  * `buckets`-row relation (broadcast), and the triple->replacement join is a
  * plain hash join on (bucket, rank) — every stage is shuffle-bounded by the
  * vocabulary size, never by |vocab| in one task. The corruption is drawn
  * uniformly within the triple's assigned hash bucket; with `buckets` ≪
  * |vocab| every bucket holds a near-uniform slice of the vocabulary, so the
  * per-bucket draw matches the uniform-corruption distribution in the limit
  * (documented deviation from literal global-uniform sampling: buying
  * partition-parallel determinism with a bucketed draw).
  */
object KgEmbed {

  /** Corrupted-tail negatives for each distinct (source, sent, target) edge:
    * one (source, sent, target_neg) per input edge, filtered setting (the
    * anti-join drops corruptions that are true edges under the same
    * (source, sent)). Rows whose draw lands on the true tail drop too (the
    * true edge IS in the filter set); with a vocabulary of thousands that is
    * ~1/|bucket| of rows, the standard acceptance-rate cost of filtered
    * sampling. */
  def negativeTails(edges: DataFrame, seed: Long = 7L, buckets: Int = 8): DataFrame = {
    // three downstream consumers (corruption base, vocabulary, filtered-
    // setting anti join) — truncate the edge-sized dedup once so a DERIVED
    // edge relation (e.g. a host graph extracted from markup) is evaluated
    // once, not per reference (the repo-wide multi-consumer discipline)
    val distinctEdges = edges.select(col("source"), col("sent"), col("target"))
      .distinct().localCheckpoint(true)
    // entity vocabulary: every node that appears anywhere, bucket-ranked;
    // node-sized with two consumers — same truncation
    val vocab = distinctEdges.select(col("source").as("ent"))
      .union(distinctEdges.select(col("target").as("ent")))
      .distinct()
      .withColumn("bucket", Sampling.hashBucket(col("ent"), buckets))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("bucket")).orderBy(col("ent"))) - 1)
      .localCheckpoint(true)
    // occupied buckets only, rank-indexed: a draw can never land in an empty
    // bucket (with a small vocabulary hash buckets CAN be empty; an inner
    // join on the raw bucket id would silently drop those triples). The
    // counts relation is `buckets` rows — the windows over it are constant
    // cost at any data scale, and it broadcasts.
    val counts = vocab.groupBy(col("bucket")).agg(count(lit(1)).as("n_ents"))
      .withColumn("occ_rank", row_number().over(Window.orderBy(col("bucket"))) - 1)
      .withColumn("n_occ", count(lit(1)).over(Window.partitionBy()))
    val key = concat_ws("|", col("source"), col("sent"), col("target"), lit(seed.toString))
    val nOcc = broadcast(counts.select(col("n_occ")).distinct())
    val picked = distinctEdges
      .crossJoin(nOcc)
      .withColumn("occ_pick", Sampling.hashBucket(concat(key, lit("#b")), Long.MaxValue) % col("n_occ"))
      .join(broadcast(counts.select(col("occ_rank").as("occ_pick"),
        col("bucket").as("pick_bucket"), col("n_ents"))), Seq("occ_pick"))
      .withColumn("pick_rank", Sampling.hashBucket(concat(key, lit("#r")), Long.MaxValue) % col("n_ents"))
    val replaced = picked
      .join(vocab.select(col("bucket").as("pick_bucket"), col("rank").as("pick_rank"),
        col("ent").as("target_neg")), Seq("pick_bucket", "pick_rank"))
      .select(col("source"), col("sent"), col("target"), col("target_neg"))
    // filtered setting: a corruption that is itself a true (source,sent,·)
    // edge is not a negative example
    replaced.join(
        distinctEdges.select(col("source"), col("sent"), col("target").as("target_neg")),
        Seq("source", "sent", "target_neg"), "left_anti")
      .select(col("source"), col("sent"), col("target"), col("target_neg"))
  }
}
