package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model scoring for corpus quality filtering —
  * the CCNet/Gopher "perplexity filter" shape (train a cheap LM on a trusted
  * slice, score every candidate document, drop the tail), re-expressed as two
  * relational passes. Engine extension: no reference counterpart in
  * /root/reference/arelight (the reference filters by NER structure only);
  * the op family follows the published CCNet pipeline design.
  *
  * Cross-engine exactness: real log-probs (ln/log2 of a ratio) are not
  * bit-reproducible across engines, so the scorer works in integer log2
  * space — `ilog2(x) = length(bin(x)) - 1 = floor(log2(x))` is exact in both
  * Spark and DuckDB, and the per-document surprisal
  * `sum(c_doc * (ilog2(N) - ilog2(c)))` stays a BIGINT (bounded by
  * 64 * tokens, far under 2^62). The mean is a double division of two
  * integers < 2^53 — also exact. Within-integer-log2 resolution this is the
  * standard corpus-frequency surprisal: rare-bigram-heavy (gibberish, boiler
  * tails) documents score high, fluent text scores low.
  *
  * Scale shape (100 TB): the trainer is a two-level aggregation with map-side
  * partial combines (per-doc counts, then global counts); the scorer is one
  * key-partitioned join on the bigram plus a final per-doc aggregation. The
  * shared (id, bigram, c_doc) relation feeds three consumers (scorer probe,
  * model build, total count) whose subtrees differ structurally (the join
  * inserts an isnotnull null-filter on its own branch only), so ReusedExchange
  * can NOT dedupe them — [[selfSurprisal]] therefore localCheckpoints the
  * relation once, the repo's standard multi-consumer pattern (see
  * link/Linker), and PlanSpec asserts the corpus is tokenized exactly once.
  * Nothing collects to the driver; the model relation is only as large as the
  * bigram vocabulary.
  */
object LangModel {

  /** floor(log2(x)) for a positive integral column, integer-exact in both
    * engines: the bit-length of x minus one. */
  def ilog2(c: Column): Column = (length(bin(c)) - 1).cast("long")

  /** Per-(id, bigram) occurrence counts — the shared relation the trainer and
    * the scorer both consume. Map-side explode, one shuffle on (id, bigram). */
  def docBigrams(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(id.as("id"),
        explode(Dedup.shingles(Dedup.tokens(text), 2)).as("bigram"))
      .groupBy(col("id"), col("bigram"))
      .agg(count(lit(1)).as("c_doc"))

  /** Bigram count model: (bigram, c). Derives from [[docBigrams]] so the
    * scorer's plan can reuse the exchange. */
  def train(docBg: DataFrame): DataFrame =
    docBg.groupBy(col("bigram")).agg(sum(col("c_doc")).as("c"))

  /** Score each document's bigrams under `model` counts: one row per doc with
    * (n_bigrams, surprisal, mean_surprisal). Bigrams absent from the model
    * contribute the maximal per-event surprisal ilog2(N) (add-one floor:
    * c -> 1, ilog2(1) = 0) — the held-out-scoring path. Documents with no
    * bigrams (< 2 tokens) emit no row, consistently in both engines. */
  def surprisal(docBg: DataFrame, model: DataFrame): DataFrame = {
    val tot = model.agg(sum(col("c")).cast("long").as("n"))
    docBg
      .join(model, Seq("bigram"), "left")
      .crossJoin(broadcast(tot))
      .select(col("id"), col("c_doc"),
        (col("c_doc") *
          (ilog2(col("n")) - ilog2(coalesce(col("c"), lit(1L))))).as("s"))
      .groupBy(col("id"))
      .agg(sum(col("c_doc")).cast("long").as("n_bigrams"),
        sum(col("s")).cast("long").as("surprisal"))
      .withColumn("mean_surprisal",
        col("surprisal").cast("double") / col("n_bigrams").cast("double"))
  }

  /** Self-scored corpus surprisal (train and score on the same documents) —
    * the registered-query composition; callers with a trusted training slice
    * pass distinct DataFrames through [[docBigrams]]/[[train]]/[[surprisal]].
    * The shared bigram-count relation is localCheckpointed so the corpus is
    * tokenized and shuffled once, not once per consumer. */
  def selfSurprisal(df: DataFrame, text: Column, id: Column): DataFrame = {
    val docBg = docBigrams(df, text, id).localCheckpoint()
    surprisal(docBg, train(docBg))
  }

  // ---------------------------------------------- phrase-vocabulary induction

  /** BPE/word2phrase-style vocabulary induction: k rounds of "count all
    * adjacent token pairs, merge the globally most frequent one" — the
    * tokenizer-training loop every LLM data pipeline runs, here at the word
    * level over the corpus. Each round's counting is fully distributed (one
    * flat-map + one groupBy with partial aggregation); only the SINGLE
    * winning pair crosses to the driver, and the merge itself is one
    * map-side literal `replace` — so the loop is k scans regardless of
    * corpus size, the classic tokenizer-training shape. Deterministic tie
    * rule: (count DESC, pair ASC bytewise).
    *
    * Corpus state rides as a '  '-joined token string (tokens cannot contain
    * whitespace), so one literal replace of ` l  r ` with ` l_r ` applies
    * the merge greedily left-to-right — exactly BPE's within-round
    * semantics, and exactly mirrorable in SQL. Lineage truncated per round.
    *
    * Returns the merge table (round, lhs, rhs, cnt) — the trained artifact;
    * [[phraseRewrite]] returns the corpus with all k merges applied. */
  def phraseMerges(df: DataFrame, text: Column, id: Column, k: Int): DataFrame =
    phraseLoop(df, text, id, k)._1

  /** The corpus after the k trained merges: (id, text) with merged tokens
    * joined by '_'. */
  def phraseRewrite(df: DataFrame, text: Column, id: Column, k: Int): DataFrame =
    phraseLoop(df, text, id, k)._2
      .select(col("id"),
        regexp_replace(trim(col("s")), "  ", " ").as("text"))

  private def phraseLoop(df: DataFrame, text: Column, id: Column,
      k: Int): (DataFrame, DataFrame) = {
    require(k >= 1 && k <= 64, s"merge rounds k must be in [1,64]: $k")
    val spark = df.sparkSession
    import spark.implicits._
    var cur = df.select(id.as("id"),
        concat(lit(" "), regexp_replace(trim(text), raw"\s+", "  "), lit(" ")).as("s"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      // terms is materialized in its OWN projection before the pair lambda:
      // a lambda capturing the raw split(...) subtree would re-evaluate the
      // split per element (the Catalyst HOF re-evaluation trap — O(tokens^2)
      // per document per round, measured 10.4s -> 1.9s for the k=5 query at
      // sf0.1). zip_with over two slices of the materialized column touches
      // only bound lambda variables, so each round is one linear scan.
      val top = cur.select(split(trim(col("s")), "  ").as("t"))
        .select(explode(when(size(col("t")) >= 2,
          zip_with(
            slice(col("t"), lit(1), size(col("t")) - 1),
            slice(col("t"), lit(2), size(col("t")) - 1),
            (a, b) => concat(a, lit("  "), b)))
          .otherwise(array().cast("array<string>"))).as("col"))
        .groupBy(col("col")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("col")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val key = top(0).getString(0)
        val Array(l, rr) = key.split("  ", 2)
        merges += ((r.toLong, l, rr, top(0).getLong(1)))
        cur = cur.select(col("id"),
            replace(col("s"), lit(s" $key "),
              lit(s" ${key.replace("  ", "_")} ")).as("s"))
          .localCheckpoint(true)
        r += 1
      }
    }
    (merges.toSeq.toDF("merge_round", "lhs", "rhs", "cnt"), cur)
  }
}
