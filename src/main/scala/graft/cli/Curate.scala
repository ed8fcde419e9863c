package graft.cli

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextStats}

/** Training-data curation CLI — the composed filter chain a web-scale corpus
  * runs before training (quality -> language -> exact dedup -> near-dup dedup
  * -> eval-set decontamination), each stage an engine operator from
  * graft.ops. Prints ONE JSON line with per-stage survivor counts.
  *
  * Usage:
  *   runMain graft.cli.Curate --docs docs.parquet --out /tmp/kept
  *     [--id-col doc_id --text-col text]
  *     [--min-tokens 40] [--min-ttr 0.0] [--lang en] [--c4 y] [--gopher y]
  *     [--near-dup y] [--bands 4] [--rows-per-band 2] [--shingle-w 2] [--jaccard 0.7]
  *     [--max-bucket 10000]
  *     [--probes eval.parquet --ngram 5 --min-shared 3]
  *     [--source-cap N [--cap-col source]]  (domain balancing: at most N
  *       docs per source by deterministic md5 rank)
  *     [--store /path/to/sigstore [--store-min-bands 1] [--compact-store y]]
  *     [--hll-store /path/to/hllstore [--hll-p 8]]  (lifetime distinct gauge;
  *       p is pinned in the store on first use, later runs adopt it)
  *
  * `--store` turns a one-shot curation run into CONTINUOUS ingest: the batch
  * is additionally deduplicated against the persistent signature store
  * (graft.ops.SigStore — exact md5 anti-join, then shared-band near-dup
  * probe) BEFORE batch-internal dedup, and the kept survivors' signatures
  * are appended afterwards, so the next batch dedups against all history
  * without re-reading it. The store pins its LSH parameters; a run with
  * different --bands/--shingle-w/--rows-per-band fails fast.
  *
  * Every stage is a declarative DataFrame transform (one shuffle per dedup
  * stage, on the hash/bucket key); nothing is collected to the driver except
  * the stage counts.
  */
object Curate {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val docsPath = opts.getOrElse("--docs", sys.error("--docs required"))
    val out = opts.getOrElse("--out", sys.error("--out required"))
    val idCol = opts.getOrElse("--id-col", "doc_id")
    val textCol = opts.getOrElse("--text-col", "text")

    implicit val spark: SparkSession = SparkSession.builder()
      .master(opts.getOrElse("--master", s"local[${Runtime.getRuntime.availableProcessors}]"))
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(docsPath)
    val nInput = docs.count()

    // 1. quality thresholds — same n_tokens/TTR formulas as TextStats.quality,
    // built inline on just the two needed columns (quality() computes the full
    // metric set; keep the formulas in sync if tokenization semantics change)
    val minTokens = opts.getOrElse("--min-tokens", "0").toInt
    val minTtr = opts.getOrElse("--min-ttr", "0.0").toDouble
    val toks = split(trim(col(textCol)), raw"\s+")
    val q0 = docs
      .withColumn("__n_tokens", size(toks))
      .withColumn("__ttr", size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
      .filter(col("__n_tokens") >= minTokens && col("__ttr") >= minTtr)
    // 2. language filter (stopword-vote langid)
    val q = opts.get("--lang") match {
      case Some(l) => q0.filter(TextStats.langId(col(textCol)) === l)
      case None    => q0
    }
    val quality0 = q.drop("__n_tokens", "__ttr").persist()
    val nQuality = quality0.count()

    // 1b. --c4 y: C4 cleaning rules (line-level terminal-punct/min-words/
    // javascript filter + lorem-ipsum/brace doc drop); kept docs carry the
    // LINE-FILTERED text downstream, as in the original pipeline
    val c4 = opts.get("--c4").exists(_ == "y")
    val afterC4 = if (!c4) quality0 else {
      val r = TextStats.c4Rules(quality0, col(textCol), col(idCol))
        .filter(col("keep")).select(col("id").as(idCol), col("clean_text"))
      quality0.drop(textCol).join(r, Seq(idCol))
        .withColumnRenamed("clean_text", textCol).persist()
    }
    val c4Field = if (c4) s""""after_c4":${afterC4.count()},""" else ""

    // 1c. --gopher y: Gopher quality rules (integer-exact ratio thresholds)
    val gopher = opts.get("--gopher").exists(_ == "y")
    val quality = if (!gopher) afterC4 else {
      val keepIds = TextStats.gopherRules(afterC4, col(textCol), col(idCol))
        .filter(col("keep")).select(col("id").as(idCol))
      afterC4.join(keepIds, Seq(idCol)).persist()
    }
    val gopherField = if (gopher) s""""after_gopher":${quality.count()},""" else ""

    val bands = opts.getOrElse("--bands", "4").toInt
    val shingleW = opts.getOrElse("--shingle-w", "2").toInt
    val rowsPerBand = opts.getOrElse("--rows-per-band", "2").toInt
    val maxBucket = opts.getOrElse("--max-bucket", "10000").toInt

    // 2b. incremental ingest: drop docs already represented in the persistent
    // signature store (exact hash, then shared-band near-dup probe) — history
    // is joined through its constant-size signatures, never re-read
    val store = opts.get("--store")
    val storeParams = graft.ops.SigStore.Params(bands, shingleW, rowsPerBand)
    val afterStore = store match {
      case Some(sp) if graft.ops.SigStore.exists(spark, sp) =>
        graft.ops.SigStore.filterNew(quality, col(textCol), col(idCol), sp, storeParams,
          minBands = opts.getOrElse("--store-min-bands", "1").toInt,
          maxBucketSize = maxBucket).persist()
      case _ => quality
    }
    val nStore = afterStore.count()

    // 3. exact dedup keep-one (min id per content hash)
    val keepExact = afterStore
      .withColumn("__h", md5(col(textCol).cast("binary")))
      .withColumn("__keep", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__h")).orderBy(col(idCol))))
      .filter(col("__keep") === 1).drop("__h", "__keep")
      .persist()
    val nExact = keepExact.count()

    // 4. near-dup minhash-LSH keep-representative
    val nearDup = opts.getOrElse("--near-dup", "y") == "y"
    val afterNear =
      if (!nearDup) keepExact
      else {
        val sigs = Dedup.minhashSignatures(keepExact, col(textCol), col(idCol),
          bands = bands, shingleW = shingleW, rowsPerBand = rowsPerBand)
        val cand = Dedup.minhashCandidates(sigs, maxBucket)
        val verified = Dedup.jaccardVerify(keepExact, col(textCol), col(idCol), cand,
            shingleW = shingleW)
          .filter(col("jaccard") >= opts.getOrElse("--jaccard", "0.7").toDouble)
          .select("a_id", "b_id")
        val labels = Dedup.clusters(verified)
        keepExact.join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left")
          .filter(col("cluster").isNull || col("cluster") === col(idCol))
          .drop("cluster")
      }
    val afterNearP = afterNear.persist()
    val nNear = afterNearP.count()

    // 4b. domain balancing (--source-cap N): at most N docs per source by
    // deterministic md5 rank — an unbiased per-domain hash-sample, so one
    // boilerplate-heavy domain cannot dominate the kept corpus
    val capCol = opts.getOrElse("--cap-col", "source")
    val afterCap = opts.get("--source-cap") match {
      case Some(n) =>
        graft.ops.Sampling.groupCap(afterNearP, col(capCol), col(idCol), n.toInt).persist()
      case None => afterNearP
    }
    val capField = opts.get("--source-cap")
      .map(_ => s""""after_source_cap":${afterCap.count()},""").getOrElse("")

    // 5. decontamination against a probe/eval set (exact n-gram overlap)
    val kept = opts.get("--probes") match {
      case Some(pp) =>
        val probes = spark.read.parquet(pp)
        val contaminated = Dedup.ngramOverlap(afterCap, probes, col(textCol), col(idCol),
            n = opts.getOrElse("--ngram", "5").toInt,
            minShared = opts.getOrElse("--min-shared", "3").toInt)
          .select(col("doc_id").as(idCol)).distinct()
        afterCap.join(contaminated, Seq(idCol), "left_anti")
      case None => afterCap
    }
    val keptP = kept.persist()
    val nKept = keptP.count()
    keptP.write.mode(SaveMode.Overwrite).parquet(out)

    // append the survivors' signatures: the next batch dedups against them
    store.foreach(sp =>
      graft.ops.SigStore.append(keptP, col(textCol), col(idCol), sp, storeParams))
    // --compact-store y: fold the store's accumulated per-batch file-sets
    // into one bucketed layout (run at maintenance cadence, ~every 100
    // batches — see SigStore.compact scaladoc; probe results are unchanged)
    if (opts.get("--compact-store").exists(_ == "y"))
      store.foreach(sp => graft.ops.SigStore.compact(spark, sp))

    // --hll-store: fold this batch's HLL registers into the persistent
    // register store and report the lifetime distinct-content estimate —
    // the "how many unique pages has this pipeline ever seen" gauge, in
    // <=256 rows of state. Max-merge is idempotent: re-running a batch
    // cannot inflate the estimate.
    val hllField = opts.get("--hll-store").map { hs =>
      // p comes from the store when it exists (p is pinned there; a
      // mismatched merge fails fast), from --hll-p on first creation
      val p = graft.ops.Sketches.storeP(spark, hs)
        .getOrElse(opts.getOrElse("--hll-p", "8").toInt)
      graft.ops.Sketches.mergeRegistersIntoStore(
        graft.ops.Sketches.hllRegisters(docs, col(textCol), p), hs, p)
      val est = graft.ops.Sketches.hllEstimate(
        graft.ops.Sketches.readRegisterStore(spark, hs), p)
      s""""distinct_seen_est":${math.round(est)},"""
    }.getOrElse("")

    val storeField = store.map(_ => s""""after_store":$nStore,""").getOrElse("")
    println(s"""{"input":$nInput,"after_quality":$nQuality,$c4Field$gopherField$storeField$hllField""" +
      s""""after_exact_dedup":$nExact,"after_near_dedup":$nNear,$capField"kept":$nKept,"out":"$out"}""")
    spark.stop()
  }
}
