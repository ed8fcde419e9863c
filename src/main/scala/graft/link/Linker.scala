package graft.link

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.{Mention, ParsedDoc}
import graft.text.TextOps

/** Entity canonicalization (reference P9: synonym grouping,
  * arelight/run/infer.py:293-298 + arelight/synonyms.py:4-14).
  *
  * The reference keeps a mutable driver-side dictionary and registers unseen
  * values as new groups in encounter order — inherently sequential. The engine
  * provides three strategies, all deterministic and shuffle-free on the hot path:
  *
  *  1. [[hashGroupId]] (default at 10^12 scale): groupId = xxhash64(canonicalKey(value)).
  *     No dictionary at all, no shuffle, resume-stable. Group MEMBERSHIP matches the
  *     reference for exact-duplicate surface forms; group IDS differ (documented
  *     deviation, SURVEY.md §7.4).
  *  2. [[withDictionary]]: a synonyms file (one comma-separated group per line,
  *     arelight/synonyms.py:4-14) broadcast as Map[canonicalKey -> groupId];
  *     unseen values fall back to strategy 1 offset into a disjoint id space.
  *  3. [[registerMissing]]: the reference's register-unseen behavior as a two-pass
  *     batch job — distinct unseen values get dense ids (ordered by value — the
  *     engine fixes a deterministic order where the reference used encounter order).
  */
object Linker {

  /** 64-bit avalanche hash (xxhash64-style finalizer over UTF-8 bytes).
    * Pure JVM, stable across executors/versions — the scale-path group id. */
  def hashGroupId(value: String): Long = {
    val bytes = TextOps.canonicalKey(value).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L // FNV offset basis
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    // xxhash-style avalanche
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h & Long.MaxValue // keep non-negative; reserved dictionary range is below 1<<32
  }

  /** Parse a synonyms file's lines into canonicalKey -> groupId (group per line,
    * comma-separated; group id = line index, matching reference insertion order). */
  def parseSynonyms(lines: Iterator[String]): Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    var gid = 0L
    lines.foreach { line =>
      val vals = line.split(",").map(TextOps.canonicalKey).filter(_.nonEmpty)
      if (vals.nonEmpty) { vals.foreach(v => b += (v -> gid)); gid += 1 }
    }
    b.result()
  }

  /** Assign group ids to every mention of every parsed doc. Map-side only
    * (the dictionary is a broadcast-sized Map; hash fallback for misses). */
  def withDictionary(docs: Dataset[ParsedDoc], dict: Map[String, Long])(
      implicit spark: SparkSession): Dataset[ParsedDoc] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(dict)
    docs.map { d =>
      d.copy(sentences = d.sentences.map { s =>
        s.copy(mentions = s.mentions.map { m =>
          m.copy(groupId = bc.value.getOrElse(TextOps.canonicalKey(m.value), hashGroupId(m.value)))
        })
      })
    }
  }

  /** Pure hash grouping — the default. */
  def withHashGroups(docs: Dataset[ParsedDoc])(implicit spark: SparkSession): Dataset[ParsedDoc] = {
    import spark.implicits._
    docs.map { d =>
      d.copy(sentences = d.sentences.map { s =>
        s.copy(mentions = s.mentions.map(m => m.copy(groupId = hashGroupId(m.value))))
      })
    }
  }

  // ------------------------------------------------------------ LSH linking

  /** Character w-gram shingles of a canonical value ("$" padded, inner
    * whitespace runs collapsed — linking should not distinguish spacing). */
  private[graft] def charShingles(value: String, w: Int = 3): Seq[String] = {
    val s = "$" + graft.text.TextOps.canonicalKey(value).replaceAll(raw"\s+", " ") + "$"
    if (s.length < w) Seq(s) else (0 to s.length - w).map(i => s.substring(i, i + w))
  }

  private val P = 2147483647L
  private def baseHash(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .foreach(b => h = (h ^ (b & 0xffL)) * 0x100000001b3L)
    java.lang.Long.remainderUnsigned(h, P)
  }
  private def minhash(shingles: Seq[Long], k: Int): Long =
    shingles.map(h => ((1103515245L + 12345L * k) * h + 104729L + 7919L * k) % P).min

  /** Minhash-LSH blocking over distinct mention VALUES (north_star linking
    * path): near-duplicate surface forms ("barack obama" / "barak obama") land
    * in shared buckets; candidates above the Jaccard threshold are merged with
    * union-find into canonical groups. Runs on the distinct-value dictionary
    * (entity vocabulary ≈ millions at 10^12 docs — broadcastable), NOT per
    * mention: the per-mention path stays a map-side dictionary probe.
    *
    * Returns canonicalKey -> groupId (groupId = FIRST group member's hash id,
    * deterministic under the sorted processing order). */
  def lshGroups(values: Seq[String], bands: Int = 8, rowsPerBand: Int = 2,
      jaccardThreshold: Double = 0.7, shingleW: Int = 3): Map[String, Long] = {
    val canon = values.map(graft.text.TextOps.canonicalKey).distinct.sorted
    val shingleSets = canon.map(v => charShingles(v, shingleW).distinct.map(baseHash).toVector)
    // buckets per band
    val parent = Array.tabulate(canon.length)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }; r }
    def union(a: Int, b: Int): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb } // min-id wins
    }
    def jaccard(a: Vector[Long], b: Vector[Long]): Double = {
      val sa = a.toSet; val sb = b.toSet
      if (sa.isEmpty && sb.isEmpty) 1.0
      else sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
    }
    (0 until bands).foreach { b =>
      val buckets = scala.collection.mutable.Map.empty[Seq[Long], List[Int]]
      shingleSets.zipWithIndex.foreach { case (sh, i) =>
        val sig = (0 until rowsPerBand).map(r => minhash(sh, b * rowsPerBand + r))
        buckets.updateWith(sig)(l => Some(i :: l.getOrElse(Nil)))
      }
      buckets.values.foreach { members =>
        val sorted = members.sorted
        for (i <- sorted; j <- sorted if i < j)
          if (find(i) != find(j) && jaccard(shingleSets(i), shingleSets(j)) >= jaccardThreshold)
            union(i, j)
      }
    }
    canon.indices.map(i => canon(i) -> hashGroupId(canon(find(i)))).toMap
  }

  /** Driver-side front of [[lshGroups]]: collect the distinct mention
    * vocabulary (bounded), link it driver-side, return the broadcastable
    * canonical dictionary. Appropriate for vocabularies that comfortably fit
    * one machine (≲1M values); above that use [[lshDictionaryDf]] /
    * [[withLshGroups]], which run the SAME blocking+verify+components shape
    * as a distributed DataFrame job. */
  def lshDictionary(docs: Dataset[ParsedDoc], maxEntries: Int = 10_000_000,
      jaccardThreshold: Double = 0.7)(implicit spark: SparkSession): Map[String, Long] = {
    import spark.implicits._
    val vals = docs
      .flatMap(_.sentences.flatMap(_.mentions.map(m => TextOps.canonicalKey(m.value))))
      .distinct().orderBy("value").limit(maxEntries).as[String].collect()
    lshGroups(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals),
      jaccardThreshold = jaccardThreshold)
  }

  // ------------------------------------- distributed LSH linking (DataFrame)

  /** Distributed entity linking over a distinct-value relation — the web-scale
    * path (vocabulary of 10^8-10^9 surface forms does not fit a driver, and
    * driver union-find with per-bucket O(members²) does not survive hot
    * buckets). Same algorithmic shape as [[lshGroups]], expressed as
    * declarative DataFrame stages reusing the dedup machinery:
    *
    *   canonicalize -> char-shingle -> md5 base hash -> band signatures
    *   (graft.ops.Dedup.bandSignatures) -> bucket self-join candidates
    *   (Dedup.minhashCandidates) -> exact-Jaccard verify -> distributed
    *   connected components (Dedup.clusters, min-label + pointer halving).
    *
    * Output: (value, group_value) where group_value is the lexicographically
    * smallest member of the value's group — same canonical-representative rule
    * as [[lshGroups]] (which returns hashGroupId of that representative).
    *
    * Hash-family note: the shingle hash here is md5-derived (DuckDB-oracle
    * parity, like Dedup), while [[lshGroups]] uses an FNV base hash — candidate
    * RECALL on marginal pairs may differ between the two paths; the verify
    * stage (exact Jaccard ≥ threshold) is identical.
    */
  def linkGroupsDf(values: org.apache.spark.sql.DataFrame,
      valueCol: org.apache.spark.sql.Column,
      bands: Int = 8, rowsPerBand: Int = 2,
      jaccardThreshold: Double = 0.5, shingleW: Int = 3,
      maxBucketSize: Int = Int.MaxValue): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.ops.Dedup
    // the canonical vocabulary is consumed by THREE downstream lineages (band
    // signatures, shingle sets for verify, the final group join) — checkpoint
    // it once so the upstream scan/distinct doesn't re-run per consumer
    val canon = values.select(lower(trim(valueCol)).as("value")).distinct().localCheckpoint()
    // padded form materialized in its own projection: the shingle lambda below
    // captures it, and a captured subtree is re-evaluated per element — keep it
    // an attribute reference, not an expression tree
    val padded = canon.select(col("value"),
      concat(lit("$"), regexp_replace(col("value"), raw"\s+", " "), lit("$")).as("p"))
    val sh = padded.select(col("value"),
      when(length(col("p")) < shingleW, array(col("p")))
        .otherwise(transform(sequence(lit(0), length(col("p")) - shingleW),
          i => col("p").substr(i + lit(1), lit(shingleW)))).as("sh"))
    val based = sh.select(col("value").as("id"),
      array_distinct(col("sh")).as("shd"),
      transform(col("sh"), s => Dedup.baseHash(s)).as("base"))
    val sets = based.select(col("id").as("value"), col("shd"))
    val sigs = Dedup.bandSignatures(based.select(col("id"), col("base")), bands, rowsPerBand)
    // maxBucketSize: at web scale a degenerate signature bucket (boilerplate
    // or empty-ish surface forms) would generate |bucket|^2 candidates —
    // cap it like document dedup does (Dedup.minhashCandidates)
    val cand = Dedup.minhashCandidates(sigs, maxBucketSize)
    val verified = cand
      .join(sets.withColumnRenamed("value", "a_id").withColumnRenamed("shd", "a_sh"), "a_id")
      .join(sets.withColumnRenamed("value", "b_id").withColumnRenamed("shd", "b_sh"), "b_id")
      .filter(size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
        size(array_union(col("a_sh"), col("b_sh"))).cast("double") >= jaccardThreshold)
      .select("a_id", "b_id")
    val labels = Dedup.clusters(verified) // (id, cluster) — min-value canonical
    canon
      .join(labels.withColumnRenamed("id", "value").withColumnRenamed("cluster", "grp"),
        Seq("value"), "left")
      .select(col("value"), coalesce(col("grp"), col("value")).as("group_value"))
  }

  /** Distributed dictionary relation over the mention vocabulary:
    * (value, group_id) with group_id = hashGroupId(canonical representative) —
    * the same id rule as [[lshGroups]]. */
  def lshDictionaryDf(docs: Dataset[ParsedDoc], bands: Int = 8, rowsPerBand: Int = 2,
      jaccardThreshold: Double = 0.5, shingleW: Int = 3)(
      implicit spark: SparkSession): Dataset[(String, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val vals = docs
      .flatMap(_.sentences.flatMap(_.mentions.map(m => TextOps.canonicalKey(m.value))))
      .toDF("value")
    linkGroupsDf(vals, col("value"), bands, rowsPerBand, jaccardThreshold, shingleW)
      .as[(String, String)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.STRING))
      .map { case (v, g) => (v, hashGroupId(g)) }
  }

  /** Assign LSH-linked group ids to every mention. The LINKING always runs
    * distributed ([[lshDictionaryDf]]); the assignment strategy switches on
    * vocabulary size: ≤ maxBroadcastEntries collects the dictionary and probes
    * it map-side (one pass over docs), larger vocabularies use a mention-level
    * join + per-doc regroup (two extra shuffles of mention rows — the price of
    * a vocabulary that fits no single machine). */
  def withLshGroups(docs: Dataset[ParsedDoc], maxBroadcastEntries: Long = 1_000_000L,
      bands: Int = 8, rowsPerBand: Int = 2, jaccardThreshold: Double = 0.5, shingleW: Int = 3)(
      implicit spark: SparkSession): Dataset[ParsedDoc] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dict = lshDictionaryDf(docs, bands, rowsPerBand, jaccardThreshold, shingleW)
      .toDF("value", "group_id")
    val n = dict.count()
    if (n <= maxBroadcastEntries) {
      val m = dict.as[(String, Long)].collect().toMap
      withDictionary(docs, m)
    } else {
      // mention-level join path: explode each doc's DISTINCT canonical mention
      // values, join on the dictionary, regroup per doc, assign row-locally.
      // Keyed by VALUE (group ids are value-determined), so two distinct docs
      // sharing a url can never cross-assign — (sentInd, mentionId) ordinals
      // would collide across same-url docs.
      val valueRows = docs.flatMap(d =>
        d.sentences.flatMap(_.mentions.map(m => (d.url, TextOps.canonicalKey(m.value)))).distinct)
        .toDF("url", "value")
      val joined = valueRows.join(dict, Seq("value"))
        .select(col("url").as("_1"), col("value").as("_2"), col("group_id").as("_3"))
        .as[(String, String, Long)]
      docs.groupByKey(_.url).cogroup(joined.groupByKey(_._1)) { (_, ds, gs) =>
        val byValue = gs.map(g => g._2 -> g._3).toMap
        ds.map { d =>
          d.copy(sentences = d.sentences.map { s =>
            s.copy(mentions = s.mentions.map(m =>
              m.copy(groupId = byValue.getOrElse(TextOps.canonicalKey(m.value), m.groupId))))
          })
        }
      }
    }
  }

  /** Reference register-unseen semantics as a batch two-pass: returns the base
    * dictionary extended with dense ids for every distinct unseen canonical value.
    * One distinct-shuffle over mention values; result must fit the driver
    * (guarded) — at web scale use withHashGroups instead. */
  def registerMissing(docs: Dataset[ParsedDoc], base: Map[String, Long], maxEntries: Int = 10_000_000)(
      implicit spark: SparkSession): Map[String, Long] = {
    import spark.implicits._
    val known = spark.sparkContext.broadcast(base)
    val unseen = docs
      .flatMap(_.sentences.flatMap(_.mentions.map(m => TextOps.canonicalKey(m.value))))
      .filter(v => !known.value.contains(v))
      .distinct()
      .orderBy("value")
      .limit(maxEntries)
      .as[String]
      .collect()
    val offset = if (base.isEmpty) 0L else base.values.max + 1L
    base ++ unseen.iterator.zipWithIndex.map { case (v, i) => v -> (offset + i) }
  }
}
