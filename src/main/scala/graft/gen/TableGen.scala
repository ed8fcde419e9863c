package graft.gen

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}

/** NATIVE synthetic generator for the full driver-testdata star schema —
  * the scale path that [[graft.tools.ScaleUp]] (deterministic replication)
  * is not: replication preserves value DISTRIBUTIONS but repeats shards, so
  * candidate-generating operators (minhash bands, ANN cells, link groups)
  * see unnaturally dense duplicate cliques at 10x (dedup_minhash_pairs
  * rows_ratio ~102x in the round-3 scale step). This generator produces
  * DISTINCT values at any scale factor with the same shapes as
  * `/root/testdata/sf*` (TESTDATA.md): same schemas, same value ranges,
  * same categorical vocabularies, same skew structure (Zipf-free uniform
  * word salad + rare `dup` token + exact-/near-duplicate docs + clustered
  * embeddings + per-user event streams + FK-consistent TPC-H-ish facts).
  *
  * Fully distributed and seed-stable like [[PageGen]]: every row is a pure
  * function of (seed, table, i) via splitmix64 — no driver-side data, no
  * shuffle, any scale. sf = 1.0 means ~6M lineitem / 50k documents (10x the
  * driver's sf0.1).
  */
object TableGen {

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private final class Rng(seed: Long) {
    private var s = seed
    def nextLong(): Long = { s = mix(s); s }
    def nextInt(n: Int): Int = ((nextLong() >>> 1) % n).toInt
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  /** The documents word-salad vocabulary (the driver tables' 30 words; the
    * DocKg entity lexicon words and sentiment cues are all present). */
  val vocab: IndexedSeq[String] = IndexedSeq(
    "spark", "window", "merge", "table", "column", "vector", "stream", "value",
    "data", "small", "join", "filter", "big", "group", "hash", "customer",
    "sort", "order", "slow", "line", "part", "fast", "the", "row", "agg",
    "key", "query", "a", "scan", "batch")

  private val mktSegments = Vector("MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE")
  private val orderStatus = Vector("O", "F", "P")
  private val orderPrio = Vector("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val partAdj = Vector("large", "hot", "blue", "small", "dim", "cold", "red", "pale")
  private val partNoun = Vector("ring", "bolt", "drum", "cap", "plate", "cog", "rail", "pin")
  private val partTypes = Vector("ECONOMY", "SMALL", "MEDIUM", "LARGE", "STANDARD", "PROMO")
  private val returnFlags = Vector("A", "N", "R")
  private val lineStatus = Vector("O", "F")
  private val eventTypes = Vector("signup", "click", "error", "view", "purchase")
  private val langs = Vector("en", "zh", "es", "fr", "de")

  private val DayMs = 86400000L
  private def epochDay(y: Int, m: Int, d: Int): Long =
    java.time.LocalDate.of(y, m, d).toEpochDay * DayMs

  /** Deterministic doc text for doc i — pure (seed, i) function so exact-
    * and near-duplicate docs can reference an EARLIER doc's text without any
    * shuffle. ~2.5% of docs are near-dups of their predecessor (text + the
    * rare `dup` token); ~0.16% are byte-exact copies of an earlier doc. */
  def docText(seed: Long, i: Long): String = {
    if (i % 625 == 624 && i >= 313) docText(seed, i - 313) // exact duplicate
    else if (i % 40 == 39 && i > 0) docText(seed, i - 1) + " dup" // near-dup
    else {
      val rng = new Rng(mix(seed ^ 0xd0c5L) + i)
      val n = 8 + rng.nextInt(92)
      val b = new StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) b += ' '
        b ++= vocab(rng.nextInt(vocab.length))
        k += 1
      }
      b.toString
    }
  }

  /** 10 deterministic cluster centroids in 64-dim [-1,1]^64. */
  private def centroid(seed: Long, label: Int): Array[Float] =
    Array.tabulate(64)(d => ((mix(seed ^ 0xe3bL ^ (label * 64L + d)) >>> 11) *
      1.1102230246251565e-16 * 2.0 - 1.0).toFloat)

  def writeAll(spark: SparkSession, outDir: String, sf: Double = 1.0,
      seed: Long = 42L): Unit = {
    import spark.implicits._
    def cnt(base1: Long): Long = math.max(1L, (base1 * sf).toLong)
    val nCust = cnt(150000); val nSupp = cnt(10000); val nPart = cnt(200000)
    val nOrders = cnt(1500000); val nEvents = cnt(1000000)
    val nDocs = cnt(50000); val nEmb = cnt(20000); val nUsers = cnt(15000)
    val parts = math.min(32, spark.sparkContext.defaultParallelism)
    def rangeOf(n: Long) = spark.range(0, n, 1, parts)
    def out(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    out((0 until 5).map(i => (i, Vector("AFRICA", "AMERICA", "ASIA", "EUROPE",
      "MIDDLE EAST")(i))).toDF("r_regionkey", "r_name"), "region")
    out((0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey"), "nation")

    out(rangeOf(nCust).map { i =>
      val r = new Rng(mix(seed ^ 0xc1L) + i)
      (i, f"Customer#$i%09d", r.nextInt(25),
        math.rint(r.nextDouble() * 999999) / 100.0, mktSegments(r.nextInt(5)))
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "customer")

    out(rangeOf(nSupp).map { i =>
      val r = new Rng(mix(seed ^ 0x52L) + i)
      (i, f"Supplier#$i%09d", r.nextInt(25), math.rint(r.nextDouble() * 999999) / 100.0)
    }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"), "supplier")

    out(rangeOf(nPart).map { i =>
      val r = new Rng(mix(seed ^ 0x9aL) + i)
      (i, s"${partAdj(r.nextInt(partAdj.length))} ${partNoun(r.nextInt(partNoun.length))}",
        s"Brand#${r.nextInt(25) + 1}", partTypes(r.nextInt(partTypes.length)),
        r.nextInt(50) + 1, math.rint(90000.0 + i % 200000) / 100.0)
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "part")

    // order/ship dates are DAY-aligned like the driver tables: sub-second
    // components would make epoch-second casts diverge cross-engine (Spark
    // truncates, DuckDB rounds) — caught by the native sf0.1 gate
    val (dateLo, dateHi) = (epochDay(1995, 1, 1), epochDay(2001, 8, 1))
    val orderDays = (dateHi - dateLo) / DayMs
    out(rangeOf(nOrders).map { i =>
      val r = new Rng(mix(seed ^ 0x07dL) + i)
      (i, r.nextLong().abs % nCust, orderStatus(r.nextInt(3)),
        math.rint(100191.0 + r.nextDouble() * 49899127) / 100.0,
        new Timestamp(dateLo + (r.nextLong().abs % orderDays) * DayMs),
        orderPrio(r.nextInt(5)))
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"), "orders")

    val shipHi = epochDay(2001, 11, 4)
    val shipDays = (shipHi - dateLo) / DayMs
    out(rangeOf(nOrders).flatMap { o =>
      val r = new Rng(mix(seed ^ 0x11eL) + o)
      val lines = 1 + r.nextInt(7)
      (1 to lines).map { ln =>
        (o, r.nextLong().abs % nPart, r.nextLong().abs % nSupp, ln,
          (r.nextInt(50) + 1).toDouble,
          math.rint(90068.0 + r.nextDouble() * 10409923) / 100.0,
          r.nextInt(11) / 100.0, r.nextInt(9) / 100.0,
          returnFlags(r.nextInt(3)), lineStatus(r.nextInt(2)),
          new Timestamp(dateLo + (r.nextLong().abs % shipDays) * DayMs))
      }
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate"), "lineitem")

    // events: ts monotone-ish in event_id (the driver's layout) over a
    // 30-day window, per-user streams dense enough for funnel/session reads
    val evStart = epochDay(2024, 1, 1)
    val evSpan = 30L * DayMs
    out(rangeOf(nEvents).map { i =>
      val r = new Rng(mix(seed ^ 0xe7L) + i)
      val ts = evStart + (evSpan * i) / nEvents + r.nextInt(1000)
      (i, new Timestamp(ts), r.nextLong().abs % nUsers,
        eventTypes(r.nextInt(5)), math.rint(r.nextDouble() * 56021) / 100.0,
        s"""{"k": ${r.nextInt(100)}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"), "events")

    out(rangeOf(nDocs).map { i =>
      val r = new Rng(mix(seed ^ 0x10c5L) + i)
      val text = docText(seed, i)
      val lang = { val d = r.nextDouble(); if (d < 0.41) "en" else langs(1 + r.nextInt(4)) }
      (i, text, lang, s"src${r.nextInt(20)}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars"), "documents")

    out(rangeOf(nEmb).map { i =>
      val r = new Rng(mix(seed ^ 0xe2bL) + i)
      val label = r.nextInt(10)
      val c = centroid(seed, label)
      val v = Array.tabulate(64)(d => (c(d) + (r.nextDouble() - 0.5) * 0.3).toFloat)
      (i, v, label)
    }.toDF("vec_id", "embedding", "label"), "embeddings")
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.lift(0).getOrElse("/tmp/graft-native-sf1")
    val sf = args.lift(1).map(_.toDouble).getOrElse(1.0)
    val seed = args.lift(2).map(_.toLong).getOrElse(42L)
    val spark = SparkSession.builder()
      .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors)}]")
      .appName("graft-tablegen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeAll(spark, outDir, sf, seed)
    println(s"""{"generated":"$outDir","sf":$sf,"seed":$seed}""")
    spark.stop()
  }
}
