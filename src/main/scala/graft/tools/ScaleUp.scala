package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-step data generator: writes a `factor`× copy of the
  * driver testdata tables with remapped keys, so the 42-query oracle gate and
  * the benchmark can run at the NEXT 10× scale before a real cluster would
  * (round-2 verdict item 5 — surfacing cardinality-sensitive behavior:
  * clustering iteration counts, vocabulary growth, AQE plan flips).
  *
  * Per replica r (r = 0 is the identity, so the base data set is a subset):
  *  - fact keys shift by `max(key)+1` per table (replicas are key-disjoint,
  *    foreign keys stay consistent WITHIN a replica);
  *  - `documents.text` gets a per-replica suffix token — replicas of one doc
  *    are exact-dup-distinct but remain NEAR-duplicates, so the dedup family
  *    is stressed with realistic cross-replica near-dup cliques of size
  *    `factor`;
  *  - `embeddings.embedding` gets a tiny deterministic first-component
  *    perturbation (r * 1e-3) — no exact-tie ambiguity in top-k;
  *  - dimension tables (nation, region) are shared, NOT replicated — their
  *    keys are referenced by every replica.
  *
  * Everything is a pure column transform of the input parquet: no randomness,
  * no timestamps — byte-deterministic given (input, factor).
  */
object ScaleUp {

  private def offsetOf(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).first().getLong(0) + 1L

  /** Union of `factor` replicas of `df`, applying `f(df, r, offset)`. */
  private def replicate(df: DataFrame, factor: Int)(f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(r => f(df, r)).reduce(_.unionAll(_))

  def scale(spark: SparkSession, inDir: String, outDir: String, factor: Int): Unit = {
    def in(t: String) = spark.read.parquet(s"$inDir/$t.parquet")
    def out(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    // shared dimensions: copied once
    out(in("region"), "region")
    out(in("nation"), "nation")

    val docs = in("documents")
    val dOff = offsetOf(docs, "doc_id")
    out(replicate(docs, factor) { (d, r) =>
      d.select(
        (col("doc_id") + lit(dOff * r)).as("doc_id"),
        (if (r == 0) col("text") else concat(col("text"), lit(s" shard$r"))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }, "documents")

    val emb = in("embeddings")
    val eOff = offsetOf(emb, "vec_id")
    out(replicate(emb, factor) { (d, r) =>
      val vec =
        if (r == 0) col("embedding")
        else concat(
          array((element_at(col("embedding"), 1) + lit(r * 1e-3)).cast("float")),
          slice(col("embedding"), lit(2), size(col("embedding")) - 1))
      d.select((col("vec_id") + lit(eOff * r)).as("vec_id"),
        vec.as("embedding"), col("label"))
    }, "embeddings")

    val ev = in("events")
    val evOff = offsetOf(ev, "event_id")
    val uOff = offsetOf(ev, "user_id")
    out(replicate(ev, factor) { (d, r) =>
      d.select((col("event_id") + lit(evOff * r)).as("event_id"), col("ts"),
        (col("user_id") + lit(uOff * r)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }, "events")

    val cust = in("customer"); val cOff = offsetOf(cust, "c_custkey")
    out(replicate(cust, factor) { (d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(cOff * r))
    }, "customer")

    val supp = in("supplier"); val sOff = offsetOf(supp, "s_suppkey")
    out(replicate(supp, factor) { (d, r) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(sOff * r))
    }, "supplier")

    val part = in("part"); val pOff = offsetOf(part, "p_partkey")
    out(replicate(part, factor) { (d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(pOff * r))
    }, "part")

    val ord = in("orders"); val oOff = offsetOf(ord, "o_orderkey")
    out(replicate(ord, factor) { (d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(oOff * r))
        .withColumn("o_custkey", col("o_custkey") + lit(cOff * r))
    }, "orders")

    val li = in("lineitem")
    out(replicate(li, factor) { (d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(oOff * r))
        .withColumn("l_partkey", col("l_partkey") + lit(pOff * r))
        .withColumn("l_suppkey", col("l_suppkey") + lit(sOff * r))
    }, "lineitem")
  }

  def main(args: Array[String]): Unit = {
    val inDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"), "graft-sfx10").toString)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors)}]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, inDir, outDir, factor)
    println(s"""{"scaled":"$outDir","factor":$factor,"from":"$inDir"}""")
    spark.stop()
  }
}
