package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 phase probe for kg_view_maintained: times the snapshot/diff
  * checkpoints, the T1 solution chain, the insert delta, the DRed retract
  * and the final anti join separately (best-of-k). */
object ViewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = if (args.length > 0) args(0).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-view-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{Bgp, Changelog, DocKg}
    def best(label: String)(work: => Any): Unit = {
      work
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }
      println(f"[view] $label best=${ts.min}%.3f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val AsOfT1 = 883612800L
    val AsOfT2 = 946684800L
    def ordersChangelog = {
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      def row(src: org.apache.spark.sql.DataFrame, ts: org.apache.spark.sql.Column, op: String) =
        src.select(concat(lit("C"), col("o_custkey")).as("s"),
          lit("placed").as("p"), concat(lit("O"), col("o_orderkey")).as("o"),
          ts.as("ts"), lit(op).as("op"))
      row(o, unix_timestamp(col("o_orderdate")), "add").union(
        row(o.filter(col("o_orderstatus") === "F"),
          unix_timestamp(col("o_orderdate")) + 30L * 86400L, "del"))
    }
    val pats = Seq(Bgp.Pat("?c", "placed", "?ord"), Bgp.Pat("?ord", "contains", "?pt"))
    val contains = DocKg.typedSupplyTriples(spark, sfDir)
      .filter(col("p") === "contains").select("s", "p", "o")
    best("base1.ckpt") {
      val b = Changelog.asOfSnapshot(ordersChangelog, AsOfT1).unionByName(contains)
        .localCheckpoint()
      b.unpersist()
    }
    val base1 = Changelog.asOfSnapshot(ordersChangelog, AsOfT1).unionByName(contains)
      .localCheckpoint()
    best("diff.ckpt") {
      val d = Changelog.asOfDelta(ordersChangelog, AsOfT1, AsOfT2).localCheckpoint()
      d.unpersist()
    }
    val diff = Changelog.asOfDelta(ordersChangelog, AsOfT1, AsOfT2).localCheckpoint()
    val added = diff.filter(col("change") === "added").select("s", "p", "o")
    val removed = diff.filter(col("change") === "removed").select("s", "p", "o")
    best("sol1.count")(
      Bgp.matchPatterns(base1, pats, distinctInput = true).count())
    best("plus.count")(
      Bgp.viewDelta(base1, added, pats, disjointDistinct = true).count())
    best("minus.count")(
      Bgp.viewDeltaRetract(base1.unionByName(added), removed, pats,
        distinctInput = true).count())
    best("full.query")(graft.SparkEntry.queries("kg_view_maintained")(spark, sfDir).count())
    // the pre-r6 wiring (separate snapshot + delta aggregations) for A/B
    best("full.old") {
      val b1 = Changelog.asOfSnapshot(ordersChangelog, AsOfT1).unionByName(contains)
        .localCheckpoint()
      val df = Changelog.asOfDelta(ordersChangelog, AsOfT1, AsOfT2).localCheckpoint()
      val add2 = df.filter(col("change") === "added").select("s", "p", "o")
      val rem2 = df.filter(col("change") === "removed").select("s", "p", "o")
      val sol1 = Bgp.matchPatterns(b1, pats, distinctInput = true)
      val plus = Bgp.viewDelta(b1, add2, pats, disjointDistinct = true)
      val minus = Bgp.viewDeltaRetract(b1.unionByName(add2), rem2, pats,
        distinctInput = true)
      sol1.unionByName(plus).join(minus, sol1.columns.toIndexedSeq, "left_anti").count()
    }
    // the new wiring, inline (fused asOfStates)
    best("full.new") {
      val states = Changelog.asOfStates(ordersChangelog, AsOfT1, AsOfT2).localCheckpoint()
      val b1 = states.filter(col("live1")).select("s", "p", "o")
        .unionByName(contains).localCheckpoint()
      val add2 = states.filter(col("live2") && !col("live1")).select("s", "p", "o")
      val rem2 = states.filter(col("live1") && !col("live2")).select("s", "p", "o")
      val sol1 = Bgp.matchPatterns(b1, pats, distinctInput = true)
      val plus = Bgp.viewDelta(b1, add2, pats, disjointDistinct = true)
      val minus = Bgp.viewDeltaRetract(b1.unionByName(add2), rem2, pats,
        distinctInput = true)
      sol1.unionByName(plus).join(minus, sol1.columns.toIndexedSeq, "left_anti").count()
    }
    spark.stop()
  }
}
