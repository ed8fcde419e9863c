package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class SkewSpec extends AnyFunSuite with SparkTestSession {

  private def skewed = {
    import spark.implicits._
    // hot key "Arland" dominates, like hot entities at web scale
    (1 to 500).map(i => (if (i % 10 == 0) s"k$i" else "Arland", s"v$i", i))
      .toDF("key", "value", "n").repartition(8)
  }

  test("saltedCollect == plain collect_list (sorted), hot key spread over salts") {
    val plain = skewed.groupBy("key")
      .agg(array_sort(collect_list(col("value"))).as("values"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val salted = Skew.saltedCollect(skewed, Seq("key"), col("value"), salt = 7,
      discriminator = col("value"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(salted == plain)
  }

  test("saltedJoin == plain join") {
    import spark.implicits._
    val dim = Seq(("Arland", "GPE"), ("k10", "ORG"), ("k20", "LOC"))
      .toDF("key", "type")
    val plain = skewed.join(dim, "key").select("key", "value", "type")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dim, "key", salt = 5)
      .select("key", "value", "type").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    // left join keeps unmatched rows exactly once
    val plainL = skewed.join(dim, Seq("key"), "left").count()
    val saltedL = Skew.saltedJoin(skewed, dim, "key", salt = 5, "left").count()
    assert(plainL == saltedL)
  }

  test("30%-hot corpus (the bench skew ratio): salted == unsalted, partials spread") {
    import spark.implicits._
    // one entity in ~30% of rows — the north_star hot-entity ratio the
    // BENCH skew section measures; the rest spread over distinct keys
    val hot = (1 to 1000).map(i =>
      (if (i % 10 < 3) "GPE.Arland" else s"k${i / 3}", s"v$i"))
      .toDF("key", "value").repartition(8)
    val plain = hot.groupBy("key")
      .agg(array_sort(collect_list(col("value"))).as("values"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val salted = Skew.saltedCollect(hot, Seq("key"), col("value"), salt = 8,
      discriminator = col("value"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(salted == plain)
    assert(plain("GPE.Arland").length == 300)
    // the hot key's first-phase partials really spread across salts: its
    // 300 values hash over all 8 salt buckets (xxhash64 on the value)
    val partials = hot.withColumn("__salt", Skew.saltCol(8, col("value")))
      .filter(col("key") === "GPE.Arland")
      .select("__salt").distinct().count()
    assert(partials == 8L)
  }

  test("salt column deterministic and within range") {
    val salts = skewed.select(Skew.saltCol(7, col("value")).as("s")).collect().map(_.getLong(0))
    assert(salts.forall(s => s >= 0 && s < 7))
    val again = skewed.select(Skew.saltCol(7, col("value")).as("s")).collect().map(_.getLong(0))
    assert(salts.toSeq == again.toSeq)
  }
}
