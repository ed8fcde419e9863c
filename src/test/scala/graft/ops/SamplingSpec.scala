package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class SamplingSpec extends AnyFunSuite with SparkTestSession {

  private def docs = {
    import spark.implicits._
    (0 until 2000).map(i =>
      (i.toLong, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr"))
      .toDF("doc_id", "lang")
  }

  test("sampleByHash is deterministic and partition-invariant") {
    val a = Sampling.sampleByHash(docs.repartition(3), col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleByHash(docs.repartition(17), col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // fraction is approximately honored (md5 is uniform; 2000 rows, f=0.3)
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"kept ${a.size}/2000")
  }

  test("fraction 0 keeps nothing; fraction 1 keeps everything") {
    assert(Sampling.sampleByHash(docs, col("doc_id"), 0.0).count() == 0)
    assert(Sampling.sampleByHash(docs, col("doc_id"), 1.0).count() == 2000)
  }

  test("sample monotonicity: a smaller fraction is a subset of a larger one") {
    // the property that makes hash-mod sampling USABLE for mixture tuning:
    // raising a stratum's fraction only ADDS documents, never reshuffles them
    val small = Sampling.sampleByHash(docs, col("doc_id"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Sampling.sampleByHash(docs, col("doc_id"), 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
  }

  test("stratifiedSample honors per-stratum fractions and the default") {
    val kept = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.8, "de" -> 0.2), default = 0.0)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 500.0 // docs per lang bucket (en, de); fr has 1000
    assert(math.abs(byLang("en") / n - 0.8) < 0.08, s"en: ${byLang.get("en")}")
    assert(math.abs(byLang.getOrElse("de", 0L) / n - 0.2) < 0.08, s"de: ${byLang.get("de")}")
    assert(!byLang.contains("fr")) // default 0.0 drops the unlisted stratum
  }

  test("plan: the sample is a single filter over the scan (no shuffle, no rng)") {
    val plan = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.5), default = 0.1).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Sample"), plan) // not Spark's rng sampler
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("tokenBudgetMixture: equals the single-level prefix rule, any cells/partitioning") {
    import spark.implicits._
    val rows = (0 until 600).map { i =>
      (i.toLong, s"src${i % 5}", 5L + (i * 13) % 40)
    }
    val df = rows.toDF("id", "src", "tok")
    val weights = Map("src0" -> 0.30, "src1" -> 0.10, "src3" -> 0.0)
    val budget = 3000L
    val default = 0.05
    // independent reference: per source, order by (cell, md5(id), id),
    // keep while the inclusive running token sum fits the source budget
    def ref(cells: Int): Set[Long] = {
      val cellWidth = 1000000L / cells
      def bucket(id: Long) =
        java.lang.Long.parseLong(md5hex(id.toString).take(15), 16) % 1000000L
      rows.groupBy(_._2).flatMap { case (src, rs) =>
        val b = (weights.getOrElse(src, default) * budget).toLong
        var cum = 0L
        rs.sortBy { case (id, _, _) =>
          (bucket(id) - bucket(id) % cellWidth, md5hex(id.toString), id)
        }.flatMap { case (id, _, tok) =>
          cum += tok; if (cum <= b) Some(id) else None
        }
      }.toSet
    }
    for (cells <- Seq(1, 8, 1000); parts <- Seq(2, 17)) {
      val got = Sampling.tokenBudgetMixture(df.repartition(parts), col("id"),
          col("src"), col("tok"), weights, budget, default, cells)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == ref(cells), s"cells=$cells parts=$parts")
    }
    // weight-0 source contributes nothing; every per-source budget is tight:
    // the kept token mass fits, and no further doc in canonical order would
    val kept = Sampling.tokenBudgetMixture(df, col("id"), col("src"),
      col("tok"), weights, budget, default, cells = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(!kept.exists(_._2 == "src3"))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    bySrc.foreach { case (src, toks) =>
      assert(toks <= (weights.getOrElse(src, default) * budget).toLong, src)
    }
  }

  test("tokenBudgetMixture: raising the total budget only adds documents") {
    import spark.implicits._
    val df = (0 until 300).map(i => (i.toLong, s"s${i % 3}", 10L))
      .toDF("id", "src", "tok")
    val w = Map("s0" -> 0.5, "s1" -> 0.3)
    val small = Sampling.tokenBudgetMixture(df, col("id"), col("src"),
      col("tok"), w, 1000L, 0.1, cells = 8)
      .select("id").collect().map(_.getLong(0)).toSet
    val large = Sampling.tokenBudgetMixture(df, col("id"), col("src"),
      col("tok"), w, 2400L, 0.1, cells = 8)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large) && small.size < large.size)
  }

  test("groupCap: per-group cap, all columns preserved, partition-invariant") {
    import spark.implicits._
    val rows = ((0 until 40).map(i => (i.toLong, "big", s"t$i")) ++
      (100 until 103).map(i => (i.toLong, "small", s"t$i")))
      .toDF("id", "grp", "payload")
    val kept = Sampling.groupCap(rows, col("grp"), col("id"), cap = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(kept.count(_._2 == "big") == 5)
    assert(kept.filter(_._2 == "small").map(_._1).toSet == Set(100L, 101L, 102L))
    kept.foreach { case (i, _, p) => assert(p == s"t$i") } // columns intact
    assert(Sampling.groupCap(rows, col("grp"), col("id"), 5).columns.toSeq ==
      Seq("id", "grp", "payload"))
    val again = Sampling.groupCap(rows.repartition(9), col("grp"), col("id"), cap = 5)
      .collect().map(r => r.getLong(0)).toSet
    assert(again == kept.map(_._1).toSet)
  }
}
