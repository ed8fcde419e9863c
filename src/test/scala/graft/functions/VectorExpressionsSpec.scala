package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends AnyFunSuite with SparkTestSession {

  private def vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 50).map(i => (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "v")
  }

  test("native cosine == HOF cosine bit-for-bit (same fold order)") {
    val df = vecs
    val a = df.select(col("id"), col("v"))
    val b = df.select(col("id").as("id2"), col("v").as("v2"))
    val joined = a.crossJoin(b).filter(col("id") < col("id2"))
    val rows = joined.select(
      Similarity.cosine(col("v"), col("v2")).as("native"),
      Similarity.cosineHof(col("v"), col("v2")).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"bitwise mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}"))
  }

  test("native hyperplane_sig == HOF sign-bit formulation bit-for-bit") {
    val planes = Similarity.hyperplanes(32, 64)
    val native = vecs.select(col("id"),
      VectorExpressions.hyperplane_sig(col("v"), planes, rowsPerBand = 8).as("sigs"))
    // the original HOF formulation as the parity oracle
    val bits = planes.map { p =>
      val d = aggregate(zip_with(col("v"), typedlit(p.toSeq), (x, r) => x * r),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit("1")).otherwise(lit("0"))
    }
    val hofSigs = (0 until 4).map(b => concat(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(bits.slice(b * 8, (b + 1) * 8)): _*))
    val hof = vecs.select(col("id"), array(hofSigs: _*).as("sigs"))
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val h = hof.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(n == h && n.nonEmpty)
    // every sig: 4 bands x 8 bits
    assert(n.values.forall(s => s.length == 4 && s.forall(_.length == 8)))
  }

  test("multi-probe IVF: candidates superset of single-probe; recall@3 vs brute force improves") {
    import org.apache.spark.sql.{functions => F}
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 30)
    def topk(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = topk(Similarity.bruteForceTopK(e, q, col("vec_id"), col("embedding"), k = 3)
      .select(col("query_id"), col("neighbor_id")))
    val single = topk(Similarity.bucketedTopK(e, q, col("vec_id"), col("embedding"), k = 3, probeDims = 8))
    val multi = topk(Similarity.bucketedTopKMultiProbe(e, q, col("vec_id"), col("embedding"),
      k = 3, probeDims = 8, nProbe = 3))
    val rSingle = (single intersect brute).size.toDouble / brute.size
    val rMulti = (multi intersect brute).size.toDouble / brute.size
    assert(rMulti >= rSingle, s"multi-probe recall $rMulti < single-probe $rSingle")
    assert(rMulti > 0.0)
    // the first probe bucket IS the single-probe bucket
    val pb = e.select(col("vec_id"),
      Similarity.bucket(col("embedding"), 8).as("b"),
      F.element_at(Similarity.probeBuckets(col("embedding"), 8, 2), 1).as("p1")).collect()
    pb.foreach(r => assert(r.getAs[Long]("b") == r.getAs[Int]("p1").toLong ||
      r.getAs[Int]("b") == r.getAs[Int]("p1")))
  }

  test("native centroid argmin/minDist == HOF lexicographic formulation (incl. ties)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // include exact duplicates of centroid rows to exercise tie-breaking
    val cents = Array.fill(5)(Array.fill(16)(rnd.nextInt(2000).toLong - 1000))
    val dupTie = cents(2).clone() // equidistant (d=0) to centroid 2 only
    val qs = (0 until 200).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextInt(2000).toLong - 1000))) ++
      Seq((200L, dupTie), (201L, cents(0).clone()))
    val df = qs.toDF("id", "q")
    val rows = df.select(col("id"),
      VectorExpressions.centroid_argmin(col("q"), cents).as("native"),
      Similarity.nearestCentroidHof(col("q"), cents).as("hof"),
      VectorExpressions.centroid_min_dist(col("q"), cents).as("md")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"argmin mismatch at id=${r.getLong(0)}")
      assert(r.getLong(3) >= 0L)
    }
    assert(rows.find(_.getLong(0) == 201L).get.getLong(3) == 0L)
  }

  test("sampled maximin seeding: deterministic, partition-invariant, recovers planted clusters") {
    import spark.implicits._
    // same planted-centers corpus shape as the exact-seeding test: if
    // seed-on-sample collapsed into one blob, Lloyd could not separate them
    val rnd = new scala.util.Random(23)
    val centers = Seq(
      Array.fill(8)(0.9), Array.fill(8)(-0.9),
      Array.tabulate(8)(i => if (i % 2 == 0) 0.9 else -0.9))
    val pts = for {
      (c, g) <- centers.zipWithIndex
      i <- 0 until 40
    } yield ((g * 40 + i).toLong, g, c.map(v => v + rnd.nextDouble() * 0.1 - 0.05))
    val df = pts.toDF("id", "planted", "v")

    val sampled = Similarity.kmeansCentroids(df, col("id"), col("v"), k = 3, iters = 2,
      seedSampleFraction = Some(0.5))
    // bit-reproducible across partitionings AND re-runs (hash-selected
    // sample + driver-side maximin have no rng / partition dependence)
    val sampled2 = Similarity.kmeansCentroids(df.repartition(7), col("id"), col("v"),
      k = 3, iters = 2, seedSampleFraction = Some(0.5))
    assert(sampled.map(_.toSeq).toSeq == sampled2.map(_.toSeq).toSeq)

    val assigned = Similarity.kmeansAssign(df, col("id"), col("v"), sampled)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cellOf = pts.groupBy(_._2).map { case (g, ps) =>
      g -> ps.map(p => assigned(p._1)).distinct }
    assert(cellOf.values.forall(_.size == 1), s"split planted group: $cellOf")
    assert(cellOf.values.flatten.toSet.size == 3, s"merged groups: $cellOf")

    // guards: sample too small for k fails fast, bad fraction fails fast
    intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(df, col("id"), col("v"), k = 100, iters = 1,
        seedSampleFraction = Some(0.01))
    }
    intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(df, col("id"), col("v"), k = 3, iters = 1,
        seedSampleFraction = Some(0.0))
    }
  }

  test("k-means multi-probe: superset of single-cell results; probes are the nearest cells") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kmeansCentroids(e, col("vec_id"), col("embedding"), k = 4, iters = 2)
    val q = e.filter(col("vec_id") < 10)
    val single = Similarity.kmeansTopK(e, q, col("vec_id"), col("embedding"), k = 3, cents)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    // nProbe=1 must equal the single-cell search exactly
    val p1 = Similarity.kmeansTopKMultiProbe(e, q, col("vec_id"), col("embedding"),
        k = 3, cents, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    assert(p1 == single)
    // nProbe=4 (all cells) == brute force top-3 (recall 1.0 by construction)
    val pAll = Similarity.kmeansTopKMultiProbe(e, q, col("vec_id"), col("embedding"),
        k = 3, cents, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    val brute = Similarity.bruteForceTopK(e, q, col("vec_id"), col("embedding"), k = 3)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    assert(pAll == brute)
    // recall is monotone in nProbe vs the brute-force truth
    val p2 = Similarity.kmeansTopKMultiProbe(e, q, col("vec_id"), col("embedding"),
        k = 3, cents, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    assert((p1 intersect brute).size <= (p2 intersect brute).size)
    assert((p2 intersect brute).size <= (pAll intersect brute).size)
    intercept[IllegalArgumentException] {
      Similarity.kmeansTopKMultiProbe(e, q, col("vec_id"), col("embedding"),
        k = 3, cents, nProbe = 5)
    }
  }

  test("k-means IVF: recovers planted clusters; partition-invariant; search stays in-cell") {
    import spark.implicits._
    // three well-separated planted centers in 8-d; 20 points each, small jitter
    val rnd = new scala.util.Random(11)
    val centers = Seq(
      Array.fill(8)(0.9), Array.fill(8)(-0.9),
      Array.tabulate(8)(i => if (i % 2 == 0) 0.9 else -0.9))
    val pts = for {
      (c, g) <- centers.zipWithIndex
      i <- 0 until 20
    } yield ((g * 20 + i).toLong, g, c.map(v => v + rnd.nextDouble() * 0.1 - 0.05))
    val df = pts.map { case (id, g, v) => (id, g, v) }.toDF("id", "planted", "v")

    val cents = Similarity.kmeansCentroids(df, col("id"), col("v"), k = 3, iters = 2)
    assert(cents.length == 3 && cents.forall(_.length == 8))
    val assigned = Similarity.kmeansAssign(df, col("id"), col("v"), cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every planted group lands in exactly one cell, and the cells differ
    val cellOf = pts.groupBy(_._2).map { case (g, ps) =>
      g -> ps.map(p => assigned(p._1)).distinct }
    assert(cellOf.values.forall(_.size == 1), s"split planted group: $cellOf")
    assert(cellOf.values.flatten.toSet.size == 3, s"merged groups: $cellOf")

    // partition-invariance: identical centroids and assignments from a
    // differently-partitioned input (exact integer arithmetic => no
    // float-order sensitivity)
    val cents2 = Similarity.kmeansCentroids(df.repartition(7), col("id"), col("v"), k = 3, iters = 2)
    assert(cents.map(_.toSeq).toSeq == cents2.map(_.toSeq).toSeq)

    // search: top-k neighbors come from the query's own cell
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ec = Similarity.kmeansCentroids(e, col("vec_id"), col("embedding"), k = 4, iters = 2)
    val res = Similarity.kmeansTopK(e, e.filter(col("vec_id") < 10), col("vec_id"),
      col("embedding"), k = 3, ec)
    val cells = Similarity.kmeansAssign(e, col("vec_id"), col("embedding"), ec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = res.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(
      cells(r.getAs[Long]("query_id")) == cells(r.getAs[Long]("neighbor_id"))))
  }

  test("SQL registration + codegen plan") {
    VectorExpressions.register(spark)
    vecs.createOrReplaceTempView("vx")
    val df = spark.sql(
      "SELECT a.id, cosine_similarity(a.v, b.v) AS c FROM vx a JOIN vx b ON a.id < b.id")
    assert(df.count() == 50 * 49 / 2)
    df.collect() // finalize AQE
    // expression participates in whole-stage codegen (not CodegenFallback):
    // the '*(n)' prefix marks WholeStageCodegen stages, and the Project
    // evaluating cosine_similarity must carry it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("Project") &&
      l.contains("cosine_similarity") && l.contains("*(")), plan)
  }

  test("self-cosine is 1.0; orthogonal is 0.0; type check rejects non-double arrays") {
    import spark.implicits._
    val df = Seq((Array(1.0, 0.0), Array(0.0, 2.0))).toDF("a", "b")
    val r = df.select(
      Similarity.cosine(col("a"), col("a")),
      Similarity.cosine(col("a"), col("b"))).collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
    val bad = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(graft.functions.VectorExpressions.cosine_similarity(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_similarity") ||
      e.getMessage.toLowerCase.contains("datatype"))
  }
}
