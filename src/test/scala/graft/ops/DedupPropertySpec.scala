package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._

/** ScalaCheck-style properties for the dedup/linking invariants.
  * Local functions are property-tested directly; the distributed
  * connected-components operator is checked against a local BFS oracle on
  * randomized graphs (fixed seeds — deterministic). */
class DedupPropertySpec extends AnyFunSuite with graft.SparkTestSession {

  private val params = Gen.Parameters.default
  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(params, org.scalacheck.rng.Seed(seed))

  test("charShingles: count, width, reconstruction (150 random values)") {
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('.')))
      .map(_.mkString)
    (1 to 150).foreach { i =>
      val v = sample(gen, i.toLong)
      val w = 3
      val sh = graft.link.Linker.charShingles(v, w)
      val canon = "$" + graft.text.TextOps.canonicalKey(v).replaceAll(raw"\s+", " ") + "$"
      if (canon.length < w) assert(sh == Seq(canon))
      else {
        assert(sh.length == canon.length - w + 1)
        assert(sh.forall(_.length == w))
        // overlapping reconstruction: first chars + last shingle == padded form
        assert(sh.map(_.head).mkString + sh.last.tail == canon)
      }
    }
  }

  test("lshGroups is a valid partition and permutation-invariant (40 random vocabularies)") {
    val vocabGen = for {
      n <- Gen.choose(1, 12)
      vs <- Gen.listOfN(n, Gen.oneOf(
        "spark", "sparks", "spark inc", "table", "tables", "customer",
        "kustomer", "alpha corp", "alpha corp.", "beta", "gamma", "delta"))
    } yield vs.distinct
    (1 to 40).foreach { i =>
      val vocab = sample(vocabGen, i.toLong)
      val groups = graft.link.Linker.lshGroups(vocab, jaccardThreshold = 0.55)
      // total: every canonical value mapped
      val canon = vocab.map(graft.text.TextOps.canonicalKey).distinct
      assert(groups.keySet == canon.toSet)
      // permutation-invariant
      assert(graft.link.Linker.lshGroups(vocab.reverse, jaccardThreshold = 0.55) == groups)
      // group ids are hashGroupId of a member (the canonical representative)
      val byId = groups.groupBy(_._2)
      byId.foreach { case (gid, members) =>
        assert(members.keys.exists(m => graft.link.Linker.hashGroupId(m) == gid),
          s"group id $gid is not derived from a member of ${members.keys}")
      }
    }
  }

  test("clusters == local BFS components on randomized graphs (8 seeds)") {
    import spark.implicits._
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 3 + rnd.nextInt(20)
      val edges = (1 to n).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      if (edges.nonEmpty) {
        // local BFS oracle
        val adj = scala.collection.mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
        edges.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
        val expected = scala.collection.mutable.Map.empty[Long, Long]
        adj.keys.toSeq.sorted.foreach { start =>
          if (!expected.contains(start)) {
            val comp = scala.collection.mutable.Set(start)
            val queue = scala.collection.mutable.Queue(start)
            while (queue.nonEmpty) adj(queue.dequeue()).foreach { nb =>
              if (comp.add(nb)) queue.enqueue(nb)
            }
            val rep = comp.min
            comp.foreach(v => expected(v) = rep)
          }
        }
        val got = Dedup.clusters(edges.toDF("a_id", "b_id"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected.toMap, s"seed=$seed edges=$edges")
      }
    }
  }

  test("shingles column: count == max(0, n-w+1), each shingle = w space-joined tokens") {
    import spark.implicits._
    val docs = Seq(
      "a b c d e", "a", "", "x y", "one two three four five six seven")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    Seq(1, 2, 3).foreach { w =>
      val rows = docs.select(col("id"), col("text"),
          Dedup.shingles(Dedup.tokens(col("text")), w).as("sh"))
        .collect()
      rows.foreach { r =>
        val toks = r.getString(1).trim.split(raw"\s+").filter(_.nonEmpty)
        val sh = r.getSeq[String](2)
        val expected = if (w == 1) toks.length // w=1: tokens verbatim (incl. "" for empty text edge)
          else math.max(0, toks.length - w + 1)
        if (!(r.getString(1).trim.isEmpty && w == 1))
          assert(sh.length == expected, s"w=$w text='${r.getString(1)}' got $sh")
        if (w > 1) sh.foreach(s => assert(s.split(" ").length == w))
      }
    }
  }
}
