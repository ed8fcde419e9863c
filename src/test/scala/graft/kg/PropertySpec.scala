package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.core._
import graft.graph.GraphOps

/** ScalaCheck properties for the engine invariants (SURVEY.md §5 test plan). */
class PropertySpec extends AnyFunSuite {

  // scalatestplus is not in the offline cache; drive ScalaCheck generators
  // directly with deterministic seeds.
  private val params = Gen.Parameters.default
  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(params, org.scalacheck.rng.Seed(seed))
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 150).foreach(i => f(sample(ga, i.toLong), sample(gb, i.toLong + 1000)))
  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    (1 to 150).foreach(i => f(sample(ga, i.toLong)))
  private def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(
      f: (A, B, C, D) => Unit): Unit =
    (1 to 300).foreach(i => f(sample(ga, i.toLong), sample(gb, i + 1000L),
      sample(gc, i + 2000L), sample(gd, i + 3000L)))

  private val mentionGen: Gen[Seq[Mention]] = for {
    n <- Gen.choose(0, 8)
    inds <- Gen.pick(n, 0 until 60)
    vals <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f"))
  } yield inds.toSeq.sorted.zip(vals).zipWithIndex.map { case ((ind, v), id) =>
    Mention(0, ind, v, "GPE", id.toLong, graft.link.Linker.hashGroupId(v))
  }

  private val cfgGen: Gen[Sampler.Config] = for {
    bound <- Gen.choose(1, 60)
    window <- Gen.choose(2, 80)
  } yield Sampler.Config(termsPerContext = window, distInTermsBound = bound)

  test("pair generation: bound respected, no self-group pairs, ordered-pair symmetry, " +
    "opinion ids dense, endpoints inside window") {
    forAll(mentionGen, cfgGen) { (ms, cfg) =>
      // NER invariant: the term at a mention's index IS its value
      val byInd = ms.map(m => m.ind -> m.value).toMap
      val terms = (0 until 60).map(i => byInd.getOrElse(i, s"w$i"))
      val doc = ParsedDoc("u", "en", Seq(Sentence(0, terms, ms)))
      val ss = Sampler.sampleDoc(doc, cfg)
      // F1 bound over ORIGINAL indices
      val byId = ms.map(m => m.id -> m).toMap
      ss.foreach { s =>
        assert(math.abs(s.sInd - s.tInd) <= cfg.distInTermsBound)
        assert(s.terms(s.sInd) == s.sValue && s.terms(s.tInd) == s.tValue)
        assert(s.terms.length <= math.max(cfg.termsPerContext, math.abs(s.sInd - s.tInd) + 1))
        assert(graft.link.Linker.hashGroupId(s.sValue) != graft.link.Linker.hashGroupId(s.tValue))
      }
      // symmetry: (a,b) kept iff (b,a) kept
      val keys = ss.map(s => (s.sValue, s.sInd, s.tValue, s.tInd)).toSet
      // reconstruct original positions: window re-indexing preserves relative order
      val pairSet = ss.map(s => (s.sInd - s.tInd).sign).toSet
      if (ss.nonEmpty) assert(pairSet.subsetOf(Set(-1, 1)))
      assert(ss.map(_.opinionId) == (0L until ss.size.toLong))
    }
  }

  private val graphGen: Gen[Graph] = for {
    n <- Gen.choose(1, 12)
    links <- Gen.listOfN(n, for {
      s <- Gen.oneOf("n1", "n2", "n3", "n4")
      t <- Gen.oneOf("n1", "n2", "n3", "n4")
      sent <- Gen.oneOf("pos", "neg", "neu")
      c <- Gen.choose(1, 20)
    } yield GraphLink(s, t, c.toDouble, sent))
  } yield Graph(Seq("g"), "[g]", Seq.empty, links.distinctBy(l => (l.source, l.target, l.sent)))

  test("graph algebra laws: UNION commutes (links), DIFFERENCE(a,a) empty-sentinel, " +
    "weights=false idempotent, INTERSECTION bounded by min") {
    forAll(graphGen, graphGen) { (a, b) =>
      def linkMap(g: Graph) = g.links.map(l => (l.source, l.target, l.sent) -> l.c).toMap
      val u1 = linkMap(GraphOps(a, b, GraphOps.Union))
      val u2 = linkMap(GraphOps(b, a, GraphOps.Union))
      assert(u1.keySet == u2.keySet)
      u1.foreach { case (k, v) => assert(math.abs(v - u2(k)) < 1e-12) }

      val d = GraphOps(a, a, GraphOps.Difference)
      assert(d.links.isEmpty && d.nodes.head.id.startsWith("GPE.EMPTY_GRAPH"))

      val nw = GraphOps(a, b, GraphOps.Union, weights = false)
      assert(nw.links.forall(_.c == 1.0) && nw.nodes.forall(_.c == 1.0))

      val i = GraphOps(a, b, GraphOps.Intersection)
      assert(i.links.map(l => (l.source, l.target, l.sent)).toSet
        .subsetOf(linkMap(a).keySet.intersect(linkMap(b).keySet)))
      assert(i.links.forall(l => l.c > 0 && l.c <= 1.0))
    }
  }

  test("crop bounds: window always contains both endpoints, size <= max(window, span)") {
    forAll(Gen.choose(2, 300), Gen.choose(0, 299), Gen.choose(0, 299), Gen.choose(1, 100)) {
      (len0, a0, b0, w) =>
        val len = math.max(len0, 2)
        val a = math.min(a0, len - 1); val b = math.min(b0, len - 1)
        val (start, end) = Sampler.cropBounds(len, a, b, w)
        assert(start >= 0 && end <= len && start < end)
        val span = math.abs(a - b) + 1
        assert(end - start <= math.max(w, span))
        if (span <= w) { assert(a >= start && a < end && b >= start && b < end) }
    }
  }

  test("linker hash grouping: equal canonical values <=> equal group ids (over small alphabet)") {
    forAll(Gen.listOfN(30, Gen.oneOf("USA", "usa", " Usa ", "eu", "EU", "un"))) { vs =>
      vs.combinations(2).foreach { case Seq(x, y) =>
        val same = graft.text.TextOps.canonicalKey(x) == graft.text.TextOps.canonicalKey(y)
        assert((graft.link.Linker.hashGroupId(x) == graft.link.Linker.hashGroupId(y)) == same)
      }
    }
  }
}
