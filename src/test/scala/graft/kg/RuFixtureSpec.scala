package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Page

/** Golden parity against the reference's own 32-row serialization fixture
  * (/root/reference/test/data/opennre-data-test-predict.sqlite, produced from
  * the bracket-annotated RU text in
  * /root/reference/test/test_pipeline_sample.py:58-64). The expectations below
  * are transcribed from that sqlite's `contents` table: term indices, entity
  * arrays, pair order, and the v0.24 masked text_a rendering, byte for byte. */
class RuFixtureSpec extends AnyFunSuite {

  private val text =
    """24 марта президент [США] [Джо-Байден] провел переговоры с
      |               лидерами стран [Евросоюза] в [Брюсселе] , вызвав внимание рынка и предположения о
      |               том, что [Америке] удалось уговорить [ЕС] совместно бойкотировать российские нефть
      |               и газ.  [Европейский-Союз] крайне зависим от [России] в плане поставок нефти и
      |               газа.""".stripMargin

  private val cfg = KgPipeline.Config(
    sampler = Sampler.Config(termsPerContext = 50, distInTermsBound = 50, renderMode = "masked"),
    nerTypes = Set.empty, // fixture uses the bracket parser: all types UNDEFINED
    splitter = "sentence")

  private def samples = Sampler.sampleDoc(
    KgPipeline.parsePage(Page("data/example.txt:0", null, null, text, "ru"),
      graft.ner.BracketNer, cfg),
    cfg.sampler)

  test("32 samples: 30 ordered pairs in sentence 0, 2 in sentence 1 (fixture row count)") {
    val ss = samples
    assert(ss.size == 32)
    assert(ss.count(_.sentInd == 0) == 30)
    assert(ss.count(_.sentInd == 1) == 2)
    assert(ss.map(_.opinionId) == (0L until 32L))
  }

  test("sentence 0 entity layout matches fixture: indices 3,4,10,12,22,25") {
    val s0 = samples.filter(_.sentInd == 0)
    assert(s0.forall(_.entities == Seq(3, 4, 10, 12, 22, 25)))
    assert(s0.forall(_.entityValues ==
      Seq("США", "Джо-Байден", "Евросоюза", "Брюсселе", "Америке", "ЕС")))
    assert(s0.forall(_.entityTypes == Seq.fill(6)("UNDEFINED")))
    // fixture pair order: source ascending, target ascending (rows 0-4: 3->{4,10,12,22,25})
    assert(s0.take(5).map(x => (x.sInd, x.tInd)) ==
      Seq((3, 4), (3, 10), (3, 12), (3, 22), (3, 25)))
    assert(s0(5).sInd == 4 && s0(5).tInd == 3)
  }

  test("masked text_a is byte-identical to fixture rows 0, 30, 31") {
    val ss = samples
    assert(ss.head.textA ==
      "24 марта президент #S #O провел переговоры с лидерами стран #E в #E , вызвав внимание " +
        "рынка и предположения о том, что #E удалось уговорить #E совместно бойкотировать " +
        "российские нефть и газ.")
    val s1 = ss.filter(_.sentInd == 1)
    assert(s1.map(_.textA) == Seq(
      "#S крайне зависим от #O в плане поставок нефти и газа.",
      "#O крайне зависим от #S в плане поставок нефти и газа."))
    assert(s1.forall(_.entities == Seq(0, 4)))
    assert(s1.forall(_.entityValues == Seq("Европейский-Союз", "России")))
  }

  test("triple P/R vs the reference-derived oracle = 1.0 (north_rule target >= 0.95)") {
    // oracle: the fixture's 32 (s_ind, t_ind, sent_ind) pair identities
    val oracle: Set[(Int, Int, Int)] = {
      val s0 = Seq(3, 4, 10, 12, 22, 25)
      val p0 = for (a <- s0; b <- s0 if a != b) yield (a, b, 0)
      (p0 ++ Seq((0, 4, 1), (4, 0, 1))).toSet
    }
    val got = samples.map(s => (s.sInd, s.tInd, s.sentInd)).toSet
    val tp = got.intersect(oracle).size.toDouble
    val precision = tp / got.size
    val recall = tp / oracle.size
    assert(precision == 1.0 && recall == 1.0, s"P=$precision R=$recall")
  }

  test("prompted (v0.25) rendering of the same doc follows entity.py:5-15") {
    val prompted = Sampler.sampleDoc(
      KgPipeline.parsePage(Page("d", null, null, text, "ru"), graft.ner.BracketNer,
        cfg.copy(sampler = cfg.sampler.copy(renderMode = "prompted"))),
      cfg.sampler.copy(renderMode = "prompted"))
    val last = prompted.filter(_.sentInd == 1).head
    assert(last.textA ==
      "<<Европейский-Союз>> [SUBJECT] крайне зависим от <<России>> [OBJECT] в плане поставок нефти и газа.")
    assert(last.textB.startsWith("Given text: <<Европейский-Союз>> [SUBJECT]"))
  }
}
