package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class SamplerSpec extends AnyFunSuite {

  private def doc(sentences: Sentence*): ParsedDoc = ParsedDoc("u", "en", sentences)
  private def m(sent: Int, ind: Int, v: String, id: Long, gid: Long = -1, t: String = "GPE") =
    Mention(sent, ind, v, t, id, if (gid == -1) id + 1000 else gid)
  private val cfg = Sampler.Config()

  test("fixture parity: 3 mentions -> 6 ordered pairs with sequential opinion ids " +
    "(samples_and_predict-test.sqlite rows 0-5)") {
    val terms = (0 until 14).map(i => s"w$i")
    val d = doc(Sentence(0, terms,
      Seq(m(0, 6, "a", 0), m(0, 11, "b", 1), m(0, 12, "c", 2))))
    val ss = Sampler.sampleDoc(d, cfg)
    assert(ss.map(s => (s.sInd, s.tInd)) ==
      Seq((6, 11), (6, 12), (11, 6), (11, 12), (12, 6), (12, 11)))
    assert(ss.map(_.opinionId) == Seq(0L, 1L, 2L, 3L, 4L, 5L))
    assert(ss.forall(_.linkageId == 0L))
    assert(ss.forall(_.entities == Seq(6, 11, 12)))
    assert(ss.forall(_.sentInd == 0))
    assert(ss.head.id == "u#0")
  }

  test("opinion ids continue across sentences of a doc (fixture rows 6-17)") {
    val terms = (0 until 40).map(i => s"w$i")
    val d = doc(
      Sentence(0, terms.take(14), Seq(m(0, 6, "a", 0), m(0, 11, "b", 1))),
      Sentence(1, terms, Seq(m(1, 5, "c", 2), m(1, 9, "d", 3), m(1, 32, "e", 4))))
    val ss = Sampler.sampleDoc(d, cfg)
    assert(ss.size == 2 + 6)
    assert(ss.map(_.opinionId) == (0L until 8L))
    assert(ss.drop(2).forall(_.sentInd == 1))
  }

  test("distance bound filters pairs (F1) but dist <= bound kept, e.g. |5-32|=27") {
    val terms = (0 until 120).map(i => s"w$i")
    val d = doc(Sentence(0, terms, Seq(m(0, 0, "a", 0), m(0, 60, "b", 1), m(0, 80, "c", 2))))
    val ss = Sampler.sampleDoc(d, Sampler.Config(distInTermsBound = 50, termsPerContext = 50))
    // (0,60): 60 > 50 dropped; (60,80): kept both directions; (0,80) dropped
    assert(ss.map(s => (s.sValue, s.tValue)).toSet == Set(("b", "c"), ("c", "b")))
  }

  test("same-group pairs are excluded (self-opinion rule)") {
    val d = doc(Sentence(0, Seq("x", "y"), Seq(m(0, 0, "usa", 0, gid = 5), m(0, 1, "u.s.", 1, gid = 5))))
    assert(Sampler.sampleDoc(d, cfg).isEmpty)
  }

  test("rendering: <<v>> [SUBJECT] / [OBJECT] / <<v>> (entity.py:5-15) and prompt template") {
    val d = doc(Sentence(0, Seq("пре", "США", "про", "Байден", "и", "ЕС"),
      Seq(m(0, 1, "США", 0), m(0, 3, "Байден", 1), m(0, 5, "ЕС", 2))))
    val ss = Sampler.sampleDoc(d, cfg)
    val first = ss.head // subject США, object Байден
    assert(first.textA == "пре <<США>> [SUBJECT] про <<Байден>> [OBJECT] и <<ЕС>>")
    assert(first.textB == s"Given text: ${first.textA} TASK: Classify sentiment attitude " +
      "of [SUBJECT] to [OBJECT]: positive, negative, neutral")
    assert(first.sValue == "США" && first.tValue == "Байден")
    assert(first.entityValues == Seq("США", "Байден", "ЕС"))
    assert(first.entityTypes == Seq("GPE", "GPE", "GPE"))
  }

  test("synonym-of-subject rendered as [SUBJECT] too (SynonymSubject, entity.py:10-13)") {
    val d = doc(Sentence(0, Seq("usa", "met", "bob", "and", "america"),
      Seq(m(0, 0, "usa", 0, gid = 1), m(0, 2, "bob", 1, gid = 2), m(0, 4, "america", 2, gid = 1))))
    val s0 = Sampler.sampleDoc(d, cfg).head
    assert(s0.textA == "<<usa>> [SUBJECT] met <<bob>> [OBJECT] and <<america>> [SUBJECT]")
  }

  test("crop keeps both endpoints and re-indexes (P12)") {
    val terms = (0 until 200).map(i => s"w$i")
    val d = doc(Sentence(0, terms, Seq(m(0, 100, "a", 0), m(0, 120, "b", 1), m(0, 10, "far", 2))))
    val ss = Sampler.sampleDoc(d, Sampler.Config(termsPerContext = 50, distInTermsBound = 50))
    val s0 = ss.find(s => s.sValue == "a" && s.tValue == "b").get
    assert(s0.terms.length == 50)
    assert(s0.terms(s0.sInd) == "w100" && s0.terms(s0.tInd) == "w120")
    // far mention (ind 10) outside window -> not in entities
    assert(s0.entities.forall(i => i >= 0 && i < 50))
    assert(!s0.entityValues.contains("far"))
  }

  test("cropBounds edge cases") {
    assert(Sampler.cropBounds(10, 2, 5, 50) == (0, 10))
    val (s1, e1) = Sampler.cropBounds(200, 0, 49, 50)
    assert(s1 == 0 && e1 == 50)
    val (s2, e2) = Sampler.cropBounds(200, 190, 199, 50)
    assert(e2 <= 200 && e2 - s2 == 50 && s2 <= 190)
  }
}
