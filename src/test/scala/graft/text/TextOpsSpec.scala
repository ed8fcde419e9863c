package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.gen.PageGen

class TextOpsSpec extends AnyFunSuite {

  test("splitLines keeps empty sentences (reference linesplit parity, run/utils.py:17)") {
    assert(TextOps.splitLines("a\n\n b \nc") == Seq("a", "", "b", "c"))
    assert(TextOps.splitLines("") == Seq(""))
  }

  test("tokenize splits on whitespace runs; empty yields no terms") {
    assert(TextOps.tokenize("  a  b\tc ") == Seq("a", "b", "c"))
    assert(TextOps.tokenize("   ") == Seq.empty)
    assert(TextOps.tokenize("") == Seq.empty)
  }

  test("splitSentences: deterministic punkt-equivalent") {
    assert(TextOps.splitSentences("One two. Three four! Five?") ==
      Seq("One two.", "Three four!", "Five?"))
    // no split on lowercase continuation
    assert(TextOps.splitSentences("approx. value is 3") == Seq("approx. value is 3"))
  }

  test("extractText: tags stripped, entities decoded, scripts dropped") {
    val html = "<html><script>bad()</script><body><h1>Title</h1><p>A &amp; B</p><p>C&lt;D</p></body></html>"
    assert(TextOps.extractText(html) == "TitleA & B\nC<D".replace("TitleA", "Title\nA")
      || TextOps.extractText(html) == "Title\nA & B\nC<D")
  }

  test("extractText(pageHtml(text)) == text byte-identically (input_hint invariant)") {
    for (i <- 0L until 50L) {
      val text = PageGen.pageText(42L, i)
      val roundTrip = TextOps.extractText(PageGen.pageHtml(text))
      assert(roundTrip == text, s"page $i round-trip mismatch")
    }
  }

  test("generator determinism: same (seed, i) -> same page") {
    assert(PageGen.pageText(7L, 3L) == PageGen.pageText(7L, 3L))
    assert(PageGen.pageText(7L, 3L) != PageGen.pageText(8L, 3L))
  }

  test("tokenize == trim + regex \\s+ split on random strings incl. control chars") {
    val ws = java.util.regex.Pattern.compile("\\s+")
    def oracle(s: String): Seq[String] = {
      val t = s.trim
      if (t.isEmpty) Seq.empty
      else scala.collection.immutable.ArraySeq.unsafeWrapArray(ws.split(t))
    }
    val charGen = Gen.frequency(
      (8, Gen.alphaNumChar), (2, Gen.const(' ')), (1, Gen.const('\t')),
      (1, Gen.const('\n')), (1, Gen.const('\u000B')), (1, Gen.const('\r')),
      (1, Gen.const('\u0001')), (1, Gen.const('\u00A0')), (1, Gen.const('я')))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    (1 to 300).foreach { i =>
      val s = strGen.pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
      assert(TextOps.tokenize(s) == oracle(s), s"mismatch on ${s.map(_.toInt)}")
    }
  }
}
