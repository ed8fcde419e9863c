package graft.ner

import org.scalatest.funsuite.AnyFunSuite

class NerSpec extends AnyFunSuite {

  test("BracketNer mirrors the reference stub (test/utils_entity_parser.py:16-29)") {
    val (terms, ms) = BracketNer.tag(Seq("президент", "[GPE:США]", "провел", "[Джо-Байден]"))
    assert(terms == Seq("президент", "США", "провел", "Джо-Байден"))
    assert(ms == Seq(RawMention(1, "США", "GPE"), RawMention(3, "Джо-Байден", "UNDEFINED")))
  }

  test("BracketNer ignores non-bracket and degenerate tokens") {
    val (terms, ms) = BracketNer.tag(Seq("[]", "a[b]", "[x]"))
    assert(ms == Seq(RawMention(2, "x", "UNDEFINED")))
    assert(terms == Seq("[]", "a[b]", "x"))
  }

  test("LexiconNer tags closed vocabulary, case-insensitive") {
    val ner = LexiconNer(Map("spark" -> "ORG", "table" -> "LOC"))
    val (_, ms) = ner.tag(Seq("the", "Spark", "big", "table"))
    assert(ms == Seq(RawMention(1, "Spark", "ORG"), RawMention(3, "table", "LOC")))
  }

  test("CapitalizedNer merges runs and skips lone sentence-initial capital") {
    val (terms, ms) = CapitalizedNer.tag(Seq("Yesterday", "John", "Smith", "met", "Anna"))
    assert(ms.map(_.value) == Seq("Yesterday John Smith", "Anna"))
    assert(terms == Seq("Yesterday John Smith", "met", "Anna"))
    val (_, ms2) = CapitalizedNer.tag(Seq("Yesterday", "it", "rained"))
    assert(ms2.isEmpty)
  }

  test("type filter keeps default NER_TYPES set (arelight/run/utils.py:13)") {
    val ms = Seq(RawMention(0, "a", "ORG"), RawMention(1, "b", "DATE"), RawMention(2, "c", "GPE"))
    assert(NerOps.filterTypes(ms, Set("ORG", "PERSON", "LOC", "GPE")).map(_.value) == Seq("a", "c"))
    assert(NerOps.filterTypes(ms, Set.empty) == ms)
  }

  test("chunking re-chunks to <=limit with offsets (chunk_it.py parity)") {
    val chunks = NerOps.chunked(Seq(Seq.fill(5)("w"), Seq.empty, Seq.fill(2)("v")), limit = 2)
    assert(chunks.map { case (src, off, c) => (src, off, c.length) } ==
      Seq((0, 0, 2), (0, 2, 2), (0, 4, 1), (2, 0, 2)))
  }
}
