package graft.ner

import org.scalatest.funsuite.AnyFunSuite

class BatchedNerSpec extends AnyFunSuite {

  private val ner = BatchedNer(StubBioTagger, chunkLimit = 4, batchSize = 2)

  test("BIO decode merges spans into single terms with rewritten indices") {
    val (terms, ms) = BatchedNer(StubBioTagger).decode(
      Seq("met", "John", "Smith", "at", "NATO", "hq"),
      Seq("O", "B-PERSON", "I-PERSON", "O", "B-ORG", "O"))
    assert(terms == Seq("met", "John Smith", "at", "NATO", "hq"))
    assert(ms == Seq(RawMention(1, "John Smith", "PERSON"), RawMention(3, "NATO", "ORG")))
  }

  test("dangling I- is lenient-decoded as outside") {
    val (terms, ms) = BatchedNer(StubBioTagger).decode(
      Seq("a", "b"), Seq("I-ORG", "O"))
    assert(terms == Seq("a", "b") && ms.isEmpty)
  }

  test("chunk boundary: labels reassemble in offset order; a span split by the " +
    "boundary yields two mentions (chunks are independent model calls — the " +
    "reference's chunk_it semantics, arelight/arekit/chunk_it.py)") {
    // chunkLimit=4: "John"(3) ends chunk 1, "Smith"(4) starts chunk 2
    val sentence = Seq("we", "met", "mr", "John", "Smith", "today")
    val (terms, ms) = ner.tag(sentence)
    assert(ms.map(_.value) == Seq("John", "Smith"))
    assert(terms == sentence)
    // the same span NOT at a boundary is merged
    val (_, ms2) = ner.tag(Seq("we", "met", "John", "Smith"))
    assert(ms2.map(_.value) == Seq("John Smith"))
  }

  test("batching: many sentences, results align with per-sentence tagging") {
    val sents = Seq(
      Seq("Anna", "flew", "home"),
      Seq.empty[String],
      Seq("the", "UN", "met", "Bob"),
      (1 to 11).map(i => if (i % 5 == 0) s"Cap$i" else s"w$i"))
    val batched = ner.tagBatch(sents)
    val single = sents.map(s => BatchedNer(StubBioTagger).tag(s))
    assert(batched == single)
  }

  test("reference defaults: chunk 128 (infer.py:189), batch 16") {
    val d = BatchedNer(StubBioTagger)
    assert(d.chunkLimit == 128 && d.batchSize == 16)
  }
}
