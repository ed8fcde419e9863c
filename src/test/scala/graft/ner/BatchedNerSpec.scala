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

  /** Direct transliteration of the reference ChunkIterator
    * (arelight/arekit/chunk_it.py:1-31) used as the parity oracle: per data
    * item IN ORDER, every chunk_limit-slice is appended [index, chunk] to a
    * FIFO buffer and popped front-first. */
  private def referenceChunkStream(data: Seq[Seq[String]], chunkLimit: Int): Seq[(Int, Seq[String])] = {
    val buffer = scala.collection.mutable.Queue.empty[(Int, Seq[String])]
    data.zipWithIndex.foreach { case (d, index) =>
      (0 until d.length by chunkLimit).foreach { start =>
        buffer.enqueue((index, d.slice(start, start + chunkLimit)))
      }
    }
    buffer.toSeq
  }

  test("chunk parity vs arekit chunk_it.py on a 300-term fixture: boundaries, order, FIFO reassembly") {
    // 300-term sentence + assorted lengths around the 128 boundary (0, 1, 127, 128, 129)
    val fixture = Seq(
      (1 to 300).map(i => s"t$i"),
      Seq.empty[String],
      (1 to 127).map(i => s"a$i"),
      (1 to 128).map(i => s"b$i"),
      (1 to 129).map(i => s"c$i"),
      Seq("single"))
    for (limit <- Seq(128, 4, 1)) {
      val ref = referenceChunkStream(fixture, limit)
      val eng = NerOps.chunked(fixture, limit)
      assert(eng.map(c => (c._1, c._3)) == ref, s"chunk stream diverges at limit=$limit")
      // offsets re-base mention indices: offset == terms consumed before the chunk
      eng.groupBy(_._1).foreach { case (src, cs) =>
        assert(cs.map(_._2) == cs.indices.map(_ * limit), s"offsets wrong for sentence $src")
        assert(cs.flatMap(_._3) == fixture(src), s"reassembly loses terms for sentence $src")
      }
    }
  }

  test("BIO type switch ends the span: B-PERSON I-ORG decodes as PERSON span + lenient outside") {
    val (terms, ms) = BatchedNer(StubBioTagger).decode(
      Seq("John", "NATO", "x"), Seq("B-PERSON", "I-ORG", "O"))
    assert(ms == Seq(RawMention(0, "John", "PERSON")))
    assert(terms == Seq("John", "NATO", "x"))
  }

  test("multilingual CoNLL-shaped decode: cyrillic span, I-without-B mid-sequence, back-to-back B-B") {
    val (terms, ms) = BatchedNer(StubBioTagger).decode(
      Seq("встреча", "Джо", "Байден", "и", "ЕС", "ООН", "сегодня"),
      Seq("O", "B-PERSON", "I-PERSON", "I-ORG", "B-ORG", "B-ORG", "O"))
    assert(terms == Seq("встреча", "Джо Байден", "и", "ЕС", "ООН", "сегодня"))
    assert(ms == Seq(
      RawMention(1, "Джо Байден", "PERSON"),
      RawMention(3, "ЕС", "ORG"),
      RawMention(4, "ООН", "ORG")))
  }

  test("span ending exactly AT the chunk boundary stays one mention (reassembly before decode)") {
    // chunkLimit=4: span occupies positions 2-3, ending at the boundary
    val (_, ms) = ner.tag(Seq("we", "met", "Anna", "Maria", "today", "ok"))
    assert(ms.map(_.value) == Seq("Anna Maria"))
  }
}
