package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** P7 with a deterministic NON-identity model (--translate reverse): the
  * fragment text visibly changes, entities are excluded and re-indexed, and
  * the pair/triple structure is invariant (entity positions shift only within
  * their fragment-local neighborhoods; counts per sentence are preserved). */
class ReverseTranslatorSpec extends AnyFunSuite with SparkTestSession {

  test("reverse model: fragments reversed, entities intact, triples invariant") {
    import spark.implicits._
    val cfg = graft.kg.KgPipeline.Config()
    val pages = graft.gen.PageGen.pages(30, 5L, 4)
    val raw = graft.kg.KgPipeline.parsePages(pages, graft.ner.BracketNer, cfg)
    val rev = Normalize.translate(raw, ReverseTranslator)

    // entity mention VALUES and per-sentence mention counts are preserved
    def mentionBag(d: org.apache.spark.sql.Dataset[graft.core.ParsedDoc]) =
      d.collect().flatMap(p => p.sentences.map(sn =>
        (p.url, sn.sentInd) -> sn.mentions.map(_.value).sorted.toSeq)).toMap
    assert(mentionBag(rev) == mentionBag(raw))

    // non-entity terms are genuinely transformed (word order reversed within
    // fragments) on at least one multi-term fragment
    val rawTerms = raw.collect().map(p => p.url -> p.sentences.map(_.terms)).toMap
    val changed = rev.collect().exists(p => rawTerms(p.url) != p.sentences.map(_.terms))
    assert(changed, "reverse translation left every sentence unchanged")

    // re-indexing: each mention's index still points at the SAME term text it
    // did before translation (entity terms are atomic, never translated)
    val rawTermAt = raw.collect().flatMap(p => p.sentences.flatMap(sn =>
      sn.mentions.map(m => (p.url, sn.sentInd, m.id) -> sn.terms(m.ind)))).toMap
    rev.collect().foreach(p => p.sentences.foreach(sn =>
      sn.mentions.foreach(m =>
        assert(sn.terms(m.ind) == rawTermAt((p.url, sn.sentInd, m.id))))))

    // triple count is invariant: same mentions per sentence => same pairs
    val tRaw = graft.kg.KgPipeline.triples(
      graft.kg.KgPipeline.samples(raw, cfg), graft.kg.LexiconScorer()).count()
    val tRev = graft.kg.KgPipeline.triples(
      graft.kg.KgPipeline.samples(rev, cfg), graft.kg.LexiconScorer()).count()
    assert(tRaw == tRev && tRaw > 0)
  }

  test("translateBatch reverses word order per fragment") {
    assert(ReverseTranslator.translateBatch(Seq("a b c", "x", "")) == Seq("c b a", "x", ""))
  }
}
