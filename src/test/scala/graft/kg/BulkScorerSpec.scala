package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.gen.PageGen
import graft.ner.BracketNer

class BulkScorerSpec extends AnyFunSuite with SparkTestSession {

  test("batched prompt scoring == direct lexicon scoring (same decision function)") {
    val cfg = KgPipeline.Config()
    val ss = KgPipeline.samples(
      KgPipeline.parsePages(PageGen.pages(40, 42L, 4), BracketNer, cfg), cfg).persist()
    val viaPrompt = BulkScorer.score(ss, EchoSentimentModel(), batchSize = 7)
      .collect().map(p => p.id -> p.label).toMap
    val direct = KgPipeline.predictions(ss, LexiconScorer())
      .collect().map(p => p.id -> p.label).toMap
    assert(viaPrompt == direct)
    assert(viaPrompt.values.toSet == Set(0, 1, 2)) // all classes exercised
  }

  test("decode path follows the reference substring rules incl. noise") {
    val m = new ChatModel {
      def completeBatch(ps: Seq[String]): Seq[String] =
        Seq("I think it is Positive overall.", "clearly NEGATIVE!", "hard to say")
    }
    val decoded = m.completeBatch(Seq("a", "b", "c")).map(graft.core.Sentiment.decodeResponse)
    assert(decoded == Seq(1, 2, 0))
  }
}
