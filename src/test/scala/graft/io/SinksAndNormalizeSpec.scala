package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.core.{ParsedDoc, Sentence}
import graft.text.{IdentityTranslator, Normalize, SuffixStemmer, Translator}

class SinksAndNormalizeSpec extends AnyFunSuite with SparkTestSession {

  private def tmp() = java.nio.file.Files.createTempDirectory("sink").toString

  test("csv sink (K2) and tsv.gz sink (K3/K4) round-trip") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b\tc")).toDF("id", "v")
    val p1 = tmp(); Sinks.csv(df, p1)
    assert(spark.read.option("header", "true").csv(p1).count() == 2)
    val p2 = tmp(); Sinks.tsvGz(df, p2)
    assert(new java.io.File(p2).listFiles().exists(_.getName.endsWith(".csv.gz")))
    val back = spark.read.option("header", "true").option("sep", "\t").csv(p2)
    assert(back.count() == 2)
  }

  test("appendMissing (K5 write_missed): only absent ids inserted") {
    import spark.implicits._
    val p = tmp() + "/t"
    assert(Sinks.appendMissing(Seq((1L, "x"), (2L, "y")).toDF("id", "v"), p, "id") == 2)
    assert(Sinks.appendMissing(Seq((2L, "y2"), (3L, "z")).toDF("id", "v"), p, "id") == 1)
    val rows = spark.read.parquet(p).collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(rows.toSeq == Seq((1L, "x"), (2L, "y"), (3L, "z")))
    assert(Sinks.appendMissing(Seq((3L, "z")).toDF("id", "v"), p, "id") == 0)
  }

  test("translation stage rewrites terms, keeps entity positions (P7)") {
    import spark.implicits._
    val upper: Translator = fragments => fragments.map(_.toUpperCase)
    val doc = ParsedDoc("u", "ru", Seq(Sentence(0, Seq("привет", "USA", "мир"),
      Seq(graft.core.Mention(0, 1, "USA", "GPE", 0, 0)))))
    val out = Normalize.translate(Seq(doc).toDS(), upper).collect()(0)
    assert(out.sentences.head.terms == Seq("ПРИВЕТ", "USA", "МИР"))
    assert(out.sentences.head.mentions.head.ind == 1) // entity untouched, index stable
    val id = Normalize.translate(Seq(doc).toDS(), IdentityTranslator).collect()(0)
    assert(id.sentences.head.terms == doc.sentences.head.terms)
    assert(id.sentences.head.mentions == doc.sentences.head.mentions)
  }

  test("translation re-flattening (string_terms_to_list): term count changes shift entity indices") {
    import spark.implicits._
    // deterministic fake "ML" translator: fragment-level dictionary with
    // length-changing translations — exercises the reference's
    // do_translate_entity=False + re-flatten path (infer.py:272-284)
    val dict = Map(
      "der alte" -> "the old gray", // 2 terms -> 3 terms
      "mann und" -> "man-and",      // 2 terms -> 1 term
      "heute" -> "today")
    val t: Translator = fragments => fragments.map(f => dict.getOrElse(f, f))
    val m1 = graft.core.Mention(0, 2, "Berlin", "GPE", 0, 10)
    val m2 = graft.core.Mention(0, 5, "Anna", "PERSON", 1, 11)
    val doc = ParsedDoc("u", "de", Seq(Sentence(0,
      Seq("der", "alte", "Berlin", "mann", "und", "Anna", "heute"), Seq(m1, m2))))
    val out = Normalize.translateDocs(Seq(doc), t).head.sentences.head
    assert(out.terms == Seq("the", "old", "gray", "Berlin", "man-and", "Anna", "today"))
    // entities untranslated; indices recomputed after re-flattening
    assert(out.mentions == Seq(m1.copy(ind = 3), m2.copy(ind = 5)))
    // downstream pair generation still sees consistent indices
    val pairs = graft.kg.Sampler.sampleDoc(
      ParsedDoc("u", "de", Seq(out)), graft.kg.Sampler.Config(renderText = false))
    assert(pairs.map(s => (s.sInd, s.tInd)).toSet == Set((3, 5), (5, 3)))

    // batch path: fragments of several docs go through ONE model call
    var calls = 0
    val counting: Translator = fs => { calls += 1; fs }
    Normalize.translateDocs(Seq(doc, doc, doc), counting)
    assert(calls == 1)
  }

  test("suffix stemmer gives lemmatized synonym keys (P8)") {
    assert(SuffixStemmer.lemma("Sanctions") == "sanction")
    assert(SuffixStemmer.lemma("praised") == "prais")
    assert(SuffixStemmer.lemma("EU") == "eu") // too short to strip
    val dict = Map("sanction" -> 7L)
    val gid = Normalize.stemmedGroupId(dict, SuffixStemmer)
    assert(gid("sanctions") == 7L && gid("Sanction") == 7L)
  }
}
