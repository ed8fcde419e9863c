package graft.text

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.ParsedDoc

/** Optional text-normalization stages: translation (reference P7,
  * arelight/third_party/gt_310a.py — an ML translator service) and
  * lemmatization (P8, arelight/stemmers/ru_mystem.py — Mystem).
  *
  * Both external models are out of scope for the deterministic baseline
  * (SURVEY.md P7/P8: "optional stage"); the traits below are the engine seams
  * with deterministic implementations: an identity translator and a
  * suffix-stripping stemmer usable as the synonym-dictionary key function.
  */
trait Translator extends Serializable {
  /** Translate a batch of term lists; entity positions in `keepIdx` are left
    * untranslated (reference do_translate_entity=False,
    * arelight/arekit/utils_translator.py). */
  def translateBatch(termLists: Seq[Seq[String]], keepIdx: Seq[Set[Int]]): Seq[Seq[String]]
}

/** Deterministic stand-in: identity (the english-only baseline path). */
object IdentityTranslator extends Translator {
  def translateBatch(termLists: Seq[Seq[String]], keepIdx: Seq[Set[Int]]): Seq[Seq[String]] =
    termLists
}

trait Stemmer extends Serializable {
  def lemma(word: String): String
}

/** Deterministic light stemmer: lowercase + strip a few inflection suffixes —
  * NOT Mystem parity (that is a model); enough to give lemmatized synonym keys
  * a deterministic engine semantic (reference lemmatized keys:
  * arelight/run/infer.py:262-270). */
object SuffixStemmer extends Stemmer {
  private val suffixes = Seq("ies", "sses", "es", "s", "ing", "ed", "ly")
  def lemma(word: String): String = {
    val w = TextOps.canonicalKey(word)
    suffixes.find(s => w.endsWith(s) && w.length - s.length >= 3)
      .map(s => w.dropRight(s.length)).getOrElse(w)
  }
}

object Normalize {

  /** Translation as a pipeline stage over parsed docs (entities excluded from
    * translation like the reference's do_translate_entity=False). */
  def translate(docs: Dataset[ParsedDoc], translator: Translator, batchSize: Int = 16)(
      implicit spark: SparkSession): Dataset[ParsedDoc] = {
    import spark.implicits._
    docs.mapPartitions(_.grouped(batchSize).flatMap { docBatch =>
      val flat = docBatch.flatMap(d => d.sentences.map(s =>
        (s.terms, s.mentions.map(_.ind).toSet)))
      val translated = translator.translateBatch(flat.map(_._1), flat.map(_._2)).iterator
      docBatch.map(d => d.copy(sentences = d.sentences.map(s =>
        s.copy(terms = translated.next()))))
    })
  }

  /** Stemmer-keyed group function for Linker dictionaries (lemmatized synonym
    * keys, reference infer.py:262-270). */
  def stemmedGroupId(dict: Map[String, Long], stemmer: Stemmer): String => Long = { v =>
    val key = stemmer.lemma(v)
    dict.getOrElse(key, graft.link.Linker.hashGroupId(key))
  }
}
