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
  /** Translate a batch of plain-text fragments — the reference model shape
    * (gt_310a.py:35-44 get_func: list of strings -> list of translated
    * strings). Fragments are maximal runs of non-entity terms; entities are
    * never passed here (do_translate_entity=False, infer.py:272-284). */
  def translateBatch(fragments: Seq[String]): Seq[String]
}

/** Deterministic stand-in: identity (the english-only baseline path). */
object IdentityTranslator extends Translator {
  def translateBatch(fragments: Seq[String]): Seq[String] = fragments
}

/** Deterministic NON-identity stand-in: reverses the word order of each
  * fragment. Exercises the full P7 shape end-to-end (entity exclusion,
  * re-flatten, mention re-indexing) with visibly transformed text while
  * keeping term counts stable — entities stay in place, triple counts are
  * invariant. The CLI surface is `--translate reverse` (cli.Infer). */
object ReverseTranslator extends Translator {
  def translateBatch(fragments: Seq[String]): Seq[String] =
    fragments.map(_.split(raw"\s+").filter(_.nonEmpty).reverse.mkString(" "))
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

  /** Translation as a pipeline stage over parsed docs, full reference
    * semantics (P7, infer.py:272-284 + utils.py string_terms_to_list):
    *
    *  1. each sentence's terms are segmented into maximal non-entity runs
    *     (fragments) with entity terms as atomic separators
    *     (do_translate_entity=False — entities are NEVER translated);
    *  2. fragments of a whole doc batch go to the model in ONE
    *     translateBatch call (reference batch translation);
    *  3. translated fragments are RE-FLATTENED: a translated string splits on
    *     whitespace back into terms (string_terms_to_list), so the term count
    *     may change — mention indices are recomputed accordingly.
    */
  def translate(docs: Dataset[ParsedDoc], translator: Translator, batchSize: Int = 16)(
      implicit spark: SparkSession): Dataset[ParsedDoc] = {
    import spark.implicits._
    docs.mapPartitions(_.grouped(batchSize).flatMap(translateDocs(_, translator)))
  }

  /** Batch-local translation (pure — testable without a session). */
  def translateDocs(batch: Seq[ParsedDoc], translator: Translator): Seq[ParsedDoc] = {
    // pass 1: segment every sentence into Left(fragment text) | Right(mention)
    val fragments = scala.collection.mutable.ArrayBuffer.empty[String]
    val segmented = batch.map { d =>
      d -> d.sentences.map { s =>
        val mentionAt = s.mentions.map(m => m.ind -> m).toMap
        val segs = Seq.newBuilder[Either[String, (graft.core.Mention, String)]]
        val cur = new StringBuilder
        var i = 0
        while (i < s.terms.length) {
          mentionAt.get(i) match {
            case Some(m) =>
              if (cur.nonEmpty) { segs += Left(cur.toString); cur.clear() }
              segs += Right((m, s.terms(i)))
            case None =>
              if (cur.nonEmpty) cur.append(' ')
              cur.append(s.terms(i))
          }
          i += 1
        }
        if (cur.nonEmpty) segs += Left(cur.toString)
        val result = segs.result()
        result.foreach { case Left(f) => fragments += f; case _ => () }
        (s, result)
      }
    }
    // pass 2: one model call for the whole batch
    val translated = translator.translateBatch(fragments.toSeq)
    require(translated.length == fragments.length,
      s"translator returned ${translated.length} fragments for ${fragments.length}")
    val it = translated.iterator
    // pass 3: re-flatten + re-index
    segmented.map { case (d, sents) =>
      d.copy(sentences = sents.map { case (s, segs) =>
        val newTerms = Seq.newBuilder[String]
        val newMentions = Seq.newBuilder[graft.core.Mention]
        var idx = 0
        segs.foreach {
          case Left(_) =>
            it.next().split(raw"\s+").iterator.filter(_.nonEmpty).foreach { w =>
              newTerms += w; idx += 1
            }
          case Right((m, term)) =>
            newTerms += term
            newMentions += m.copy(ind = idx)
            idx += 1
        }
        s.copy(terms = newTerms.result(), mentions = newMentions.result())
      })
    }
  }

  /** Stemmer-keyed group function for Linker dictionaries (lemmatized synonym
    * keys, reference infer.py:262-270). */
  def stemmedGroupId(dict: Map[String, Long], stemmer: Stemmer): String => Long = { v =>
    val key = stemmer.lemma(v)
    dict.getOrElse(key, graft.link.Linker.hashGroupId(key))
  }
}
